"""Keypoint orientation by weighted intensity centroid.

Reference parity: FeatureAngle.h:197-246 — 7x7 weighted intensity-centroid
gradient (SSE) + polynomial fastAtan2 (:160-177). Here the centroid moments
m10/m01 are two small convolutions over each pyramid level (MXU-friendly),
evaluated densely and gathered at keypoints through the flattened-pyramid
index (one gather per keypoint); atan2 comes from the VPU directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

_RADIUS = 3  # 7x7 window


def _moment_kernels(radius: int = _RADIUS):
    """Distance-weighted x/y moment kernels (w = radius+1-max(|dx|,|dy|))."""
    r = radius
    ys, xs = jnp.mgrid[-r : r + 1, -r : r + 1]
    wgt = (r + 1 - jnp.maximum(jnp.abs(xs), jnp.abs(ys))).astype(jnp.float32)
    kx = (xs * wgt).astype(jnp.float32)
    ky = (ys * wgt).astype(jnp.float32)
    return kx, ky


def moment_maps(image: jnp.ndarray):
    """(H, W) -> (m10 (H,W), m01 (H,W)) centroid moment maps."""
    kx, ky = _moment_kernels()
    img = image[None, None]  # NCHW
    def conv(kernel):
        return jax.lax.conv_general_dilated(
            img, kernel[None, None], (1, 1), "SAME"
        )[0, 0]
    return conv(kx), conv(ky)


def angles_from_moments(m10: jnp.ndarray, m01: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(m01, m10)


def orientation_maps(levels: Sequence[jnp.ndarray]):
    """Per-level angle maps (dense); kept for tests/visualization — the
    frontend uses `orientation_at_keypoints` (dense 1-channel convs lower
    onto the TPU's conv path with C=1, which runs ~25 ms/frame; sparse
    gather at 1-2k keypoints is ~100 us)."""
    out = []
    for lvl in levels:
        m10, m01 = moment_maps(lvl)
        out.append(angles_from_moments(m10, m01))
    return out


def orientation_at_keypoints(
    flat: jnp.ndarray,
    bases: jnp.ndarray,
    heights: jnp.ndarray,
    widths: jnp.ndarray,
    kp_x: jnp.ndarray,      # (K,) level-local
    kp_y: jnp.ndarray,
    kp_level: jnp.ndarray,  # (K,) int32
) -> jnp.ndarray:
    """Weighted intensity-centroid angle per keypoint, via one flattened-
    pyramid gather of the 7x7 window (FeatureAngle semantics, sparse)."""
    from coloc_tpu.ops import pyramid as pyr_ops

    r = _RADIUS
    ys, xs = jnp.mgrid[-r : r + 1, -r : r + 1]
    wgt = (r + 1 - jnp.maximum(jnp.abs(xs), jnp.abs(ys))).astype(jnp.float32)
    offs_x = xs.reshape(-1).astype(jnp.float32)   # (49,)
    offs_y = ys.reshape(-1).astype(jnp.float32)
    wx = (xs * wgt).reshape(-1).astype(jnp.float32)
    wy = (ys * wgt).reshape(-1).astype(jnp.float32)

    K = kp_x.shape[0]
    sx = kp_x[:, None] + offs_x[None, :]          # (K, 49)
    sy = kp_y[:, None] + offs_y[None, :]
    lvl = jnp.broadcast_to(kp_level[:, None], sx.shape)
    vals = pyr_ops.gather_bilinear_flat(
        flat, bases, heights, widths,
        lvl.reshape(-1), sx.reshape(-1), sy.reshape(-1),
    ).reshape(K, -1)                              # (K, 49)
    m10 = vals @ wx
    m01 = vals @ wy
    return jnp.arctan2(m01, m10)
