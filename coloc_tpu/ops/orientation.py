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
    """Per-level angle maps (dense); gathered at keypoints by the frontend."""
    out = []
    for lvl in levels:
        m10, m01 = moment_maps(lvl)
        out.append(angles_from_moments(m10, m01))
    return out
