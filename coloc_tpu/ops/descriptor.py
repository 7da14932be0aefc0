"""TRIP-512: steered triplet binary descriptor (512 bits).

Reference parity: CLATCH (src/CLATCH.cu) computes 512-bit LATCH — per
keypoint, a rotated 64x64 ROI and 512 patch-triplet SSD comparisons against a
learned triplet table, one CUDA block per keypoint. We keep the *semantics*
(oriented triplet comparisons -> sign bits -> 512-bit binary string matched
under Hamming margin) but redesign for TPU:

  - Patch SSDs become point samples on a box-pre-smoothed pyramid level
    (smoothing ≈ patch aggregation, the steered-BRIEF/ORB trick), so each bit
    needs 3 bilinear samples instead of a 3x8x8 patch triple.
  - The triplet table is generated from a fixed PRNG seed (not the learned
    LATCH table — deliberately not copied from the reference); offsets live in
    a disc of radius 24 px to match LATCH's spatial support.
  - All keypoints' samples collapse into ONE flattened-pyramid gather of
    shape (K*512*3,), then the comparison + bit-packing is pure VPU work.

Bit layout matches coloc_tpu.ops.hamming.pack_bits/unpack_bipolar.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.ops import pyramid as pyr_ops
from coloc_tpu.ops.hamming import pack_bits

DESC_BITS = 512
_TABLE_SEED = 20240816
_SUPPORT_RADIUS = 24.0  # spatial support, px (LATCH uses a 48x48 window)
_MIN_SEP = 3.0          # keep triplet points distinct


def _make_triplet_table(seed: int = _TABLE_SEED) -> np.ndarray:
    """(512, 3, 2) float32 offsets (anchor, p1, p2), disc-distributed.

    Gaussian-concentrated toward the center (like BRIEF/LATCH statistics),
    clipped to the support radius, with a minimum separation between the two
    comparison points so bits aren't degenerate.
    """
    rng = np.random.default_rng(seed)
    table = np.zeros((DESC_BITS, 3, 2), np.float32)
    i = 0
    while i < DESC_BITS:
        pts = rng.normal(0.0, _SUPPORT_RADIUS / 2.5, size=(3, 2))
        if np.abs(pts).max() > _SUPPORT_RADIUS:
            continue
        if np.linalg.norm(pts[1] - pts[2]) < _MIN_SEP:
            continue
        table[i] = pts
        i += 1
    return table


_TRIPLETS = _make_triplet_table()  # module-level constant, baked into traces


def describe(
    flat_smooth: jnp.ndarray,   # flattened box-smoothed pyramid
    bases: jnp.ndarray,
    heights: jnp.ndarray,
    widths: jnp.ndarray,
    kp_x: jnp.ndarray,          # (K,) level-local x
    kp_y: jnp.ndarray,          # (K,) level-local y
    kp_level: jnp.ndarray,      # (K,) int32
    kp_angle: jnp.ndarray,      # (K,) radians
) -> jnp.ndarray:
    """-> (K, 16) uint32 packed 512-bit descriptors."""
    K = kp_x.shape[0]
    offsets = jnp.asarray(_TRIPLETS)                       # (512, 3, 2)

    ca, sa = jnp.cos(kp_angle), jnp.sin(kp_angle)          # (K,)
    ox, oy = offsets[..., 0], offsets[..., 1]              # (512, 3)
    # steer offsets by keypoint angle: (K, 512, 3)
    rx = ca[:, None, None] * ox[None] - sa[:, None, None] * oy[None]
    ry = sa[:, None, None] * ox[None] + ca[:, None, None] * oy[None]

    sx = kp_x[:, None, None] + rx
    sy = kp_y[:, None, None] + ry
    lvl = jnp.broadcast_to(kp_level[:, None, None], sx.shape)

    vals = pyr_ops.gather_bilinear_flat(
        flat_smooth, bases, heights, widths,
        lvl.reshape(-1), sx.reshape(-1), sy.reshape(-1),
    ).reshape(K, DESC_BITS, 3)

    va, v1, v2 = vals[..., 0], vals[..., 1], vals[..., 2]
    bits = ((va - v1) ** 2 > (va - v2) ** 2)               # (K, 512) bool
    return pack_bits(bits)
