"""M-LDB binary descriptor (486 bits) + AKAZE main orientation.

Reference parity: the AKAZE-MLDB describer the reference's CPU path uses
(AKAZE.hpp:14-80, ComputeMLDBDescriptor — 486-bit Modified Local Difference
Binary). Semantics:

  - main orientation: dominant gradient direction — vector sums of (Lx, Ly)
    samples in a disc of radius 6*sigma, swept by a sliding 60-degree window,
    argmax window wins (KAZE/SURF style). Implemented as a 30-bin circular
    histogram built with one-hot matmuls (batched over keypoints).
  - descriptor: three grids (2x2, 3x3, 4x4) over a rotated square patch of
    half-size 5*sigma... each cell averages three channels (L, rotated Lx,
    rotated Ly); every cell PAIR per grid per channel contributes one
    comparison bit: (6+36+120)*3 = 486 bits, zero-padded to 512 in the packed
    bank so the Hamming kernel is shared with TRIP-512.

All sampling happens with one flattened-pyramid gather per channel.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.ops import pyramid as pyr_ops
from coloc_tpu.ops.hamming import pack_bits

_ORI_BINS = 30
_PATCH_HALF = 5.0   # patch half-size in units of sigma
# sample points per cell axis: 4x4 per cell densely covers each MLDB cell at
# the NORMAL preset's sigma range (cells span ~3-8 px), approximating the
# reference's full-cell integer-pixel integration (AKAZE.hpp:29-78) within
# the diffusion smoothing scale while keeping a fixed shape
_CELL_SAMPLES = 4


def _disc_offsets(radius: float = 6.0, rings: int = 3):
    """Fixed disc sampling pattern (unit-sigma units), (P, 2) float32."""
    pts = [(0.0, 0.0)]
    for r in range(1, rings + 1):
        rad = radius * r / rings
        n = 8 * r
        for k in range(n):
            a = 2 * np.pi * k / n
            pts.append((rad * np.cos(a), rad * np.sin(a)))
    return np.asarray(pts, np.float32)


_DISC = _disc_offsets()


def orientation(
    flat_lx, flat_ly, bases, heights, widths,
    kp_x, kp_y, kp_level, kp_sigma_px,
) -> jnp.ndarray:
    """Dominant-gradient orientation per keypoint, (K,) radians."""
    disc = jnp.asarray(_DISC)                    # (P, 2)
    K = kp_x.shape[0]
    sx = kp_x[:, None] + kp_sigma_px[:, None] * disc[None, :, 0]
    sy = kp_y[:, None] + kp_sigma_px[:, None] * disc[None, :, 1]
    lvl = jnp.broadcast_to(kp_level[:, None], sx.shape)

    gx = pyr_ops.gather_nearest_flat(
        flat_lx, bases, heights, widths, lvl.reshape(-1), sx.reshape(-1),
        sy.reshape(-1)).reshape(K, -1)
    gy = pyr_ops.gather_nearest_flat(
        flat_ly, bases, heights, widths, lvl.reshape(-1), sx.reshape(-1),
        sy.reshape(-1)).reshape(K, -1)

    ang = jnp.arctan2(gy, gx)                    # (K, P)
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * _ORI_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, _ORI_BINS - 1)
    onehot = (bins[:, :, None] == jnp.arange(_ORI_BINS)[None, None, :]).astype(
        jnp.float32
    )                                            # (K, P, B)
    sum_x = jnp.einsum("kp,kpb->kb", gx, onehot)
    sum_y = jnp.einsum("kp,kpb->kb", gy, onehot)

    # sliding 60-degree window = 5 consecutive 12-degree bins (circular)
    def win(a):
        return sum(jnp.roll(a, -s, axis=1) for s in range(5))

    wx, wy = win(sum_x), win(sum_y)
    norm = wx * wx + wy * wy
    best = jnp.argmax(norm, axis=1)              # (K,)
    bx = jnp.take_along_axis(wx, best[:, None], axis=1)[:, 0]
    by = jnp.take_along_axis(wy, best[:, None], axis=1)[:, 0]
    return jnp.arctan2(by, bx)


def _grid_cells():
    """Static sample layout: per grid {2,3,4}, per cell, per sample point ->
    normalized patch coords in [-1, 1]. Returns (coords (N,2), cell_id (N,),
    pair tables per grid)."""
    coords, cell_of = [], []
    cell_base = 0
    grids = []
    for g in (2, 3, 4):
        cells_this = []
        for cy in range(g):
            for cx in range(g):
                cid = cell_base + cy * g + cx
                cells_this.append(cid)
                for iy in range(_CELL_SAMPLES):
                    for ix in range(_CELL_SAMPLES):
                        u = (cx + (ix + 0.5) / _CELL_SAMPLES) / g * 2 - 1
                        v = (cy + (iy + 0.5) / _CELL_SAMPLES) / g * 2 - 1
                        coords.append((u, v))
                        cell_of.append(cid)
        pairs = []
        for a in range(len(cells_this)):
            for b in range(a + 1, len(cells_this)):
                pairs.append((cells_this[a], cells_this[b]))
        grids.append(pairs)
        cell_base += g * g
    all_pairs = [p for g in grids for p in g]  # 6 + 36 + 120 = 162 pairs
    return (
        np.asarray(coords, np.float32),
        np.asarray(cell_of, np.int64),
        np.asarray(all_pairs, np.int64),
        cell_base,
    )


_COORDS, _CELL_OF, _PAIRS, _NUM_CELLS = _grid_cells()


def describe_mldb(
    flat_l, flat_lx, flat_ly, bases, heights, widths,
    kp_x, kp_y, kp_level, kp_sigma_px, kp_angle,
) -> jnp.ndarray:
    """-> (K, 16) uint32: 486 MLDB bits + 26 zero padding bits."""
    K = kp_x.shape[0]
    coords = jnp.asarray(_COORDS)                       # (N, 2) in [-1,1]
    ca, sa = jnp.cos(kp_angle), jnp.sin(kp_angle)

    half = _PATCH_HALF * kp_sigma_px                    # (K,)
    u = coords[None, :, 0] * half[:, None]
    v = coords[None, :, 1] * half[:, None]
    rx = ca[:, None] * u - sa[:, None] * v
    ry = sa[:, None] * u + ca[:, None] * v
    sx = kp_x[:, None] + rx
    sy = kp_y[:, None] + ry
    lvl = jnp.broadcast_to(kp_level[:, None], sx.shape)
    flat_idx = (lvl.reshape(-1), sx.reshape(-1), sy.reshape(-1))

    L = pyr_ops.gather_nearest_flat(flat_l, bases, heights, widths, *flat_idx
                                    ).reshape(K, -1)
    Gx = pyr_ops.gather_nearest_flat(flat_lx, bases, heights, widths, *flat_idx
                                     ).reshape(K, -1)
    Gy = pyr_ops.gather_nearest_flat(flat_ly, bases, heights, widths, *flat_idx
                                     ).reshape(K, -1)
    # steered derivatives (rotate the gradient into the patch frame)
    Dx = ca[:, None] * Gx + sa[:, None] * Gy
    Dy = -sa[:, None] * Gx + ca[:, None] * Gy

    # cell means via one-hot matmul: (N, C) pooling matrix
    cell_onehot = (
        jnp.asarray(_CELL_OF)[:, None] == jnp.arange(_NUM_CELLS)[None, :]
    ).astype(jnp.float32)
    cell_onehot = cell_onehot / jnp.sum(cell_onehot, axis=0, keepdims=True)
    mL = L @ cell_onehot                                # (K, C)
    mX = Dx @ cell_onehot
    mY = Dy @ cell_onehot

    pa = jnp.asarray(_PAIRS[:, 0])
    pb = jnp.asarray(_PAIRS[:, 1])
    bits = jnp.concatenate(
        [
            mL[:, pa] > mL[:, pb],                      # (K, 162)
            mX[:, pa] > mX[:, pb],
            mY[:, pa] > mY[:, pb],
        ],
        axis=1,
    )                                                   # (K, 486)
    bits = jnp.pad(bits, ((0, 0), (0, 512 - bits.shape[1])))
    return pack_bits(bits)
