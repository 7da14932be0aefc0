"""Fused RANSAC pre-rank kernel: P3P residual + threshold-ladder count.

The NFA pre-rank ladder (coloc_tpu/ransac.py, scoring="nfa") needs, per
candidate model, ONLY a scalar rank = sum over correspondences of how many
geometric threshold rungs the residual clears. The XLA path computes it by
materializing the full (Hm, M) residual matrix — three K=4 matmul planes
plus the elementwise ladder, all streamed through HBM. That is pure
bandwidth: at serving batch B=32 (Hm=1024, M=1024) the planes are ~100 MB
of traffic per dispatch and the stage's per-stream cost turns SUPER-linear
once the working set outgrows what XLA keeps fused (measured 0.39 ms at
B=16 -> 1.16 ms at B=32; round-3 VERDICT item 4).

This kernel keeps every (TH, TM) residual tile in VMEM: per grid step it
computes the three camera-plane contractions (K=4 broadcast FMAs on the
VPU — see _rank_kernel for why not the MXU), the reprojection epilogue,
the compare-ladder count, and the masked sum — only the (Hm,) rank vector
ever reaches HBM. HBM traffic drops from O(Hm * M) to O(Hm + M), and the
f32 arithmetic makes the rank EXACT (the XLA path's bf16 pre-rank is an
approximation; exact residual ranking is strictly at least as good for
winner selection — the pre-rank property test in tests/test_robust.py
pins winner quality either way).

Residual semantics match robust._p3p_batch_residuals exactly:
  err[m, l] = f^2 ((A0 - ox Z)^2 + (A1 - oy Z)^2) / max(Z, 1e-9)^2,
  err = 1e12 where Z <= 0,
with A_k[m, l] = [rowk(R_m), (R_m C_m)_k] . [X_l, -1]; the focal factor is
folded into the x/y model rows and the observations before the kernel, and
the ladder is ransac.py's one-pass log form:
  cnt = clip(jmax - floor((log2(err) - log2(thr)) / 2), 0, n_rungs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coloc_tpu.ops.dispatch import interpret_mode, use_pallas
# ladder shape defaults come from the SINGLE source of truth in ransac.py
from coloc_tpu.ransac import LADDER_JMAX, LADDER_RUNGS

_TH = 256    # model-tile rows
_TM = 1024   # correspondence-tile lanes


def _pad_to_tiles(n: int, tile: int, base: int) -> int:
    """Padded extent that the (min(tile, .), grid) split covers EXACTLY:
    round up to `base` (hardware tile granule) below one tile, else to a
    full-`tile` multiple — `n_padded % min(tile, n_padded) == 0` always
    (a bare round-to-base 300 with tile 256 would silently drop rows 256+:
    pallas grids truncate, they don't remainder)."""
    if n <= tile:
        return -(-n // base) * base
    return -(-n // tile) * tile


def _pad_operands(models, data_cols):
    """Pad a (Hm, D) model matrix and a list of (*, M)-column data arrays
    to tile-covering extents (ONE implementation of the grid-truncation
    invariant above for all three rank wrappers). Returns
    (models_padded, data_padded_list, Hm, M)."""
    Hm = models.shape[0]
    M = data_cols[0].shape[-1]
    Mp = _pad_to_tiles(M, _TM, 128)
    if Mp != M:
        data_cols = [
            jnp.pad(a, ((0, 0), (0, Mp - M))) for a in data_cols
        ]
    Hp = _pad_to_tiles(Hm, _TH, 8)
    if Hp != Hm:
        models = jnp.pad(models, ((0, Hp - Hm), (0, 0)))
    return models, data_cols, Hm, M


def _rank_kernel(jmax, n_rungs, thr_sq, zmode,
                 e_ref, xh_ref, obs_ref, mask_ref, rank_ref):
    """Grid (B, Hm/TH, Mp/TM); rank_ref block indexed by (b, h) only, so the
    m axis (innermost) accumulates into it.

    All-VPU formulation: the K=4 camera contraction runs as 4 broadcast
    FMAs per plane (an MXU dot pads K to 128 — 32x wasted passes, and f32
    HIGHEST costs 6 passes on top; measured 1.16 ms at B=32 vs ~0.2 ms for
    this form), and the ladder count is 5 compares against rung-scaled
    denominators instead of a log2/floor chain:
      err < thr*4^j  <=>  (u^2 + v^2) < (thr*4^j) * zc^2
    which also removes the divide. Counts are identical to the log form
    away from exact rung boundaries (measure-zero ties round differently
    in f32 — same tie class the XLA ladder itself has).

    zmode selects the degenerate-denominator exclusion:
      "pos":     P3P reprojection — Z <= 0 (behind camera) counts 0 and
                 the denominator clamps at 1e-9 (scorer parity);
      "nonzero": homography transfer — |W| < 1e-9 counts 0, negative W is
                 a legitimate projective sign."""
    m = pl.program_id(2)
    E = e_ref[0]          # (TH, 12) = 3 x [row(R)*s, t*s], s = focal for x/y
    Xh = xh_ref[0]        # (4, TM)  = [X; -1]
    obs = obs_ref[0]      # (2, TM)  focal-scaled normalized observations
    msk = mask_ref[0]     # (1, TM)  1.0 where correspondence valid

    def plane(c0):
        acc = E[:, c0:c0 + 1] * Xh[0:1, :]
        for k in range(1, 4):
            acc = acc + E[:, c0 + k:c0 + k + 1] * Xh[k:k + 1, :]
        return acc                                  # (TH, TM)

    A0 = plane(0)                                   # f * Xc_x
    A1 = plane(4)                                   # f * Xc_y
    Z = plane(8)                                    # Xc_z

    u = A0 - obs[0:1, :] * Z
    v = A1 - obs[1:2, :] * Z
    s = u * u + v * v
    if zmode == "pos":
        zc = jnp.maximum(Z, 1e-9)
        t0 = zc * zc
        alive = jnp.where(Z > 0, msk, 0.0)          # behind -> count 0
    else:
        t0 = Z * Z
        alive = jnp.where(jnp.abs(Z) >= 1e-9, msk, 0.0)

    cnt = jnp.zeros_like(s)
    for j in range(jmax - n_rungs + 1, jmax + 1):   # rungs thr * 4^j
        cnt = cnt + jnp.where(s < (thr_sq * 4.0 ** j) * t0, 1.0, 0.0)
    part = jnp.sum(cnt * alive, axis=1)             # (TH,)

    @pl.when(m == 0)
    def _init():
        rank_ref[0] = part

    @pl.when(m > 0)
    def _acc():
        rank_ref[0] = rank_ref[0] + part


@functools.partial(
    jax.jit,
    static_argnames=("thr_sq", "jmax", "n_rungs", "zmode", "interpret"),
)
def _p3p_ladder_rank_pallas(
    eflat, xh, obs, maskf, thr_sq, jmax, n_rungs, zmode="pos",
    interpret=False,
):
    B, Hm, _ = eflat.shape
    Mp = xh.shape[2]
    th = min(_TH, Hm)
    tm = min(_TM, Mp)
    kernel = functools.partial(
        _rank_kernel, jmax, n_rungs, float(thr_sq), zmode
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, Hm // th, Mp // tm),
        in_specs=[
            pl.BlockSpec((1, th, 12), lambda b, h, m: (b, h, 0)),
            pl.BlockSpec((1, 4, tm), lambda b, h, m: (b, 0, m)),
            pl.BlockSpec((1, 2, tm), lambda b, h, m: (b, 0, m)),
            pl.BlockSpec((1, 1, tm), lambda b, h, m: (b, 0, m)),
        ],
        out_specs=pl.BlockSpec((1, th), lambda b, h, m: (b, h)),
        out_shape=jax.ShapeDtypeStruct((B, Hm), jnp.float32),
        interpret=interpret,
    )(eflat, xh, obs, maskf)
    return out


def p3p_ladder_rank(
    flats: jnp.ndarray,     # (Hm, 12) row-major R | C per model
    Xw: jnp.ndarray,        # (M, 3) landmark positions
    bearings: jnp.ndarray,  # (M, 3) unit-free bearing vectors
    valid: jnp.ndarray,     # (M,) bool correspondence validity
    focal,                  # scalar pixel scale
    thr_sq: float,          # static nominal squared gate (ladder center)
    jmax: int = LADDER_JMAX,
    n_rungs: int = LADDER_RUNGS,
) -> jnp.ndarray:
    """-> (Hm,) f32 ladder rank per model (higher = better candidate)."""
    Hm = flats.shape[0]
    M = Xw.shape[0]
    R = flats[:, :9].reshape(Hm, 3, 3)
    C = flats[:, 9:]
    t = jnp.einsum("mkd,md->mk", R, C)               # (Hm, 3) = R_m C_m
    E = jnp.concatenate([R, t[:, :, None]], axis=2)  # (Hm, 3, 4)
    f = jnp.asarray(focal, jnp.float32)
    # fold the focal factor into the x/y planes (u = f*A0 - (f*ox) Z)
    E = E * jnp.stack([f, f, jnp.float32(1.0)])[None, :, None]
    eflat = E.reshape(Hm, 12)

    obs = bearings[:, :2] / jnp.maximum(bearings[:, 2:3], 1e-9)  # (M, 2)
    obs = (obs * f).T                                            # (2, M)
    xh = jnp.concatenate([Xw, -jnp.ones_like(Xw[:, :1])], axis=-1).T  # (4, M)
    maskf = valid.astype(jnp.float32)[None, :]                   # (1, M)

    # padded columns carry mask 0 (and Z = 0 -> behind -> cnt 0 anyway)
    eflat, (xh, obs, maskf), Hm, M = _pad_operands(eflat, [xh, obs, maskf])

    rank = _p3p_ladder_rank_pallas(
        eflat[None], xh[None], obs[None], maskf[None],
        float(thr_sq), jmax, n_rungs, interpret=interpret_mode(),
    )[0]
    return rank[:Hm]


def available() -> bool:
    return use_pallas() or interpret_mode()


def homography_ladder_rank(
    Hs: jnp.ndarray,        # (Hm, 3, 3) candidate homographies
    x1: jnp.ndarray,        # (M, 2) normalized undistorted coords, image 1
    x2: jnp.ndarray,        # (M, 2) image 2 (forward transfer target)
    valid: jnp.ndarray,     # (M,) bool
    focal,                  # image-2 pixel scale (err is f2^2-scaled)
    thr_sq: float,
    jmax: int = LADDER_JMAX,
    n_rungs: int = LADDER_RUNGS,
) -> jnp.ndarray:
    """-> (Hm,) ladder rank for forward transfer error f2^2 * ||x2 -
    proj(H h1)||^2 (homography.transfer_error_sq_batch semantics — |W| <
    1e-9 counts 0). Reuses the P3P rank kernel with zmode="nonzero": the
    three projective planes [f*H0; f*H1; H2] play the camera rows and
    [h1; 0] plays [X; -1]."""
    Hm = Hs.shape[0]
    M = x1.shape[0]
    f = jnp.asarray(focal, jnp.float32)
    scale = jnp.stack([f, f, jnp.float32(1.0)])[None, :, None]
    E = jnp.concatenate(
        [Hs * scale, jnp.zeros((Hm, 3, 1), Hs.dtype)], axis=2
    )                                                   # (Hm, 3, 4)
    eflat = E.reshape(Hm, 12)
    xh = jnp.concatenate(
        [x1, jnp.ones_like(x1[:, :1]), jnp.zeros_like(x1[:, :1])], axis=-1
    ).T                                                 # (4, M)
    obs = (x2 * f).T                                    # (2, M)
    maskf = valid.astype(jnp.float32)[None, :]

    eflat, (xh, obs, maskf), Hm, M = _pad_operands(eflat, [xh, obs, maskf])

    rank = _p3p_ladder_rank_pallas(
        eflat[None], xh[None], obs[None], maskf[None],
        float(thr_sq), jmax, n_rungs, zmode="nonzero",
        interpret=interpret_mode(),
    )[0]
    return rank[:Hm]


# ---------------------------------------------------------------------------
# Epipolar (essential/fundamental) ladder rank
# ---------------------------------------------------------------------------
#
# Same shape of problem as the P3P rank, at LARGER Hm: the 5-point solver
# emits up to 30 models per sample, so the pre-rank ladder runs over
# Hm = 30 * num_hypotheses (7680 at the default budget) x M — the XLA path's
# three (Hm, M) quadratic-form planes are ~94 MB of HBM traffic per call
# (essential.symmetric_epipolar_distance_sq_batch docstring). The fused form
# streams K=27 packed model/data rows through VMEM and emits only (Hm,).
#
# The ladder compare is the PRODUCT form of the symmetric epipolar gate
# (dens > 0 after clamping):
#   err = num * (s2 den1' + s1 den2') / (den1' den2') < thr * 4^j
#   <=>  num * (den1 + den2) < (thr / (s1 s2)) * 4^j * den1 * den2
# with den1 = s2 * den1', den2 = s1 * den2' PRE-scaled into the data
# operands, so the runtime rung scale c = thr / (s1_sq * s2_sq) is the one
# scalar the kernel reads from SMEM. Counts equal the division-form ladder
# except at f32 rounding of exact rung ties (measure-zero; the same tie
# class the XLA ladder itself has).


def _epi_rank_kernel(jmax, n_rungs, e_ref, d_ref, mask_ref, c_ref, rank_ref):
    m = pl.program_id(2)
    E = e_ref[0]          # (TH, 27) = [vec(E) | vec(S1) | vec(S2)] per model
    D = d_ref[0]          # (27, TM) = [O | s1*P1 | s2*P2] per correspondence
    msk = mask_ref[0]     # (1, TM)
    c = c_ref[0]          # () runtime rung scale thr / (s1_sq * s2_sq)

    def contract(c0):
        acc = E[:, c0:c0 + 1] * D[c0:c0 + 1, :]
        for k in range(1, 9):
            acc = acc + E[:, c0 + k:c0 + k + 1] * D[c0 + k:c0 + k + 1, :]
        return acc                                   # (TH, TM)

    A = contract(0)                                  # h2^T E h1
    den2 = jnp.maximum(contract(9), 0.0)             # s1 * ||(E h1)_xy||^2
    den1 = jnp.maximum(contract(18), 0.0)            # s2 * ||(E^T h2)_xy||^2
    num = A * A
    lhs = num * (den1 + den2)
    rhs = den1 * den2

    cnt = jnp.zeros_like(lhs)
    for j in range(jmax - n_rungs + 1, jmax + 1):
        cnt = cnt + jnp.where(lhs < (c * 4.0 ** j) * rhs, 1.0, 0.0)
    part = jnp.sum(cnt * msk, axis=1)

    @pl.when(m == 0)
    def _init():
        rank_ref[0] = part

    @pl.when(m > 0)
    def _acc():
        rank_ref[0] = rank_ref[0] + part


@functools.partial(jax.jit, static_argnames=("jmax", "n_rungs", "interpret"))
def _epi_ladder_rank_pallas(emat, dmat, maskf, c, jmax, n_rungs,
                            interpret=False):
    B, Hm, _ = emat.shape
    Mp = dmat.shape[2]
    th = min(_TH, Hm)
    tm = min(_TM, Mp)
    kernel = functools.partial(_epi_rank_kernel, jmax, n_rungs)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hm // th, Mp // tm),
        in_specs=[
            pl.BlockSpec((1, th, 27), lambda b, h, m: (b, h, 0)),
            pl.BlockSpec((1, 27, tm), lambda b, h, m: (b, 0, m)),
            pl.BlockSpec((1, 1, tm), lambda b, h, m: (b, 0, m)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th), lambda b, h, m: (b, h)),
        out_shape=jax.ShapeDtypeStruct((B, Hm), jnp.float32),
        interpret=interpret,
    )(emat, dmat, maskf, c)
    return out


def epipolar_ladder_rank(
    Es: jnp.ndarray,        # (Hm, 3, 3) candidate essential/fundamental
    x1: jnp.ndarray,        # (M, 2) normalized undistorted coords, image 1
    x2: jnp.ndarray,        # (M, 2)
    valid: jnp.ndarray,     # (M,) bool
    s1_sq,                  # img-1 focal^2 scale (traced scalar)
    s2_sq,                  # img-2 focal^2 scale
    thr_sq: float,          # static nominal squared gate (ladder center)
    jmax: int = LADDER_JMAX,
    n_rungs: int = LADDER_RUNGS,
) -> jnp.ndarray:
    """-> (Hm,) f32 ladder rank per model (higher = better candidate)."""
    Hm = Es.shape[0]
    M = x1.shape[0]
    e9 = Es.reshape(Hm, 9)
    rows = Es[:, :2, :]
    S1 = jnp.einsum("had,hak->hdk", rows, rows).reshape(Hm, 9)
    cols = Es[:, :, :2]
    S2 = jnp.einsum("hda,hka->hdk", cols, cols).reshape(Hm, 9)
    emat = jnp.concatenate([e9, S1, S2], axis=1)            # (Hm, 27)

    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # (M, 3)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    O = (h2[:, :, None] * h1[:, None, :]).reshape(M, 9)
    P1 = (h1[:, :, None] * h1[:, None, :]).reshape(M, 9)
    P2 = (h2[:, :, None] * h2[:, None, :]).reshape(M, 9)
    s1f = jnp.asarray(s1_sq, jnp.float32)
    s2f = jnp.asarray(s2_sq, jnp.float32)
    # pre-scale the denominator operands (see product-form note above)
    dmat = jnp.concatenate([O, s1f * P1, s2f * P2], axis=1).T  # (27, M)
    maskf = valid.astype(jnp.float32)[None, :]

    emat, (dmat, maskf), Hm, M = _pad_operands(emat, [dmat, maskf])

    c = (jnp.float32(thr_sq) / jnp.maximum(s1f * s2f, 1e-20)).reshape(1)
    rank = _epi_ladder_rank_pallas(
        emat[None], dmat[None], maskf[None], c, jmax, n_rungs,
        interpret=interpret_mode(),
    )[0]
    return rank[:Hm]
