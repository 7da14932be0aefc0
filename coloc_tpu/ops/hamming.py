"""Brute-force 512-bit Hamming 2-NN matching.

Reference parity: CUDAK2NN (src/CUDAK2NN.cu) — each query streams the whole
training bank, XOR + popcount per 64-bit word, keeps best + second-best, and
accepts iff `second_best - best > threshold` (popcount MARGIN, not a ratio —
CUDAK2NN.cu:16-21,75, the stated correct criterion for binary descriptors).
The CPU path instead uses OpenMVG DistanceRatioMatch with Lowe ratio 0.8
(CPUMatcher.hpp:58-59); both accept modes are provided here.

TPU-first redesign (SURVEY.md §7.1.3): Hamming distance becomes MXU work via
the bipolar identity. For bit vectors q,t ∈ {0,1}^512 mapped to s = 2b-1 ∈
{-1,+1}^512:  HD(q,t) = (512 - <s_q, s_t>) / 2.  So the whole Q×T distance
matrix is one matmul over ±1 int8 operands (exact int32 accumulation), and
the 2-NN reduction fuses into the matmul epilogue in a Pallas kernel so the
Q×T matrix never touches HBM (the HBM write/read of a 5000×5000 i32 matrix
would cost ~200 MB of bandwidth — more than the FLOPs).

Paths:
  hamming_2nn_xla    — reference: unpack + jnp.dot + top_k (readable, correct)
  hamming_2nn_pallas — fused tile matmul + running (best, second, argbest)
  pack_bank / hamming_2nn_bank — device-RESIDENT training bank (setMapData
  parity): the bank is unpacked once and reused across frames, removing the
  per-call unpack of large landmark banks from the per-frame hot path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coloc_tpu.ops.dispatch import interpret_mode, use_pallas

DESC_BITS = 512
DESC_WORDS = 16
_INVALID_DIST = 2048  # > any possible Hamming distance


def unpack_bipolar(desc: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """(N, 16) uint32 packed bits -> (N, 512) ±1 of `dtype` (bit 0 of word 0 first).

    int8 by default: the MXU runs ±1 dot products at int8 rate with exact
    int32 accumulation (|dot| <= 512)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], DESC_BITS)
    return (2 * bits.astype(jnp.int32) - 1).astype(dtype)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 512) {0,1} -> (N, 16) uint32, inverse of unpack layout."""
    b = bits.reshape(bits.shape[0], DESC_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def hamming_2nn_xla(
    q_desc: jnp.ndarray,   # (Q, 16) uint32
    t_desc: jnp.ndarray,   # (T, 16) uint32
    q_valid: jnp.ndarray,  # (Q,) bool
    t_valid: jnp.ndarray,  # (T,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (best_idx (Q,) i32, best (Q,) i32, second (Q,) i32)."""
    sq = unpack_bipolar(q_desc, jnp.float32)
    st = unpack_bipolar(t_desc, jnp.float32)
    dot = jnp.dot(sq, st.T, preferred_element_type=jnp.float32)  # (Q, T)
    dist = (DESC_BITS - dot) * 0.5
    dist = dist + jnp.where(t_valid, 0.0, float(_INVALID_DIST))[None, :]
    neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
    best = (-neg_top2[:, 0]).astype(jnp.int32)
    second = (-neg_top2[:, 1]).astype(jnp.int32)
    best_idx = idx_top2[:, 0].astype(jnp.int32)
    best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
    second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
    return best_idx, best, second


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

_TQ = 512    # query tile rows
_TT = 2048   # train tile rows (tuned on v5e; see bench notes in docstring)


def _k2nn_kernel(q_ref, t_ref, pen_ref, idx_ref, best_ref, second_ref,
                 best_s, second_s, idx_s):
    """Grid = (Q/TQ, T/TT); ti (dim 1) iterates fastest, accumulating the
    running (best, second, argbest) per query row in VMEM scratch."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, _INVALID_DIST)
        second_s[:] = jnp.full_like(second_s, _INVALID_DIST)
        idx_s[:] = jnp.full_like(idx_s, -1)

    # (TQ, TT) distances via MXU (int8 rate, exact int32 accumulation):
    # dist = (512 - s_q . s_t)/2 + invalid penalty
    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        # explicit DEFAULT: the library-wide "highest" matmul precision (set
        # for f32 geometry in coloc_tpu/__init__) is meaningless for int8
        # operands and makes Mosaic reject the op ("Bad lhs type")
        precision=jax.lax.Precision.DEFAULT,
    )
    dist = (DESC_BITS - dot) // 2 + pen_ref[:]  # pen (1, TT) broadcasts

    # per-tile best / second / argbest via ONE packed-key min-reduction:
    # key = dist << 16 | col is exact in int32 (dist <= 2560 incl. penalty,
    # col < TT <= 65536), its row-min simultaneously yields the min distance
    # and the LOWEST column attaining it (iota-select argmin semantics).
    # ~40% fewer epilogue ops than the two-pass min + select formulation —
    # the epilogue, not the MXU matmul, bounds this kernel.
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    key = dist * 65536 + col
    kmin = jnp.min(key, axis=1, keepdims=True)                      # (TQ, 1)
    tile_best = kmin >> 16
    tile_arg = kmin & 65535
    # exactly the argmin element masked out (keys are unique), so duplicate
    # best distances still leave the other copy for second-best
    masked = jnp.where(key == kmin, _INVALID_DIST, dist)
    tile_second = jnp.min(masked, axis=1, keepdims=True)            # (TQ, 1)
    tile_arg_global = tile_arg + ti * _TT

    # merge running triple with tile triple
    old_best, old_second, old_idx = best_s[:], second_s[:], idx_s[:]
    take_new = tile_best < old_best
    new_best = jnp.where(take_new, tile_best, old_best)
    new_idx = jnp.where(take_new, tile_arg_global, old_idx)
    new_second = jnp.where(
        take_new,
        jnp.minimum(old_best, tile_second),
        jnp.minimum(old_second, tile_best),
    )
    best_s[:] = new_best
    second_s[:] = new_second
    idx_s[:] = new_idx

    @pl.when(ti == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = idx_s[:]
        best_ref[:] = new_best
        second_ref[:] = new_second


@functools.partial(jax.jit, static_argnames=("interpret",))
def _k2nn_pallas_padded(sq, st, penalty, interpret=False):
    Qp, Tp = sq.shape[0], st.shape[0]
    grid = (Qp // _TQ, Tp // _TT)
    idx, best, second = pl.pallas_call(
        _k2nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, DESC_BITS), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TT, DESC_BITS), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TT), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TQ, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TQ, 1), jnp.int32),
            pltpu.VMEM((_TQ, 1), jnp.int32),
            pltpu.VMEM((_TQ, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Tp * DESC_BITS,
            bytes_accessed=(Qp + Tp) * DESC_BITS + Qp * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sq, st, penalty)
    return idx[:, 0], best[:, 0], second[:, 0]


def hamming_2nn_pallas(
    q_desc: jnp.ndarray,
    t_desc: jnp.ndarray,
    q_valid: jnp.ndarray,
    t_valid: jnp.ndarray,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 2-NN; same contract as hamming_2nn_xla. Pads to tile multiples."""
    if interpret is None:
        interpret = interpret_mode()
    Q, T = q_desc.shape[0], t_desc.shape[0]
    Qp, Tp = _round_up(Q, _TQ), _round_up(T, _TT)

    sq = unpack_bipolar(q_desc)
    st = unpack_bipolar(t_desc)
    sq = jnp.pad(sq, ((0, Qp - Q), (0, 0)))
    st = jnp.pad(st, ((0, Tp - T), (0, 0)))
    penalty = jnp.where(t_valid, 0, _INVALID_DIST).astype(jnp.int32)
    penalty = jnp.pad(penalty, (0, Tp - T), constant_values=_INVALID_DIST)
    penalty = penalty[None, :]  # (1, Tp)

    idx, best, second = _k2nn_pallas_padded(sq, st, penalty, interpret=interpret)
    idx, best, second = idx[:Q], best[:Q], second[:Q]
    best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
    second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
    return idx, best, second


def hamming_2nn(q_desc, t_desc, q_valid, t_valid):
    if use_pallas():
        return hamming_2nn_pallas(q_desc, t_desc, q_valid, t_valid)
    return hamming_2nn_xla(q_desc, t_desc, q_valid, t_valid)


def pack_bank(t_desc: jnp.ndarray, t_valid: jnp.ndarray):
    """Precompute the device-resident training bank (setMapData parity,
    GPUMatcher.hpp:110-117): unpacked ±1 int8 descriptors + invalid-entry
    penalty row, padded to kernel tiles. Re-unpacking a 4096-entry bank every
    match call costs ~0.5 ms; a resident map bank amortizes it to zero."""
    T = t_desc.shape[0]
    Tp = _round_up(T, _TT)
    st = jnp.pad(unpack_bipolar(t_desc), ((0, Tp - T), (0, 0)))
    penalty = jnp.where(t_valid, 0, _INVALID_DIST).astype(jnp.int32)
    penalty = jnp.pad(penalty, (0, Tp - T), constant_values=_INVALID_DIST)
    return st, penalty[None, :], T


def hamming_2nn_bank(q_desc, q_valid, bank, interpret: bool | None = None):
    """2-NN against a precomputed resident bank (same contract as
    hamming_2nn). Falls back to the XLA path off-TPU."""
    st, penalty, T = bank
    if not use_pallas() and not (interpret or interpret_mode()):
        # reconstruct validity from the penalty row for the XLA path
        t_valid = (penalty[0, :T] == 0)
        # XLA path re-unpacks; used only in CPU tests
        sq = unpack_bipolar(q_desc, jnp.float32)
        stf = st[:T].astype(jnp.float32)
        dot = jnp.dot(sq, stf.T, preferred_element_type=jnp.float32)
        dist = (DESC_BITS - dot) * 0.5
        dist = dist + jnp.where(t_valid, 0.0, float(_INVALID_DIST))[None, :]
        neg_top2, idx_top2 = jax.lax.top_k(-dist, 2)
        best = (-neg_top2[:, 0]).astype(jnp.int32)
        second = (-neg_top2[:, 1]).astype(jnp.int32)
        best_idx = idx_top2[:, 0].astype(jnp.int32)
        best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
        second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
        return best_idx, best, second
    if interpret is None:
        interpret = interpret_mode()
    Q = q_desc.shape[0]
    Qp = _round_up(Q, _TQ)
    sq = jnp.pad(unpack_bipolar(q_desc), ((0, Qp - Q), (0, 0)))
    idx, best, second = _k2nn_pallas_padded(sq, st, penalty, interpret=interpret)
    idx, best, second = idx[:Q], best[:Q], second[:Q]
    best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
    second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
    return idx, best, second


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact popcount Hamming distance between packed descriptor rows (test oracle)."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
