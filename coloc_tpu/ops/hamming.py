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
_MIN_KEY = -(1 << 30)
# dot-space encoding of an INVALID-distance result: dist = (512 - dot) / 2,
# so dot = 512 - 2*dist hits _INVALID_DIST at 512 - 2*2048
_DOT_INVALID = DESC_BITS - 2 * _INVALID_DIST


def _k2nn_kernel(q_ref, t_ref, penrcol_ref, idx_ref, best_ref, second_ref,
                 bdot_s, sdot_s, idx_s):
    """Grid = (Q/TQ, T/TT); ti (dim 1) iterates fastest, accumulating the
    running (best, second, argbest) per query row in VMEM scratch.

    The epilogue works entirely in DOT space (maximize <s_q, s_t>) with a
    single packed int32 key per element:

        key = (dot << 16) + penrcol,   penrcol = pen*65536 + (TT-1-col)

    so one max-reduce yields both the best penalized dot (high 16 bits,
    arithmetic >>16 is exact for any sign since the low half is in [0, 2^16))
    and the LOWEST column attaining it (reversed-column tiebreak in the low
    bits); keys are unique, so masking exactly the argmax element and
    max-reducing again yields the second-best with CUDAK2NN duplicate
    semantics (a duplicated best descriptor leaves its twin as second).
    Four elementwise passes over the (TQ, TT) tile (shift, add, compare,
    select) + two reduces — down from seven in the dist-space formulation;
    measured on v5e at Q=5120, T=8192: 149-175 G cmp/s across sessions
    (remote-tunnel timing varies +-8%) vs the 199-207 G cmp/s matmul +
    row-sum ceiling of the same tiling. The residual gap is the epilogue's
    ~6 VPU ops/element executing strictly after the tile's MXU dot; scratch
    pipelining, chunked interleaving, bf16 and int4 operands all measured
    SLOWER or are unsupported — see scripts/prof_k2nn_roofline.py
    "ROUND-4 FINDINGS" for the full attribution. Only the final (TQ, 1)
    triple converts back to distances. Penalized dots stay within int32 key
    range: dot + pen >= -512 - 4096, so key >= -302M."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        bdot_s[:] = jnp.full_like(bdot_s, _DOT_INVALID)
        sdot_s[:] = jnp.full_like(sdot_s, _DOT_INVALID)
        idx_s[:] = jnp.full_like(idx_s, -1)

    # (TQ, TT) ±1 dots via MXU (exact int32 accumulation)
    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        # explicit DEFAULT: the library-wide "highest" matmul precision (set
        # for f32 geometry in coloc_tpu/__init__) is meaningless for int8
        # operands and makes Mosaic reject the op ("Bad lhs type")
        precision=jax.lax.Precision.DEFAULT,
    )
    key = (dot << 16) + penrcol_ref[:]  # penrcol (1, TT) broadcasts
    kmax = jnp.max(key, axis=1, keepdims=True)                      # (TQ, 1)
    masked = jnp.where(key == kmax, _MIN_KEY, key)
    kmax2 = jnp.max(masked, axis=1, keepdims=True)                  # (TQ, 1)

    tile_best = jax.lax.shift_right_arithmetic(kmax, 16)
    tile_second = jax.lax.shift_right_arithmetic(kmax2, 16)
    tile_arg = (_TT - 1) - (kmax & 65535) + ti * _TT

    # merge running triple with tile triple (strict > keeps the earlier
    # tile on ties -> lowest global index, matching the XLA top_k path)
    old_best, old_second, old_idx = bdot_s[:], sdot_s[:], idx_s[:]
    take_new = tile_best > old_best
    new_best = jnp.where(take_new, tile_best, old_best)
    new_idx = jnp.where(take_new, tile_arg, old_idx)
    new_second = jnp.where(
        take_new,
        jnp.maximum(old_best, tile_second),
        jnp.maximum(old_second, tile_best),
    )
    bdot_s[:] = new_best
    sdot_s[:] = new_second
    idx_s[:] = new_idx

    @pl.when(ti == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = idx_s[:]
        # dot -> dist only on the (TQ, 1) result; dots are even (512 ±1
        # terms), penalties are even multiples, so the shift is exact
        best_ref[:] = (DESC_BITS - new_best) >> 1
        second_ref[:] = (DESC_BITS - new_second) >> 1


def _penrcol_row(t_valid: jnp.ndarray, Tp: int) -> jnp.ndarray:
    """(1, Tp) int32 epilogue row: pen*65536 + (TT-1 - col%TT), where pen is
    0 for valid entries and -2*_INVALID_DIST (dist-space +_INVALID_DIST) for
    invalid/padded ones. Entry >= 0 iff the train row is valid."""
    T = t_valid.shape[0]
    pen = jnp.where(t_valid, 0, jnp.int32(-2 * _INVALID_DIST * 65536))
    pen = jnp.pad(pen.astype(jnp.int32), (0, Tp - T),
                  constant_values=-2 * _INVALID_DIST * 65536)
    rcol = (_TT - 1) - (jnp.arange(Tp, dtype=jnp.int32) % _TT)
    return (pen + rcol)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _k2nn_pallas_padded(sq, st, penrcol, interpret=False):
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
    )(sq, st, penrcol)
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
    penrcol = _penrcol_row(t_valid, Tp)

    idx, best, second = _k2nn_pallas_padded(sq, st, penrcol, interpret=interpret)
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
    GPUMatcher.hpp:110-117): unpacked ±1 int8 descriptors + the kernel's
    packed penalty/tiebreak epilogue row, padded to kernel tiles.
    Re-unpacking a 4096-entry bank every match call costs ~0.5 ms; a
    resident map bank amortizes it to zero."""
    T = t_desc.shape[0]
    Tp = _round_up(T, _TT)
    st = jnp.pad(unpack_bipolar(t_desc), ((0, Tp - T), (0, 0)))
    return st, _penrcol_row(t_valid, Tp), T


def hamming_2nn_bank(q_desc, q_valid, bank, interpret: bool | None = None):
    """2-NN against a precomputed resident bank (same contract as
    hamming_2nn). Falls back to the XLA path off-TPU."""
    st, penrcol, T = bank
    if not use_pallas() and not (interpret or interpret_mode()):
        # reconstruct validity from the epilogue row for the XLA path
        # (valid entries carry only the non-negative column tiebreak bits)
        t_valid = (penrcol[0, :T] >= 0)
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
    idx, best, second = _k2nn_pallas_padded(sq, st, penrcol, interpret=interpret)
    idx, best, second = idx[:Q], best[:Q], second[:Q]
    best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
    second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
    return idx, best, second


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact popcount Hamming distance between packed descriptor rows (test oracle)."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Two-stage matcher for very large banks (SURVEY §5 long-axis analog)
# ---------------------------------------------------------------------------
#
# Brute-force 2-NN is MXU-bound at Q*T*512 MACs; past ~10^5 landmarks the
# bank, not the frame, dominates per-frame cost. The two-stage matcher
# prunes with a 128-bit stride-sampled prefilter (1/4 the MACs) that keeps
# the top-2 candidates of every GROUP of _GROUP train rows, then re-ranks
# the surviving 2*T/_GROUP candidates with EXACT 512-bit popcount
# distances (CUDAK2NN margin semantics intact on the survivors:
# lowest-index best, duplicate descriptors leave their twin as second).
#
# MEASURED NEGATIVE RESULT (round 5, v5e, kp=1024 x 262144 bank): the
# two-stage full op costs 5.61 ms vs 1.24 ms BRUTE FORCE — the v5e MXU
# runs the full 512-bit distance matrix faster than stage 2 can gather
# 2G candidate rows per query (XLA row-gather from a 260k-row HBM table
# is the dominant cost; the prefilter matmul itself is ~0.3 ms-class).
# Brute force therefore stays the default at every bench size and
# sharding (parallel.mesh.sharded_map_match) remains the recommended
# scale-out; this path is kept as the measured prototype + exactness
# harness for gather-friendlier hardware or banks too large for one
# chip's brute-force budget.
#
# Contract (documented approximation): the best match is retrieved exactly
# whenever its group-local 128-bit rank is <= 2 — for matching-shaped data
# (a true match sits tens of bits below the background pool) this is
# overwhelmingly the case, and tests/test_hamming.py pins accepted-set
# equality against the brute-force kernel at 256k. The SECOND-best (margin
# denominator) is the minimum over the candidate pool, not the global
# pool, so margins are biased up by a few bits when the true second-best
# hides outside the survivors — accept decisions at the reference
# threshold (60) are unaffected for true matches, which is what the test
# asserts. For exact-margin semantics at any size, use the brute-force
# kernel or shard it (parallel.mesh.sharded_map_match).

_GROUP = 2048          # train rows per prefilter group (= _TT tile)
_PF_BITS = 128         # stride-sampled prefilter bits (512 / 4)
_PF_STRIDE = DESC_BITS // _PF_BITS
_CAND_IDX_MASK = (1 << 20) - 1   # candidate index field in the rerank key
_RERANK_INVALID = 600            # > any real distance, keeps keys in int32


def _make_k2nn_group_kernel(G: int):
    """Grid = (Q/TQ, G): per (query tile, group) record the group-local
    best and second-best candidate GLOBAL indices (128-bit dot space,
    packed-key argmax — same trick as _k2nn_kernel). The (TQ, G) output
    blocks stay VMEM-resident across the gi-fastest grid walk (index map
    pins them to (qi, 0) — Mosaic forbids lane-dim-1 blocks), and each
    step one-hot-writes its own column; every column is written exactly
    once before the block flushes at the qi roll-over."""

    def kernel(q_ref, t_ref, penrcol_ref, idx1_ref, idx2_ref):
        gi = pl.program_id(1)
        dot = jax.lax.dot_general(
            q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        key = (dot << 16) + penrcol_ref[:]
        kmax = jnp.max(key, axis=1, keepdims=True)
        masked = jnp.where(key == kmax, _MIN_KEY, key)
        kmax2 = jnp.max(masked, axis=1, keepdims=True)
        base = gi * _GROUP
        i1 = (_GROUP - 1) - (kmax & 65535) + base        # (TQ, 1)
        i2 = (_GROUP - 1) - (kmax2 & 65535) + base
        col = jax.lax.broadcasted_iota(jnp.int32, (_TQ, G), 1) == gi
        idx1_ref[:] = jnp.where(col, i1, idx1_ref[:])
        idx2_ref[:] = jnp.where(col, i2, idx2_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _group_top2_pallas(sq_sub, st_sub, penrcol, interpret=False):
    Qp, Tp = sq_sub.shape[0], st_sub.shape[0]
    G = Tp // _GROUP
    grid = (Qp // _TQ, G)
    idx1, idx2 = pl.pallas_call(
        _make_k2nn_group_kernel(G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, _PF_BITS), lambda qi, gi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GROUP, _PF_BITS), lambda qi, gi: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _GROUP), lambda qi, gi: (0, gi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TQ, G), lambda qi, gi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, G), lambda qi, gi: (qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, G), jnp.int32),
            jax.ShapeDtypeStruct((Qp, G), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Tp * _PF_BITS,
            bytes_accessed=(Qp + Tp) * _PF_BITS + Qp * G * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sq_sub, st_sub, penrcol)
    return idx1, idx2


def pack_bank_twostage(t_desc: jnp.ndarray, t_valid: jnp.ndarray):
    """Resident two-stage bank: stride-sampled ±1 prefilter operand +
    penalty row + the PACKED full descriptors (stage 2 gathers these) +
    validity. Groups pad to _GROUP multiples with invalid rows."""
    T = t_desc.shape[0]
    if T > _CAND_IDX_MASK + 1:
        # the re-rank key packs the candidate index into 20 bits; a larger
        # bank would silently bleed indices into the distance field
        raise ValueError(
            f"two-stage bank capped at {_CAND_IDX_MASK + 1} rows (got {T});"
            " shard the bank (parallel.mesh.sharded_map_match) instead"
        )
    Tp = _round_up(T, _GROUP)
    st = unpack_bipolar(t_desc)                     # (T, 512) int8
    st_sub = jnp.pad(st[:, ::_PF_STRIDE], ((0, Tp - T), (0, 0)))
    penrcol = _penrcol_row(t_valid, Tp)
    return st_sub, penrcol, t_desc, t_valid, T


def _group_top2_xla(sq_sub, st_sub, penrcol):
    """XLA fallback for the group prefilter (off-TPU / COLOC_TPU_PALLAS=0):
    same packed-key semantics as the Pallas kernel, one (Q, G, group)
    reshape + top-2."""
    Qp, Tp = sq_sub.shape[0], st_sub.shape[0]
    G = Tp // _GROUP
    dot = jnp.dot(
        sq_sub.astype(jnp.float32), st_sub.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    key = (dot << 16) + penrcol
    key = key.reshape(Qp, G, _GROUP)
    top2, _ = jax.lax.top_k(key, 2)                 # (Qp, G, 2)
    base = jnp.arange(G, dtype=jnp.int32)[None, :] * _GROUP
    idx1 = (_GROUP - 1) - (top2[:, :, 0] & 65535) + base
    idx2 = (_GROUP - 1) - (top2[:, :, 1] & 65535) + base
    return idx1, idx2


def hamming_2nn_twostage(
    q_desc: jnp.ndarray,   # (Q, 16) uint32
    q_valid: jnp.ndarray,  # (Q,) bool
    bank,                  # pack_bank_twostage output
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-stage 2-NN against a resident large bank; same output contract
    as hamming_2nn (idx, best, second)."""
    if interpret is None:
        interpret = interpret_mode()
    st_sub, penrcol, t_desc, t_valid, T = bank
    Q = q_desc.shape[0]
    Qp = _round_up(Q, _TQ)

    # ---- stage 1: group-local top-2 at 128 prefilter bits (MXU) ----------
    sq = unpack_bipolar(q_desc)
    sq_sub = jnp.pad(sq[:, ::_PF_STRIDE], ((0, Qp - Q), (0, 0)))
    if use_pallas() or interpret:
        idx1, idx2 = _group_top2_pallas(sq_sub, st_sub, penrcol,
                                        interpret=interpret)
    else:
        # off-TPU / COLOC_TPU_PALLAS=0: bit-identical XLA formulation
        idx1, idx2 = _group_top2_xla(sq_sub, st_sub, penrcol)
    cand = jnp.concatenate([idx1[:Q], idx2[:Q]], axis=1)     # (Q, 2G)

    # ---- stage 2: exact 512-bit popcount re-rank of the survivors --------
    safe = jnp.clip(cand, 0, T - 1)
    cd = t_desc[safe]                                        # (Q, 2G, 16)
    dist = jnp.sum(
        jax.lax.population_count(jnp.bitwise_xor(cd, q_desc[:, None, :])),
        axis=-1,
    ).astype(jnp.int32)                                      # (Q, 2G)
    ok = (cand >= 0) & (cand < T) & t_valid[safe]
    dist = jnp.where(ok, dist, _RERANK_INVALID)
    # packed re-rank key: distance-major, global-index tiebreak (lowest
    # index wins — matches the brute-force kernel); keys are unique because
    # candidate indices are unique (groups are disjoint, idx2 != idx1), so
    # masking exactly the min and re-reducing yields CUDAK2NN duplicate
    # semantics (a twin descriptor survives as second-best)
    skey = dist * (_CAND_IDX_MASK + 1) + safe
    k1 = jnp.min(skey, axis=1, keepdims=True)
    k2 = jnp.min(jnp.where(skey == k1, jnp.int32(2 ** 30), skey), axis=1)
    k1 = k1[:, 0]
    best_idx = (k1 & _CAND_IDX_MASK).astype(jnp.int32)
    best = k1 >> 20
    second = k2 >> 20
    best = jnp.where(best >= _RERANK_INVALID, _INVALID_DIST, best)
    second = jnp.where(second >= _RERANK_INVALID, _INVALID_DIST, second)
    best = jnp.where(q_valid, best, jnp.int32(_INVALID_DIST))
    second = jnp.where(q_valid, second, jnp.int32(_INVALID_DIST))
    return best_idx, best.astype(jnp.int32), second.astype(jnp.int32)
