"""Roofline dissection of the fused Hamming 2-NN kernel (ops/hamming.py).

Measures, at the bench capacity shape (Q=5120 padded, T=8192):
  A. pure int8 MXU matmul ceiling (same tiling, row-sum epilogue only)
  B. the production kernel (dist-space epilogue, 7 elementwise passes/tile)
  C. a dot-space packed-key epilogue (4 elementwise passes/tile):
       key = (dot << 16) + penrcol, where penrcol pre-folds the invalid
       penalty (pen * 65536) and the reversed-column tiebreak bits, so one
       max-reduce yields (best dot incl. penalty, argbest col) and a single
       mask+max yields the second-best — no (TQ,TT) dist conversion at all.
  D. tile-size variants of C.

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_k2nn_roofline.py
(one TPU job at a time; iters>=200 chained, outputs consumed)

ROUND-4 FINDINGS (closing VERDICT r3 item 5) — the kernel is at its
practical ceiling; the residual gap is fully attributed:

  ceiling A (matmul + row-sum)       199-207 G cmp/s  <- MXU at rate: the
      537 MMAC/tile at the int8-dot issue rate ~= the measured 5.1 us/tile,
      so A is MXU-bound, not epilogue-bound. bf16 operands measure 132 G
      (int8 is ~1.5x bf16 here); int4 is rejected by this toolchain.
  production C (512,2048)            149-175 G cmp/s across sessions
      (the remote-tunnel timing varies +-8%; BENCH_r03's "186" and this
      script's old "166" were single-session draws of that distribution).

  The ~1.6 us/tile gap A-C is the 2-NN epilogue: ~6 VPU ops/element
  (key pack, max-reduce, mask-compare-select, second max-reduce) that
  Mosaic executes strictly AFTER the tile's dot (true data dependence).
  Three overlap attempts all measured SLOWER and were abandoned:
    - parity double-buffer scratch (epilogue of tile i-1 while matmul of
      tile i): 136 G — the (TQ,TT) i32 scratch write+read adds 2 full
      VMEM passes and pl.when predication serializes regions;
    - single-scratch WAR pipelining: 128 G — same copies, worse hazard;
    - in-kernel chunked interleave (nc sub-tiles, all dots issued before
      all epilogues, no scratch): 145-150 G — Mosaic does not co-schedule
      the independent VPU chains into the MXU drain.
  TT=4096 vs 2048 is within session noise (interleaved A/B x3).

  Cutting the epilogue below ~4 ops/element is blocked by exactness: the
  second-best needs the within-tile non-argmax max (CUDAK2NN duplicate
  semantics), and every cheaper formulation tried either loses the
  argbest column (costs a recovery pass) or breaks exact-distance parity
  for invalid banks. Conclusion: ~75-85% of the same-tiling matmul
  ceiling IS the speed of light for an exact fused 2-NN on this MXU/VPU
  balance; further gains need an epilogue-free algorithm change (e.g.
  approximate pre-filtering), which trades exactness the matcher's
  contract does not allow.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coloc_tpu.ops import hamming

Q, T = 5120, 8192
ITERS = 300
DESC_BITS = 512
_INVALID = 2048
_MIN_KEY = -(1 << 30)
_DOT_INVALID = DESC_BITS - 2 * _INVALID  # dist == _INVALID in dot space


def chain(name, fn, s0, per_call_cmp):
    @jax.jit
    def loop(s):
        def body(i, c):
            out = fn(c)
            # feed one output element back into an operand row (array carry)
            return c.at[0, 0].set((out & 1).astype(jnp.int8))
        return jax.lax.fori_loop(0, ITERS, body, s)

    jax.block_until_ready(loop(s0))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(loop(s0))
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:52s} {best*1e6:9.1f} us   "
          f"{per_call_cmp / best / 1e9:7.1f} G cmp/s")
    return best


# --------------------------------------------------------------------------
# A. matmul ceiling: dot + row-sum only
# --------------------------------------------------------------------------


def _ceiling_kernel(q_ref, t_ref, out_ref, acc_s):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc_s[:] = acc_s[:] + jnp.sum(dot, axis=1, keepdims=True)

    @pl.when(ti == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_s[:]


@functools.partial(jax.jit, static_argnames=("tq", "tt"))
def ceiling(sq, st, tq=512, tt=2048):
    Qp, Tp = sq.shape[0], st.shape[0]
    out = pl.pallas_call(
        _ceiling_kernel,
        grid=(Qp // tq, Tp // tt),
        in_specs=[
            pl.BlockSpec((tq, DESC_BITS), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, DESC_BITS), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, 1), lambda qi, ti: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, 1), jnp.int32)],
    )(sq, st)
    return out[:, 0]


# --------------------------------------------------------------------------
# C. dot-space packed-key epilogue
# --------------------------------------------------------------------------


def _k2nn_dot_kernel(q_ref, t_ref, penrcol_ref, idx_ref, best_ref, second_ref,
                     bdot_s, sdot_s, idx_s, *, tt):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        bdot_s[:] = jnp.full_like(bdot_s, _DOT_INVALID)
        sdot_s[:] = jnp.full_like(sdot_s, _DOT_INVALID)
        idx_s[:] = jnp.full_like(idx_s, -1)

    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # key = (dot + pen) * 65536 + (tt-1-col): one shift + one add; the
    # penalty and the reversed-column tiebreak are pre-folded into penrcol
    key = (dot << 16) + penrcol_ref[:]
    kmax = jnp.max(key, axis=1, keepdims=True)                     # (TQ, 1)
    masked = jnp.where(key == kmax, _MIN_KEY, key)
    kmax2 = jnp.max(masked, axis=1, keepdims=True)

    tile_best = jax.lax.shift_right_arithmetic(kmax, 16)
    tile_second = jax.lax.shift_right_arithmetic(kmax2, 16)
    tile_arg = (tt - 1) - (kmax & 65535) + ti * tt

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
        best_ref[:] = (DESC_BITS - new_best) >> 1
        second_ref[:] = (DESC_BITS - new_second) >> 1


@functools.partial(jax.jit, static_argnames=("tq", "tt", "interpret"))
def k2nn_dot(sq, st, penrcol, tq=512, tt=2048, interpret=False):
    Qp, Tp = sq.shape[0], st.shape[0]
    kern = functools.partial(_k2nn_dot_kernel, tt=tt)
    idx, best, second = pl.pallas_call(
        kern,
        grid=(Qp // tq, Tp // tt),
        in_specs=[
            pl.BlockSpec((tq, DESC_BITS), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, DESC_BITS), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt), lambda qi, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tq, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.int32),
            pltpu.VMEM((tq, 1), jnp.int32),
            pltpu.VMEM((tq, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Tp * DESC_BITS,
            bytes_accessed=(Qp + Tp) * DESC_BITS + Qp * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sq, st, penrcol)
    return idx[:, 0], best[:, 0], second[:, 0]


def make_penrcol(t_valid, Tp, tt):
    pen = np.where(np.pad(np.asarray(t_valid), (0, Tp - t_valid.shape[0]),
                          constant_values=False), 0, -2 * _INVALID)
    col = np.arange(Tp)
    rcol = (tt - 1) - (col % tt)
    return jnp.asarray((pen.astype(np.int64) * 65536 + rcol)[None, :],
                       jnp.int32)


def main():
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.integers(0, 2**32, (Q, 16), dtype=np.uint64)
                     .astype(np.uint32))
    td = jnp.asarray(rng.integers(0, 2**32, (T, 16), dtype=np.uint64)
                     .astype(np.uint32))
    tv = np.ones(T, bool)
    tv[T - 5:] = False  # a few invalid rows to exercise the penalty path

    sq = hamming.unpack_bipolar(qd)
    st = hamming.unpack_bipolar(td)
    # production epilogue row (dot-space, since the packed-key rework)
    penrcol_prod = hamming._penrcol_row(jnp.asarray(tv), T)

    ncmp = Q * T
    print(f"shape Q={Q} T={T}  ({ncmp/1e6:.1f} M cmp/call, iters={ITERS})")
    print(f"int8 MXU ideal on v5e (394 TOPS): "
          f"{394e12 / (2 * DESC_BITS) / 1e9:.0f} G cmp/s\n")

    # correctness of the dot-space variants vs production first
    i0, b0, s0 = hamming._k2nn_pallas_padded(sq, st, penrcol_prod)
    for tq, tt in [(512, 2048), (256, 2048), (1024, 2048), (512, 1024),
                   (256, 4096), (512, 4096)]:
        pr = make_penrcol(tv, T, tt)
        try:
            i1, b1, s1 = k2nn_dot(sq, st, pr, tq=tq, tt=tt)
        except Exception as e:
            print(f"dot-space tq={tq} tt={tt}: FAILED compile: "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        ok = (np.array_equal(i0, i1) and np.array_equal(b0, b1)
              and np.array_equal(s0, s1))
        print(f"dot-space tq={tq} tt={tt}: parity={'OK' if ok else 'MISMATCH'}")
    print()

    chain("A ceiling matmul+rowsum (512,2048)",
          lambda s: ceiling(s, st)[0], sq, ncmp)
    chain("A ceiling matmul+rowsum (1024,2048)",
          lambda s: ceiling(s, st, tq=1024)[0], sq, ncmp)
    chain("B production dot-space (512,2048)",
          lambda s: hamming._k2nn_pallas_padded(s, st, penrcol_prod)[1][0],
          sq, ncmp)
    for tq, tt in [(512, 2048), (256, 2048), (1024, 2048), (512, 1024),
                   (256, 4096), (512, 4096)]:
        pr = make_penrcol(tv, T, tt)
        try:
            chain(f"C dot-space packed-key ({tq},{tt})",
                  lambda s, pr=pr, tq=tq, tt=tt:
                  k2nn_dot(s, st, pr, tq=tq, tt=tt)[1][0], sq, ncmp)
        except Exception as e:
            print(f"C ({tq},{tt}) failed: {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
