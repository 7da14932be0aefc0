"""Dissect the FAST kernel: DMA-only vs rolls vs cascade cost."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coloc_tpu.ops.fast import RING_OFFSETS

TH, TW, HALO = 64, 128, 4
H, W = 2232, 768   # stacked-pyramid scale
ITERS = 50


def run(name, kernel_body, nout=1):
    hp = ((H + TH - 1) // TH) * TH
    wp = ((W + TW - 1) // TW) * TW

    @jax.jit
    def call(padded, thresh):
        outs = tuple(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32) for _ in range(nout))
        specs = tuple(
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM) for _ in range(nout))
        return pl.pallas_call(
            kernel_body,
            grid=(hp // TH, wp // TW),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=specs if nout > 1 else specs[0],
            out_shape=outs if nout > 1 else outs[0],
            scratch_shapes=[
                pltpu.VMEM((TH + 2 * HALO, TW + 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(padded, thresh)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    padded = jnp.pad(img, ((HALO, HALO + ((H + TH - 1) // TH) * TH - H),
                           (HALO, (128 - HALO) + ((W + TW - 1) // TW) * TW - W)),
                     mode="edge")
    thresh = jnp.asarray([20.0], jnp.float32)

    @jax.jit
    def loop(x):
        def body(i, c):
            o = call(x + c * 1e-12, thresh)
            o0 = o[0] if isinstance(o, (tuple, list)) else o
            return c + o0[0, 0] * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    try:
        jax.block_until_ready(loop(padded))
    except Exception as e:
        print(f"{name:40s} FAILED {str(e)[:120]}")
        return
    t0 = time.time()
    jax.block_until_ready(loop(padded))
    print(f"{name:40s} {(time.time()-t0)/ITERS*1e3:8.3f} ms")


def k_dma_only(img_hbm, thresh_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TH, TH + 2 * HALO), pl.ds(j * TW, TW + 128)],
        win, sem)
    dma.start()
    dma.wait()
    out_ref[:, :] = win[HALO:HALO + TH, HALO:HALO + TW] * thresh_ref[0]


def _roll(a, d, axis):
    return pltpu.roll(a, (-d) % a.shape[axis], axis)


def k_rolls_only(img_hbm, thresh_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TH, TH + 2 * HALO), pl.ds(j * TW, TW + 128)],
        win, sem)
    dma.start()
    dma.wait()
    w = win[:, :]
    acc = w
    for dy, dx in RING_OFFSETS:
        a = _roll(w, dy, 0) if dy else w
        a = _roll(a, dx, 1) if dx else a
        acc = acc + a
    out_ref[:, :] = acc[HALO:HALO + TH, HALO:HALO + TW] * thresh_ref[0]


def k_full(img_hbm, thresh_ref, out_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TH, TH + 2 * HALO), pl.ds(j * TW, TW + 128)],
        win, sem)
    dma.start()
    dma.wait()
    w = win[:, :]
    rows = {dy: (_roll(w, dy, 0) if dy else w)
            for dy in sorted({dy for dy, _ in RING_OFFSETS})}
    dev = [( _roll(rows[dy], dx, 1) if dx else rows[dy]) - w
           for dy, dx in RING_OFFSETS]

    def cascade(vals):
        def rot(lst, s):
            return lst[s:] + lst[:s]
        r2 = [jnp.minimum(a, b) for a, b in zip(vals, rot(vals, 1))]
        r4 = [jnp.minimum(a, b) for a, b in zip(r2, rot(r2, 2))]
        r8 = [jnp.minimum(a, b) for a, b in zip(r4, rot(r4, 4))]
        return [jnp.minimum(a, b) for a, b in zip(r8, rot(vals, 8))]

    b = cascade(dev)
    d = cascade([-x for x in dev])
    score = b[0]
    for a in b[1:] + d:
        score = jnp.maximum(score, a)
    score = jnp.where(score > thresh_ref[0], score, 0.0)
    out_ref[:, :] = score[HALO:HALO + TH, HALO:HALO + TW]


if __name__ == "__main__":
    run("dma only", k_dma_only)
    run("dma + 16 ring rolls", k_rolls_only)
    run("dma + rolls + cascade (no nms)", k_full)
