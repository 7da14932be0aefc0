"""Test + bench Pallas patch extraction with dynamic offsets on TPU."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, K = 1760, 768, 1024
PH = 64
ITERS = 100
KB = 8


def make_extract(pw, align):
    def kernel(row0_ref, col0_ref, src_hbm, out_ref, sems):
        i = pl.program_id(0)
        copies = []
        for j in range(KB):
            k = i * KB + j
            c0 = col0_ref[k]
            r0 = row0_ref[k]
            if align:
                c0 = (c0 // 128) * 128
                r0 = (r0 // 8) * 8
            c = pltpu.make_async_copy(
                src_hbm.at[pl.ds(r0, PH), pl.ds(c0, pw)],
                out_ref.at[j],
                sems.at[j],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

    @jax.jit
    def extract(src, row0, col0):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(K // KB,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (KB, PH, pw), lambda i, r, c: (i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((KB,))],
            ),
            out_shape=jax.ShapeDtypeStruct((K, PH, pw), jnp.float32),
        )(row0, col0, src)
    return extract


def chain(name, fn, *args):
    @jax.jit
    def loop(x):
        def body(i, c):
            return c + fn(*args).sum() * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, x)
    x0 = jnp.zeros((), jnp.float32)
    try:
        jax.block_until_ready(loop(x0))
    except Exception as e:
        print(f"{name:48s} FAILED: {str(e)[:200]}")
        return
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    dt = (time.time() - t0) / ITERS
    print(f"{name:48s} {dt*1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    row0 = jnp.asarray(rng.integers(0, H - PH, K), jnp.int32)
    col0u = jnp.asarray(rng.integers(0, W - 256, K), jnp.int32)

    ex_al = make_extract(256, align=True)
    ex_un = make_extract(64, align=False)

    # correctness check for the aligned variant
    out = np.asarray(jax.block_until_ready(ex_al(src, row0, col0u)))
    r0 = (int(row0[5]) // 8) * 8; c0 = (int(col0u[5]) // 128) * 128
    ref = np.asarray(src)[r0:r0 + PH, c0:c0 + 256]
    assert np.array_equal(out[5], ref), "aligned extraction mismatch"
    print("aligned extraction correct")

    chain("pallas extract (64,256) aligned", ex_al, src, row0, col0u)
    import os
    if os.environ.get("TRY_UNALIGNED") != "1":
        return
    chain("pallas extract (64,64) unaligned", ex_un, src, row0, col0u)

    # unaligned correctness if it ran
    try:
        out = np.asarray(jax.block_until_ready(ex_un(src, row0, col0u)))
        r0 = int(row0[7]); c0 = int(col0u[7])
        ref = np.asarray(src)[r0:r0 + PH, c0:c0 + 64]
        print("unaligned correct:", np.array_equal(out[7], ref))
    except Exception as e:
        print("unaligned failed:", str(e)[:150])


if __name__ == "__main__":
    main()
