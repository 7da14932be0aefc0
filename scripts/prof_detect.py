"""Bench: pyramid precision variants, stacked FAST, extraction tuning."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.ops import fast as fast_ops
from coloc_tpu.ops import pyramid as pyr_ops

H, W, LEVELS, K = 480, 752, 8, 1024
ITERS = 50


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    try:
        jax.block_until_ready(loop(x0))
    except Exception as e:
        print(f"{name:48s} FAILED: {str(e)[:150]}")
        return
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    dt = (time.time() - t0) / ITERS
    print(f"{name:48s} {dt*1e3:8.3f} ms")


def resize_prec(img, shape, precision):
    return jax.image.resize(img, shape, method="linear", antialias=False,
                            precision=precision)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    shapes = pyr_ops.level_shapes(H, W, LEVELS, 1.2)

    def pyr_highest(c):
        lv = [c]
        for l in range(1, LEVELS):
            lv.append(resize_prec(lv[-1], shapes[l], jax.lax.Precision.HIGHEST))
        return c + lv[-1][0, 0] * 1e-12

    def pyr_high(c):
        lv = [c]
        for l in range(1, LEVELS):
            lv.append(resize_prec(lv[-1], shapes[l], jax.lax.Precision.HIGH))
        return c + lv[-1][0, 0] * 1e-12

    def pyr_default(c):
        lv = [c]
        for l in range(1, LEVELS):
            lv.append(resize_prec(lv[-1], shapes[l], jax.lax.Precision.DEFAULT))
        return c + lv[-1][0, 0] * 1e-12

    chain("pyramid HIGHEST (current global)", pyr_highest, img)
    chain("pyramid HIGH", pyr_high, img)
    chain("pyramid DEFAULT", pyr_default, img)

    # ---- stacked FAST: one pallas call over vertically stacked levels ----
    levels = pyr_ops.build_pyramid(img, LEVELS, 1.2)
    wp = 768
    rows = []
    for lvl in levels:
        h, w = lvl.shape
        rows.append(jnp.pad(lvl, ((0, 0), (0, wp - w))))
    stacked = jnp.concatenate(rows, axis=0)
    print(f"# stacked shape: {stacked.shape}")

    def fast_stacked(c):
        raw, nms = fast_ops.fast_nms_pallas(stacked + c * 1e-12, 12.0)
        return c + nms[0, 0] * 1e-12

    def fast_perlevel(c):
        acc = c
        for lvl in levels:
            raw, nms = fast_ops.fast_nms_pallas(lvl + c * 1e-12, 12.0)
            acc = acc + nms[0, 0] * 1e-12
        return acc

    x0 = jnp.zeros((), jnp.float32)
    chain("FAST pallas per-level (8 calls)", fast_perlevel, x0)
    chain("FAST pallas stacked (1 call)", fast_stacked, x0)

    # ---- topk variants over stacked NMS map ----
    raw, nms = fast_ops.fast_nms_pallas(stacked, 12.0)
    flat = nms.reshape(-1)

    def topk_exact(c):
        v, i = jax.lax.top_k(flat + c * 1e-12, K)
        return c + v[0] * 1e-12

    def topk_approx(c):
        v, i = jax.lax.approx_max_k(flat + c * 1e-12, K)
        return c + v[0] * 1e-12

    chain("top_k exact over stacked (1.35M)", topk_exact, x0)
    chain("approx_max_k over stacked (1.35M)", topk_approx, x0)


if __name__ == "__main__":
    main()
