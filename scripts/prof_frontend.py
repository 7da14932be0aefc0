"""Stage-by-stage frontend timing on the real device (new stacked layout)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.config import DetectorOptions
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.ops import fast as fast_ops
from coloc_tpu.ops import patches as patch_ops
from coloc_tpu.ops import pyramid as pyr_ops
from coloc_tpu.io import synthetic

H, W, KP, LEVELS = 480, 752, 1024, 8
ITERS = 800


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(loop(x0))
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    dt = (time.time() - t0) / ITERS
    print(f"{name:45s} {dt*1e3:8.3f} ms")
    return dt


def main():
    opts = DetectorOptions(width=W, height=H, max_keypoints=KP,
                           num_levels=LEVELS, fast_threshold=12)
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                 np.float32)
    scene = synthetic.make_scene(H, W, K, seed=1)
    img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)))

    def feed(x, out):
        return x + out.reshape(-1)[0] * 1e-12

    def s_pyr(c):
        lv = pyr_ops.build_pyramid(c, LEVELS, 1.2)
        return feed(c, lv[-1])
    chain("pyramid (matmul resize)", s_pyr, img)

    def s_blur(c):
        lv = pyr_ops.build_pyramid(c, LEVELS, 1.2)
        sm = [pyr_ops.box_blur(l, opts.smoothing_radius) for l in lv]
        return feed(c, sm[-1])
    chain("pyramid + blur", s_blur, img)

    def s_stack(c):
        lv = pyr_ops.build_pyramid(c, LEVELS, 1.2)
        sp = patch_ops.stack_levels(lv)
        return feed(c, sp.stacked)
    chain("pyramid + stack", s_stack, img)

    def s_fast(c):
        lv = pyr_ops.build_pyramid(c, LEVELS, 1.2)
        sp = patch_ops.stack_levels(lv)
        raw, nms = fast_ops.fast_nms_pallas(sp.stacked, 12.0)
        return feed(c, nms)
    chain("+ FAST/NMS (stacked, 1 call)", s_fast, img)

    def s_topk(c):
        lv = pyr_ops.build_pyramid(c, LEVELS, 1.2)
        sp = patch_ops.stack_levels(lv)
        raw, nms = fast_ops.fast_nms_pallas(sp.stacked, 12.0)
        s, i = jax.lax.approx_max_k(nms.reshape(-1), KP)
        sx, sy = fast_ops.subpixel_refine(
            raw, (i % sp.wp).astype(jnp.float32),
            (i // sp.wp).astype(jnp.float32))
        return feed(c, s) + sx[0] * 1e-12
    chain("+ approx_max_k + subpixel", s_topk, img)

    # isolated: extraction + sampling machinery
    lv = pyr_ops.build_pyramid(img, LEVELS, 1.2)
    sm = [pyr_ops.box_blur(l, opts.smoothing_radius) for l in lv]
    sp = patch_ops.stack_levels(sm)
    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.integers(0, (sp.stacked.shape[0] - 64) // 8, KP),
                     jnp.int32) * 8
    c0 = jnp.asarray(rng.integers(0, (sp.wp - 256) // 128 + 1, KP),
                     jnp.int32) * 128
    lx = jnp.asarray(rng.uniform(10, 200, (KP, 241)), jnp.float32)
    ly = jnp.asarray(rng.uniform(4, 60, (KP, 241)), jnp.float32)

    def s_extract(c):
        P = patch_ops.extract_patches(c, r0, c0)
        return feed(c, P)
    chain("extract_patches (1024)", s_extract, sp.stacked)

    def s_sample(c):
        P = patch_ops.extract_patches(c, r0, c0)
        v = patch_ops.sample_nearest(P, lx, ly)
        return feed(c, v)
    chain("extract + sample_nearest (241/kp)", s_sample, sp.stacked)

    def s_full(c):
        f = detect_and_describe(c, opts)
        return (c + f.desc.sum().astype(jnp.float32) * 1e-12
                + f.xy.sum() * 1e-12 + f.angle.sum() * 1e-12)
    chain("FULL detect_and_describe", s_full, img)


if __name__ == "__main__":
    main()
