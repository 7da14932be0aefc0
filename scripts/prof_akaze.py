"""Stage timings for the AKAZE-MLDB backend at the reference CPU preset
(752x480, kp=5000).

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_akaze.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, x, iters=30, feedback=None):
    """Feedback-chained timing (see bench.py): each iteration's input
    depends on the previous output so the tunnel cannot pipeline/dedup."""
    feedback = feedback or (lambda out, x: x + out.reshape(-1)[0] * 0.0)

    @jax.jit
    def loop(x):
        def body(i, x):
            out = fn(x)
            return feedback(out, x)
        return jax.lax.fori_loop(0, iters, body, x)

    loop(x).block_until_ready()  # compile
    t = time.perf_counter()
    loop(x).block_until_ready()
    return (time.perf_counter() - t) / iters


def main():
    from coloc_tpu.config import DetectorOptions
    from coloc_tpu.io import synthetic
    from coloc_tpu.ops import diffusion, fast as fast_ops, mldb
    from coloc_tpu.ops import pyramid as pyr_ops
    from coloc_tpu import akaze

    h, w, kp = 480, 752, 5000
    K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]],
                 np.float32)
    scene = synthetic.make_scene(h, w, K, seed=1)
    img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)))
    opts = DetectorOptions(width=w, height=h, max_keypoints=kp,
                           num_levels=8, backend="akaze")

    # 1) scale space
    def ss(x):
        levels = diffusion.build_scale_space(x, 4, 4)
        return levels[-1].response

    t1 = chain_time(ss, img)
    print(f"build_scale_space (4x4 levels)                 {t1*1e3:7.2f} ms")

    # 1b) diffusion only (no Hessian responses)
    def diff_only(x):
        im = x.astype(jnp.float32) / 255.0
        k = diffusion.contrast_factor(im)
        k2 = k * k
        L = im
        t_prev = 0.5 * 0.25
        import math
        for o in range(4):
            for s in range(4):
                sigma = 1.6 * (2.0 ** (o + s / 4))
                t = 0.5 * sigma * sigma
                dt = max((t - t_prev) / (4.0 ** o), 1e-4)
                gx, gy = diffusion._scharr(L)
                g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
                for tau in diffusion.fed_tau_cycle(dt):
                    L = diffusion._diffusion_step(L, g, tau)
                t_prev = t
            if o + 1 < 4:
                L = L[::2, ::2]
        return L

    t1b = chain_time(diff_only, img)
    print(f"  diffusion only (FED cycles)                  {t1b*1e3:7.2f} ms")

    # count FED steps for the record
    import math
    steps, t_prev = 0, 0.5 * 0.25
    for o in range(4):
        for s in range(4):
            sigma = 1.6 * (2.0 ** (o + s / 4))
            t = 0.5 * sigma * sigma
            dt = max((t - t_prev) / (4.0 ** o), 1e-4)
            steps += len(diffusion.fed_tau_cycle(dt))
            t_prev = t
    print(f"  (total FED steps: {steps})")

    # 2) detection stages (scale space + per-level NMS/topk, no dedup)
    from coloc_tpu.ops import fast as fast_ops_

    def detect_only(x):
        levels = diffusion.build_scale_space(x, 4, 4)
        acc = jnp.float32(0.0)
        for ev in levels:
            resp = jnp.where(ev.response > 1e-4, ev.response, 0.0)
            nms = fast_ops_.nms3(resp)
            kx, ky, s, v = fast_ops_.topk_keypoints(nms, kp, 10)
            kx, ky = fast_ops_.subpixel_refine(ev.response, kx, ky)
            acc = acc + s.sum() + kx.sum() + ky.sum()
        return acc

    t2a = chain_time(detect_only, img, feedback=lambda out, x: x + out * 0.0)
    print(f"  scale space + per-level NMS/topk/subpix      {t2a*1e3:7.2f} ms")

    # 2b) detection + raster cross-scale suppression + stacked top-k
    # (mirrors the stage structure of detect_and_describe_akaze up to
    # keypoint selection; see akaze.py)
    from coloc_tpu.ops import patches as patch_ops

    def detect_through(x):
        levels = diffusion.build_scale_space(x, 4, 4)
        nms = [
            fast_ops_.nms3(jnp.where(ev.response > 1e-4, ev.response, 0.0))
            for ev in levels
        ]
        import math
        def _maxpool(a, rad):
            if rad <= 0:
                return a
            w_ = 2 * rad + 1
            a = jax.lax.reduce_window(a, 0.0, jax.lax.max, (w_, 1), (1, 1), "SAME")
            return jax.lax.reduce_window(a, 0.0, jax.lax.max, (1, w_), (1, 1), "SAME")
        for li in range(len(levels) - 1):
            a, b = nms[li], nms[li + 1]
            oa, ob = levels[li].octave, levels[li + 1].octave
            r_base = max(levels[li].sigma, levels[li + 1].sigma)
            ra_px = math.ceil(r_base / (2.0 ** oa)) + (1 if ob > oa else 0)
            ha, wa = a.shape
            b_at_a = (jnp.repeat(jnp.repeat(b, 2, 0), 2, 1)[:ha, :wa]
                      if ob > oa else b)
            sup_a = _maxpool(b_at_a, ra_px) > a
            dil_a = _maxpool(a, ra_px)
            if ob > oa:
                hb, wb = b.shape
                dil_a = jax.lax.reduce_window(
                    jnp.pad(dil_a, ((0, 2 * hb - ha), (0, 2 * wb - wa))),
                    0.0, jax.lax.max, (2, 2), (2, 2), "VALID")
            nms[li] = jnp.where(sup_a, 0.0, a)
            nms[li + 1] = jnp.where(dil_a >= b, 0.0, b)
        sp_nms = patch_ops.stack_levels(nms)
        flat = sp_nms.stacked.reshape(-1)
        top_s, top_i = jax.lax.approx_max_k(flat, kp)
        return top_s.sum() + (top_i % 7).sum()

    t2b = chain_time(detect_through, img, feedback=lambda out, x: x + out * 0.0)
    print(f"  + raster suppression + stacked approx topk   {t2b*1e3:7.2f} ms")

    # 3) full akaze detect+describe
    def full(x):
        f = akaze.detect_and_describe_akaze(x, opts)
        return f.desc.astype(jnp.float32).sum() + f.xy.sum()

    t2 = chain_time(full, img, feedback=lambda out, x: x + out * 0.0)
    print(f"FULL detect_and_describe_akaze                 {t2*1e3:7.2f} ms")
    print(f"  (describe tail = FULL - detection prefix:    "
          f"{(t2 - t2b)*1e3:7.2f} ms)")


if __name__ == "__main__":
    main()
