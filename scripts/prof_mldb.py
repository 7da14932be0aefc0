"""Describe-tail stage timings for the AKAZE backend at the reference CPU
preset (752x480, kp=5000): orientation pass vs MLDB sampling pass vs XLA glue.

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof_mldb.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, x, iters=200, reps=3):
    @jax.jit
    def loop(x):
        def body(i, x):
            out = fn(x)
            return x + out * 0.0
        return jax.lax.fori_loop(0, iters, body, x)

    loop(x).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        loop(x).block_until_ready()
        best = min(best, (time.perf_counter() - t) / iters)
    return best


def main():
    from coloc_tpu.config import DetectorOptions
    from coloc_tpu.io import synthetic
    from coloc_tpu import akaze
    from coloc_tpu.ops import diffusion, fast as fast_ops, mldb
    from coloc_tpu.ops import patches as patch_ops

    h, w, kp = 480, 752, 5000
    K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]],
                 np.float32)
    scene = synthetic.make_scene(h, w, K, seed=1)
    img = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32)))
    opts = DetectorOptions(width=w, height=h, max_keypoints=kp,
                           num_levels=8, backend="akaze")

    # full frame for reference
    def full(x):
        f = akaze.detect_and_describe_akaze(x, opts)
        return f.desc.astype(jnp.float32).sum() + f.xy.sum() + f.angle.sum()

    t_full = chain_time(full, img)
    print(f"FULL detect_and_describe_akaze      {t_full*1e3:7.3f} ms")

    # Reproduce the stage structure of detect_and_describe_akaze up to each
    # cut point, mirroring akaze.py (detection prefix / +orientation /
    # +describe) so subtraction isolates each block.
    import math
    num_octaves, num_sub = 4, 4

    def prefix(x, stage):
        levels = diffusion.build_scale_space(x, num_octaves, num_sub)
        thresh = 1e-4
        nms = [fast_ops.nms3(jnp.where(ev.response > thresh, ev.response, 0.0))
               for ev in levels]

        def _maxpool(a, rad):
            if rad <= 0:
                return a
            w_ = 2 * rad + 1
            a = jax.lax.reduce_window(a, 0.0, jax.lax.max, (w_, 1), (1, 1),
                                      "SAME")
            return jax.lax.reduce_window(a, 0.0, jax.lax.max, (1, w_), (1, 1),
                                         "SAME")

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
        sp_resp = patch_ops.stack_levels([ev.response for ev in levels])
        wp = sp_nms.wp
        rb = jnp.asarray(sp_nms.row_base)
        mask = akaze._akaze_mask(tuple(int(r) for r in sp_nms.row_base),
                                 tuple(int(hh) for hh in sp_nms.heights),
                                 tuple(int(ww) for ww in sp_nms.widths),
                                 wp, sp_nms.stacked.shape[0],
                                 akaze._DETECT_BORDER)
        flat = (sp_nms.stacked * jnp.asarray(mask)).reshape(-1)
        top_s, top_i = jax.lax.approx_max_k(flat, kp)
        valid = top_s > 0
        row = top_i // wp
        col = top_i % wp
        kp_l = jnp.sum(row[:, None] >= rb[None, 1:], axis=1).astype(jnp.int32)
        kp_x, sy = fast_ops.subpixel_refine(
            sp_resp.stacked, col.astype(jnp.float32), row.astype(jnp.float32))
        kp_y = sy - rb[kp_l].astype(jnp.float32)
        sig_table = jnp.asarray(
            [ev.sigma / (2.0 ** ev.octave) for ev in levels], jnp.float32)
        kp_sig = sig_table[kp_l]
        if stage == "detect":
            return top_s.sum() + kp_x.sum() + kp_y.sum() + kp_sig.sum()

        sp_l = patch_ops.stack_levels([ev.L for ev in levels])
        sp_lx = patch_ops.stack_levels([ev.Lx for ev in levels])
        sp_ly = patch_ops.stack_levels([ev.Ly for ev in levels])
        R_img = sp_l.stacked.shape[0]

        def shift64(xx):
            return jnp.pad(xx[:, 64:], ((0, 0), (0, 64)))

        src6 = jnp.concatenate([
            sp_l.stacked, sp_lx.stacked, sp_ly.stacked,
            shift64(sp_l.stacked), shift64(sp_lx.stacked),
            shift64(sp_ly.stacked),
        ], axis=0).astype(jnp.bfloat16)
        rb2 = jnp.asarray(sp_l.row_base)
        w_l = jnp.asarray(sp_l.widths)[kp_l].astype(jnp.float32)
        h_l = jnp.asarray(sp_l.heights)[kp_l].astype(jnp.float32)
        row0, _ = patch_ops.patch_origins(sp_l, kp_x, kp_y, kp_l)
        row0_local = row0 - rb2[kp_l]
        xi = jnp.round(kp_x).astype(jnp.int32)
        a2 = jnp.maximum(xi - 26, 0)
        m = a2 % 128
        shift = m > 75
        c0 = jnp.where(shift, ((a2 - 64) // 128) * 128, (a2 // 128) * 128)
        col0_eff = c0 + jnp.where(shift, 64, 0)
        row0_dma = row0 + jnp.where(shift, 3 * R_img, 0)

        yi_rel = jnp.round(kp_y).astype(jnp.int32) - row0_local
        ro = jnp.clip(((yi_rel - 17) // 8) * 8, 0, 16)
        row0_ori = row0_dma + R_img + ro

        def sampler2(lx, ly):
            return patch_ops.sample_raster_flat(
                src6, R_img, row0_ori, c0, lx, ly, C=2, ph=48, pw=128)

        if stage == "orient_sample":
            # sampler2 call alone (disc coords + fused DMA/MXU kernel), no
            # histogram post-processing
            disc = jnp.asarray(mldb._DISC)
            sx = kp_x[:, None] + kp_sig[:, None] * disc[None, :, 0]
            sy = kp_y[:, None] + kp_sig[:, None] * disc[None, :, 1]
            sx = jnp.clip(sx, 0.0, (w_l - 1.0)[:, None])
            sy = jnp.clip(sy, 0.0, (h_l - 1.0)[:, None])
            lx = sx - col0_eff.astype(jnp.float32)[:, None]
            ly = sy - (row0_local + ro).astype(jnp.float32)[:, None]
            g = sampler2(lx, ly)
            return g.sum() + kp_x.sum()

        kp_angle = mldb.orientation(
            sampler2, kp_x, kp_y, kp_sig, w_l, h_l, col0_eff, row0_local + ro)
        if stage == "orient":
            return kp_angle.sum() + kp_x.sum()

        def sampler3(lx, ly):
            return patch_ops.sample_raster_flat(
                src6, R_img, row0_dma, c0, lx, ly, C=3, pw=128)

        if stage == "desc_sample":
            # sampler3 call alone (rotated grid coords + kernel), no steering
            # / cell means / bit packing; fixed angle stands in for the
            # orientation result
            coords = jnp.asarray(mldb._grid_cells()[0])
            ang = jnp.zeros_like(kp_x) + 0.3
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            half = mldb._PATCH_HALF * kp_sig
            u = coords[None, :, 0] * half[:, None]
            v = coords[None, :, 1] * half[:, None]
            rx = ca[:, None] * u - sa[:, None] * v
            ry = sa[:, None] * u + ca[:, None] * v
            sx = jnp.clip(kp_x[:, None] + rx, 0.0, (w_l - 1.0)[:, None])
            sy = jnp.clip(kp_y[:, None] + ry, 0.0, (h_l - 1.0)[:, None])
            lx = sx - col0_eff.astype(jnp.float32)[:, None]
            ly = sy - row0_local.astype(jnp.float32)[:, None]
            g = sampler3(lx, ly)
            return g.sum() + kp_x.sum()

        desc = mldb.describe_mldb(
            sampler3, kp_x, kp_y, kp_sig, kp_angle,
            w_l, h_l, col0_eff, row0_local)
        return desc.astype(jnp.float32).sum() + kp_angle.sum()

    t_det = chain_time(lambda x: prefix(x, "detect"), img)
    print(f"  detection prefix                  {t_det*1e3:7.3f} ms")
    t_os = chain_time(lambda x: prefix(x, "orient_sample"), img)
    print(f"  + ori sampler only                {t_os*1e3:7.3f} ms "
          f"(sampler2 = {(t_os-t_det)*1e3:.3f})")
    t_ori = chain_time(lambda x: prefix(x, "orient"), img)
    print(f"  + orientation pass                {t_ori*1e3:7.3f} ms "
          f"(orientation = {(t_ori-t_det)*1e3:.3f}, "
          f"post = {(t_ori-t_os)*1e3:.3f})")
    # NB: desc_sample SKIPS orientation (fixed angle), so sampler3 cost is
    # relative to the detection prefix, and describe post-processing is
    # (describe total) - (sampler3 alone)
    t_ds = chain_time(lambda x: prefix(x, "desc_sample"), img)
    print(f"  + desc sampler only (fixed angle) {t_ds*1e3:7.3f} ms "
          f"(sampler3 = {(t_ds-t_det)*1e3:.3f})")
    t_desc = chain_time(lambda x: prefix(x, "describe"), img)
    print(f"  + describe pass                   {t_desc*1e3:7.3f} ms "
          f"(describe = {(t_desc-t_ori)*1e3:.3f}, "
          f"post = {((t_desc-t_ori)-(t_ds-t_det))*1e3:.3f})")


if __name__ == "__main__":
    main()
