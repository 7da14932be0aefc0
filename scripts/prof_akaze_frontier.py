"""AKAZE accuracy-vs-work frontier (VERDICT r4 item 2).

The round-4 floor note defended the 5.1 ms detect point only for the
NORMAL-preset formulation (4 octaves x 4 sublevels, 4x4 MLDB cell samples,
FED at the stability-bound tau_max). This script sweeps the real work
levers (DetectorOptions.akaze_{sublevels,cell_samples,fed_tau_max} +
octaves via num_levels) and measures, per point, on the real chip:

  - detect+describe latency at the reference preset shape
    (752x480, maxkp=5000; CPUDetector.hpp:35-46 / coloc_node.cpp:78)
  - downstream parity on a rendered two-view pair with known motion:
    keypoint yield, Lowe-0.8 pair matches, epipolar-consistent match
    fraction at 3 px (vs ground truth), relative-pose rotation /
    translation-direction error, and full map-localization success +
    inlier count + center error.

Parity gates (from tests/test_akaze.py's downstream-equivalence bars):
matches >= 50, epipolar-consistent fraction > 0.8, relative-pose rotation
error < 0.5 deg, localization success with center error < 1% — a frontier
point "passes" iff all hold.

Usage:  python scripts/prof_akaze_frontier.py          # full sweep
        COLOC_FRONTIER_ITERS=40 python scripts/...     # quicker timing
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
    from coloc_tpu.frontend import detect_and_describe
    from coloc_tpu.geometry import camera as cam_ops
    from coloc_tpu.geometry import so3
    from coloc_tpu.io import synthetic
    from coloc_tpu.matching import match_pair, match_with_map, pack_map_bank
    from coloc_tpu.robust import relative_pose_essential
    from coloc_tpu.sfm import localize

    h, w = 480, 752
    kp = int(os.environ.get("COLOC_FRONTIER_KP", "5000"))
    iters = int(os.environ.get("COLOC_FRONTIER_ITERS", "60"))
    K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]],
                 np.float32)
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
    scene = synthetic.make_scene(h, w, K, seed=1)
    img1 = jnp.asarray(synthetic.render(scene, np.eye(3, dtype=np.float32),
                                        np.zeros(3, np.float32)))
    R2 = np.asarray(so3.exp(jnp.asarray([0.01, -0.05, 0.0], jnp.float32)))
    C2 = np.array([0.4, 0.05, 0.0], np.float32)
    img2 = jnp.asarray(synthetic.render(scene, R2, C2))

    # sweep points: (label, num_levels [octaves = //2], sublevels,
    # cell_samples, tau_max)
    points = [
        ("o4.s4.cs4.t25 (NORMAL)", 8, 4, 4, 0.25),
        ("o4.s3.cs4.t25",          8, 3, 4, 0.25),
        ("o3.s4.cs4.t25",          6, 4, 4, 0.25),
        ("o3.s3.cs4.t25",          6, 3, 4, 0.25),
        ("o4.s4.cs3.t25",          8, 4, 3, 0.25),
        ("o4.s4.cs2.t25",          8, 4, 2, 0.25),
        ("o4.s4.cs4.t35",          8, 4, 4, 0.35),
        ("o4.s4.cs4.t50",          8, 4, 4, 0.50),
        ("o3.s3.cs3.t25",          6, 3, 3, 0.25),
        ("o3.s3.cs3.t35",          6, 3, 3, 0.35),
        ("o3.s3.cs2.t50",          6, 3, 2, 0.50),
    ]

    t_gt = R2 @ (np.zeros(3) - C2)

    print(f"# akaze frontier sweep: {w}x{h} kp={kp} iters={iters} "
          f"backend={jax.default_backend()}")
    print("# label | detect ms | fps | kp | matches | epi-ok | "
          "rot err deg | dir err deg | loc ok | inliers | c err % | PASS")

    for label, num_levels, sub, cs, tau in points:
        opts = DetectorOptions(
            width=w, height=h, max_keypoints=kp, num_levels=num_levels,
            backend="akaze", akaze_sublevels=sub, akaze_cell_samples=cs,
            akaze_fed_tau_max=tau,
        )
        config = ColocConfig(detector=opts,
                             matcher=MatcherOptions(mode="ratio"),
                             max_landmarks=8192)

        # --- latency: chained detect+describe (verify-skill benching rules)
        @jax.jit
        def loop(x, opts=opts):
            def body(i, c):
                f = detect_and_describe(c, opts)
                live = (f.score.sum() + f.xy.sum()
                        + f.desc.astype(jnp.float32).sum())
                return img1 + live * 1e-12
            return jax.lax.fori_loop(0, iters, body, x)

        jax.block_until_ready(loop(img1))
        t0 = time.time()
        jax.block_until_ready(loop(img1))
        dt = (time.time() - t0) / iters

        # --- downstream parity
        fa = detect_and_describe(img1, opts)
        fb = detect_and_describe(img2, opts)
        n_kp = int(jnp.sum(fa.valid))
        m = match_pair(fa, fb, config.matcher)
        mask = np.asarray(m.mask)
        n_match = int(mask.sum())

        # epipolar consistency of accepted matches vs ground truth
        E_gt = _essential(R2, C2)
        uv1 = np.asarray(fa.xy)[mask]
        uv2 = np.asarray(fb.xy)[np.asarray(m.idx)[mask]]
        Kinv = np.linalg.inv(np.asarray(K, np.float64))
        x1 = (Kinv @ np.c_[uv1, np.ones(len(uv1))].T).T[:, :2]
        x2 = (Kinv @ np.c_[uv2, np.ones(len(uv2))].T).T[:, :2]
        epi_ok = _sym_epi_ok(E_gt, x1, x2, 3.0, float(K[0, 0]))
        frac = float(epi_ok.mean()) if len(epi_ok) else 0.0

        geo = relative_pose_essential(
            jax.random.PRNGKey(0), fa.xy, fb.xy[m.idx], m.mask, cam, cam,
            config.ransac)
        rot_err = _rot_deg(np.asarray(geo.R), R2)
        dir_err = _dir_deg(np.asarray(geo.t), t_gt)

        # localization against a geometrically consistent map
        rng = np.random.default_rng(2)
        mapdb = synthetic.consistent_mapdb(fa, K, config.max_landmarks, rng)
        bank = pack_map_bank(mapdb)
        mm = match_with_map(fa, mapdb, config.matcher, bank=bank)
        pwc, _ = localize.localize_image(
            jax.random.PRNGKey(1), fa, mm, mapdb, cam, config.ransac,
            config.refiner)
        loc_ok = bool(pwc.success)
        inl = int(pwc.n_tracks)
        # consistent_mapdb landmarks sit on img1's bearings => GT pose is
        # the identity at the origin; error is absolute center offset as a
        # fraction of the scene depth scale (~8)
        c_err_pct = float(np.linalg.norm(np.asarray(pwc.pose.C)) / 8.0 * 100)

        ok = (bool(geo.success) and n_match >= 50 and frac > 0.8
              and rot_err < 0.5 and loc_ok and c_err_pct < 1.0)
        print(f"{label:22s} | {dt*1e3:6.2f} | {1/dt:6.1f} | {n_kp:5d} | "
              f"{n_match:5d} | {frac:5.3f} | {rot_err:6.3f} | "
              f"{dir_err:6.3f} | {loc_ok!s:5s} | {inl:5d} | "
              f"{c_err_pct:5.3f} | {'PASS' if ok else 'FAIL'}")


def _essential(R2, C2):
    t = np.asarray(R2, np.float64) @ (-np.asarray(C2, np.float64))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ np.asarray(R2, np.float64)


def _sym_epi_ok(E, x1, x2, thr_px, f):
    h1 = np.c_[x1, np.ones(len(x1))]
    h2 = np.c_[x2, np.ones(len(x2))]
    l2 = h1 @ E.T
    l1 = h2 @ E
    num = np.sum(h2 * l2, axis=1) ** 2
    d2 = num / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-300)
    d1 = num / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-300)
    return (f * f) * (d1 + d2) < thr_px ** 2


def _rot_deg(Ra, Rb):
    c = (np.trace(np.asarray(Ra, np.float64).T @ np.asarray(Rb, np.float64))
         - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def _dir_deg(a, b):
    a = np.asarray(a, np.float64); a /= np.linalg.norm(a)
    b = np.asarray(b, np.float64); b /= np.linalg.norm(b)
    return float(np.degrees(np.arccos(np.clip(abs(a @ b), -1, 1))))


if __name__ == "__main__":
    main()
