"""Bench: relative-pose (config 2) sub-stages — 5pt solve, NFA scoring,
decompose, manifold refinement."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import essential as ess
from coloc_tpu.geometry import fivept
from coloc_tpu.ransac import ransac
from coloc_tpu.robust import relative_pose_essential, _mean_focal

M = 1024
ITERS = 300


def chain(name, fn, x0):
    @jax.jit
    def loop(x):
        def body(i, c):
            return fn(jax.random.fold_in(jax.random.PRNGKey(0), i), c)
        return jax.lax.fori_loop(0, ITERS, body, x0)
    jax.block_until_ready(loop(x0))
    t0 = time.time()
    jax.block_until_ready(loop(x0))
    print(f"{name:48s} {(time.time() - t0) / ITERS * 1e3:8.3f} ms")


def main():
    config = ColocConfig()
    rng = np.random.default_rng(0)
    # synthetic correspondences: random 3D points seen by two cameras
    X = rng.uniform(-2, 2, (M, 3)) + np.array([0, 0, 6.0])
    R_gt = np.eye(3)
    C_gt = np.array([0.3, 0.05, 0.0])
    x1 = X[:, :2] / X[:, 2:3]
    Xc = (X - C_gt) @ R_gt.T
    x2 = Xc[:, :2] / Xc[:, 2:3] + rng.normal(0, 0.001, (M, 2))
    K = np.array([[450.0, 0, 376], [0, 450.0, 240], [0, 0, 1]], np.float32)
    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
    uv1 = jnp.asarray(x1 * 450 + np.array([376, 240]), jnp.float32)
    uv2 = jnp.asarray(x2 * 450 + np.array([376, 240]), jnp.float32)
    mask = jnp.ones((M,), bool)
    a1 = jnp.asarray(x1, jnp.float32)
    a2 = jnp.asarray(x2, jnp.float32)
    opts = config.ransac

    f_sq = _mean_focal(cam) ** 2
    thr_sq = opts.essential_threshold ** 2

    def s_full(k, c):
        geo = relative_pose_essential(k, uv1 + c * 1e-12, uv2, mask, cam,
                                      cam, opts)
        return c + geo.R[0, 0] * 1e-12
    chain("FULL relative_pose_essential", s_full, jnp.float32(0))

    # 5pt solver alone over the hypothesis batch
    def s_solve(k, c):
        idx = jax.random.randint(k, (opts.num_hypotheses, 5), 0, M)
        s1 = a1[idx] + c * 1e-12
        s2 = a2[idx]
        Es, val = jax.vmap(fivept.five_point)(s1, s2)
        return c + Es[0, 0, 0, 0] * 1e-12 + val.astype(jnp.float32).sum() * 1e-12
    chain("5pt solver (vmapped over hypotheses)", s_solve, jnp.float32(0))

    def batch_scorer(Es, b1, b2):
        return ess.symmetric_epipolar_distance_sq_batch(Es, b1, b2, f_sq, f_sq)

    def s_ransac(k, c):
        def solver(s1, s2):
            return fivept.five_point(s1, s2)

        def scorer(E, b1, b2):
            return ess.symmetric_epipolar_distance_sq(E, b1, b2, f_sq, f_sq)

        A_px = (2.0 * cam.cx) * (2.0 * cam.cy)
        D_px = jnp.sqrt((2.0 * cam.cx) ** 2 + (2.0 * cam.cy) ** 2)
        def rank_scorer(Es, b1, b2):
            return ess.symmetric_epipolar_distance_sq_batch(
                Es, b1, b2, f_sq, f_sq, precision=jax.lax.Precision.DEFAULT
            )

        res = ransac(
            k, (a1 + c * 1e-12, a2), mask, solver, scorer,
            sample_size=5, num_hypotheses=opts.num_hypotheses,
            threshold_sq=thr_sq, inlier_multiple=opts.inlier_multiple,
            scoring=opts.scoring, log_alpha0=jnp.log10(2.0 * D_px / A_px),
            error_dim=1.0, batch_scorer=batch_scorer, rank_scorer=rank_scorer,
        )
        return c + res.model[0, 0] * 1e-12
    chain("ransac (solve+NFA score+select)", s_ransac, jnp.float32(0))

    inl = mask
    def s_decompose(k, c):
        E = jnp.eye(3) * 0.5 + c * 1e-12
        R, t = ess.decompose_essential(E, a1, a2, inl)
        return c + R[0, 0] * 1e-12
    chain("decompose_essential", s_decompose, jnp.float32(0))

    def s_refine(k, c):
        R0 = jnp.eye(3)
        t0v = jnp.array([1.0, 0, 0]) + c * 1e-12
        R, t = ess.refine_relative_pose(R0, t0v, a1, a2, inl.astype(jnp.float32))
        return c + R[0, 0] * 1e-12 + t[0] * 1e-12
    chain("refine_relative_pose (GN manifold)", s_refine, jnp.float32(0))


if __name__ == "__main__":
    main()
