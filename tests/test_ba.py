"""Bundle adjustment tests (SURVEY.md §4: 'GN refinement convergence';
Refiner.hpp parity: full BA / pose-only, covariance extraction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coloc_tpu.config import RefinerOptions
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import so3
from coloc_tpu.sfm.ba import BAProblem, refine

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
OPTS = RefinerOptions(max_iterations=25)


def make_problem(rng, V=3, L=120, pose_noise=0.05, point_noise=0.2,
                 pix_noise=0.0, drop=0.1):
    """Ground-truth scene + perturbed initialization."""
    Rs_gt = np.stack([
        np.asarray(so3.exp(jnp.asarray([0.02 * v, -0.3 * v, 0.01 * v], jnp.float32)))
        for v in range(V)
    ])
    Cs_gt = np.stack([np.array([1.0 * v, 0.1 * v, 0.0], np.float32) for v in range(V)])
    X_gt = np.c_[rng.uniform(-3, 3, (L, 2)), rng.uniform(6, 14, (L, 1))].astype(np.float32)

    cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
    obs = np.zeros((V, L, 2), np.float32)
    mask = np.ones((V, L), bool)
    for v in range(V):
        uv = np.asarray(cam_ops.project(cam, jnp.asarray(Rs_gt[v]), jnp.asarray(Cs_gt[v]), jnp.asarray(X_gt)))
        obs[v] = uv + rng.normal(0, pix_noise, uv.shape)
        mask[v] &= rng.random(L) > drop

    # perturb everything except view 0 (the gauge anchor)
    Rs0 = Rs_gt.copy()
    Cs0 = Cs_gt.copy()
    for v in range(1, V):
        Rs0[v] = np.asarray(so3.exp(jnp.asarray(rng.normal(0, pose_noise, 3), jnp.float32))) @ Rs0[v]
        Cs0[v] = Cs0[v] + rng.normal(0, pose_noise, 3)
    X0 = X_gt + rng.normal(0, point_noise, X_gt.shape).astype(np.float32)

    problem = BAProblem(
        Rs=jnp.asarray(Rs0), Cs=jnp.asarray(Cs0), X=jnp.asarray(X0),
        obs=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        Ks=jnp.broadcast_to(jnp.asarray(K), (V, 3, 3)),
        dists=jnp.zeros((V, 3), jnp.float32),
    )
    return problem, Rs_gt, Cs_gt, X_gt


def rot_err_deg(Ra, Rb):
    cos = (np.trace(np.asarray(Ra).T @ np.asarray(Rb)) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


class TestFullBA:
    def test_converges_to_ground_truth(self, rng):
        problem, Rs_gt, Cs_gt, X_gt = make_problem(rng)
        fix = jnp.asarray([True, False, False])
        res = refine(problem, OPTS, fix, optimize_structure=True, cov_view=1)
        assert float(res.rmse) < 0.01
        # monocular gauge: fixing one pose pins 6 of 7 DoF — compare up to
        # the global scale (estimated from view 1's center norm)
        s = np.linalg.norm(Cs_gt[1]) / (np.linalg.norm(np.asarray(res.Cs[1])) + 1e-12)
        for v in range(1, 3):
            assert rot_err_deg(res.Rs[v], Rs_gt[v]) < 0.05
            assert np.linalg.norm(np.asarray(res.Cs[v]) * s - Cs_gt[v]) < 0.01
        xerr = np.linalg.norm(np.asarray(res.X) * s - X_gt, axis=1)
        assert np.median(xerr) < 0.02

    def test_fixed_pose_untouched(self, rng):
        problem, *_ = make_problem(rng)
        fix = jnp.asarray([True, False, False])
        res = refine(problem, OPTS, fix, optimize_structure=True)
        np.testing.assert_array_equal(np.asarray(res.Rs[0]), np.asarray(problem.Rs[0]))
        np.testing.assert_array_equal(np.asarray(res.Cs[0]), np.asarray(problem.Cs[0]))

    def test_noisy_observations_rmse(self, rng):
        problem, *_ = make_problem(rng, pix_noise=0.5)
        fix = jnp.asarray([True, False, False])
        res = refine(problem, OPTS, fix, optimize_structure=True)
        # RMSE should approach the injected noise level, not zero
        assert 0.2 < float(res.rmse) < 1.0


class TestPoseOnly:
    def test_localizer_pattern(self, rng):
        """Structure fixed, single free pose (Localizer.hpp:132-133)."""
        problem, Rs_gt, Cs_gt, X_gt = make_problem(
            rng, V=2, pose_noise=0.08, point_noise=0.0
        )
        fix = jnp.asarray([True, False])
        res = refine(problem, OPTS, fix, optimize_structure=False, cov_view=1)
        assert rot_err_deg(res.Rs[1], Rs_gt[1]) < 0.05
        assert np.linalg.norm(np.asarray(res.Cs[1]) - Cs_gt[1]) < 0.01
        np.testing.assert_array_equal(np.asarray(res.X), np.asarray(problem.X))


class TestCovariance:
    def test_spd_and_scales_with_noise(self, rng):
        covs = []
        for noise in (0.2, 1.0):
            problem, *_ = make_problem(rng, pix_noise=noise, pose_noise=0.02)
            fix = jnp.asarray([True, False, False])
            res = refine(problem, OPTS, fix, optimize_structure=True, cov_view=1)
            cov = np.asarray(res.cov)
            np.testing.assert_allclose(cov, cov.T, atol=1e-6)
            evals = np.linalg.eigvalsh(cov)
            assert (evals > 0).all(), f"covariance not SPD: {evals}"
            covs.append(np.trace(cov))
        # Hessian is noise-independent here, so cov doesn't scale by itself —
        # but it must be finite and small for a well-constrained pose
        # (~110 obs at unit pixel weight, depth ~10, f=400 -> trace ~1e-3)
        assert covs[0] < 0.05

    def test_huber_downweights_outliers(self, rng):
        problem, Rs_gt, Cs_gt, X_gt = make_problem(rng, pix_noise=0.2)
        # corrupt 10% of observations of view 1 by 50 px
        obs = np.asarray(problem.obs).copy()
        bad = rng.random(obs.shape[1]) < 0.1
        obs[1, bad] += 50.0
        problem = problem._replace(obs=jnp.asarray(obs))
        fix = jnp.asarray([True, False, False])
        res = refine(problem, OPTS, fix, optimize_structure=True)
        assert rot_err_deg(res.Rs[1], Rs_gt[1]) < 0.6
        # outlier pressure escapes into the free scale gauge — compare
        # up-to-scale (scale is pinned at session level, like the reference's
        # rescaleMap)
        s = np.linalg.norm(Cs_gt[1]) / (np.linalg.norm(np.asarray(res.Cs[1])) + 1e-12)
        assert np.linalg.norm(np.asarray(res.Cs[1]) * s - Cs_gt[1]) < 0.08
