"""Fusion tests: Kalman bank with chi-square gating, ICI fusion
(SURVEY.md §4: 'covariance-intersection omega optimum vs closed-form scan')."""

import jax.numpy as jnp
import numpy as np
import pytest

from coloc_tpu.config import FilterOptions
from coloc_tpu.fusion import covint, kalman
from coloc_tpu.geometry import so3
from coloc_tpu.types import Pose

OPTS = FilterOptions()


class TestKalman:
    def test_converges_to_constant_measurement(self):
        bank = kalman.init(2, OPTS)
        pose = Pose(R=so3.euler_to_rot(jnp.asarray([0.1, 0.2, 0.3])),
                    C=jnp.asarray([1.0, 2.0, 3.0]))
        z = kalman.fill_measurement(pose)
        for _ in range(20):
            bank, filtered, dist, rej = kalman.update(
                bank, jnp.int32(0), z, jnp.eye(3) * 0.01, jnp.float32(1.0),
                jnp.asarray(True), OPTS,
            )
        np.testing.assert_allclose(np.asarray(filtered.C), [1, 2, 3], atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(so3.rot_to_euler(filtered.R)), [0.1, 0.2, 0.3], atol=1e-2
        )
        # only drone 0 was touched
        np.testing.assert_array_equal(np.asarray(bank.x[1]), np.zeros(6))

    def test_gate_rejects_jump(self):
        """A wild measurement after convergence is gated; filter coasts."""
        bank = kalman.init(1, OPTS)
        z_good = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
        for _ in range(15):
            bank, filtered, dist, rej = kalman.update(
                bank, jnp.int32(0), z_good, jnp.eye(3) * 0.01,
                jnp.float32(1.0), jnp.asarray(True), OPTS,
            )
        x_before = np.asarray(bank.x[0]).copy()
        z_bad = jnp.asarray([50.0, -40.0, 30.0, 2.0, -2.0, 2.0])
        bank, filtered, dist, rej = kalman.update(
            bank, jnp.int32(0), z_bad, jnp.eye(3) * 0.01,
            jnp.float32(1.0), jnp.asarray(True), OPTS,
        )
        assert bool(rej)
        np.testing.assert_allclose(np.asarray(bank.x[0]), x_before, atol=1e-6)

    def test_no_measurement_coasts(self):
        bank = kalman.init(1, OPTS)
        z = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
        bank, f1, _, _ = kalman.update(
            bank, jnp.int32(0), z, jnp.eye(3) * 0.01, jnp.float32(1.0),
            jnp.asarray(True), OPTS,
        )
        x_before = np.asarray(bank.x[0]).copy()
        bank, f2, _, _ = kalman.update(
            bank, jnp.int32(0), z * 100, jnp.eye(3) * 0.01, jnp.float32(1.0),
            jnp.asarray(False), OPTS,  # no measurement available
        )
        np.testing.assert_allclose(np.asarray(bank.x[0]), x_before, atol=1e-6)


class TestCovInt:
    def test_omega_matches_grid_scan(self, rng):
        """Golden-section optimum vs brute-force scan of the ICI trace."""
        for _ in range(5):
            A = rng.normal(size=(3, 3)); CA = A @ A.T + 0.5 * np.eye(3)
            B = rng.normal(size=(3, 3)); CB = B @ B.T + 0.5 * np.eye(3)
            a = rng.normal(size=3); b = rng.normal(size=3)
            res = covint.fuse(
                jnp.asarray(CA, jnp.float32), jnp.asarray(CB, jnp.float32),
                jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
            )
            ws = np.linspace(0, 1, 2001)
            CAi, CBi = np.linalg.inv(CA), np.linalg.inv(CB)
            def trace_at(w):
                M = np.linalg.inv(w * CA + (1 - w) * CB)
                return np.trace(np.linalg.inv(CAi + CBi - M))
            traces = np.array([trace_at(w) for w in ws])
            w_best = ws[np.argmin(traces)]
            # reference eps is 1e-3; golden section gets much tighter, but the
            # objective can be extremely flat — compare trace values
            assert float(res.trace) <= traces.min() + 1e-3 * abs(traces.min())

    def test_identical_inputs(self, rng):
        """CA == CB: fused covariance must not be more confident than the
        inputs (the ICI consistency property), position = a (= b)."""
        A = rng.normal(size=(3, 3)); CA = (A @ A.T + 0.5 * np.eye(3)).astype(np.float32)
        a = rng.normal(size=3).astype(np.float32)
        res = covint.fuse(jnp.asarray(CA), jnp.asarray(CA), jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(res.pos), a, atol=1e-4)
        evals = np.linalg.eigvalsh(np.asarray(res.cov) - CA + 1e-5 * np.eye(3))
        assert (evals > -1e-3).all()

    def test_fused_between_estimates(self, rng):
        """With one tight and one loose estimate, fusion leans to the tight one."""
        CA = np.eye(3, dtype=np.float32) * 0.01
        CB = np.eye(3, dtype=np.float32) * 10.0
        a = np.array([1.0, 0, 0], np.float32)
        b = np.array([5.0, 0, 0], np.float32)
        res = covint.fuse(jnp.asarray(CA), jnp.asarray(CB), jnp.asarray(a), jnp.asarray(b))
        assert abs(float(res.pos[0]) - 1.0) < 0.1
