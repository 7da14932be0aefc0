"""Unit tests for SO3/SE3/camera/triangulation (SURVEY.md §4 kernel tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coloc_tpu.geometry import camera, se3, so3, triangulation
from coloc_tpu.types import Pose


def random_rotation(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    return np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        for _ in range(20):
            w = rng.normal(size=3).astype(np.float32)
            w = w / np.linalg.norm(w) * rng.uniform(0, 3.0)
            R = so3.exp(jnp.asarray(w))
            w2 = so3.log(R)
            R2 = so3.exp(w2)
            np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.normal(size=3), jnp.float32)
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        assert np.linalg.det(np.asarray(R)) == pytest.approx(1.0, abs=1e-5)

    def test_euler_roundtrip(self, rng):
        for _ in range(20):
            R = random_rotation(rng, 0.8)
            e = so3.rot_to_euler(jnp.asarray(R))
            R2 = so3.euler_to_rot(e)
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_euler_convention_identity(self):
        e = so3.rot_to_euler(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(e), np.zeros(3), atol=1e-7)

    def test_exp_zero(self):
        np.testing.assert_allclose(
            np.asarray(so3.exp(jnp.zeros(3))), np.eye(3), atol=1e-6
        )


class TestSE3:
    def test_inverse(self, rng):
        p = Pose(
            R=jnp.asarray(random_rotation(rng)), C=jnp.asarray(rng.normal(size=3), jnp.float32)
        )
        X = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        Xc = se3.transform(p, X)
        Xback = se3.transform(se3.inverse(p), Xc)
        np.testing.assert_allclose(np.asarray(Xback), np.asarray(X), atol=1e-4)

    def test_compose(self, rng):
        p1 = Pose(R=jnp.asarray(random_rotation(rng)), C=jnp.asarray(rng.normal(size=3), jnp.float32))
        p2 = Pose(R=jnp.asarray(random_rotation(rng)), C=jnp.asarray(rng.normal(size=3), jnp.float32))
        X = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        direct = se3.transform(p2, se3.transform(p1, X))
        composed = se3.transform(se3.compose(p2, p1), X)
        np.testing.assert_allclose(np.asarray(direct), np.asarray(composed), atol=1e-4)

    def test_relative_then_absolute(self, rng):
        pi = Pose(R=jnp.asarray(random_rotation(rng)), C=jnp.asarray(rng.normal(size=3), jnp.float32))
        pj = Pose(R=jnp.asarray(random_rotation(rng)), C=jnp.asarray(rng.normal(size=3), jnp.float32))
        rel = se3.relative(pi, pj)
        pj2 = se3.relative_to_absolute(rel, pi, scale=1.0)
        np.testing.assert_allclose(np.asarray(pj2.R), np.asarray(pj.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pj2.C), np.asarray(pj.C), atol=1e-4)

    def test_t_center_duality(self, rng):
        R = jnp.asarray(random_rotation(rng))
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        p = se3.from_Rt(R, t)
        np.testing.assert_allclose(np.asarray(p.t), np.asarray(t), atol=1e-5)


class TestCamera:
    def make_cam(self, k=(0.01, -0.003, 0.001)):
        K = jnp.asarray(
            [[458.0, 0.0, 376.0], [0.0, 457.0, 240.0], [0.0, 0.0, 1.0]], jnp.float32
        )
        return camera.Camera(K=K, dist=jnp.asarray(k, jnp.float32))

    def test_undistort_inverts_distort(self, rng):
        cam = self.make_cam()
        xy = jnp.asarray(rng.uniform(-0.6, 0.6, size=(100, 2)), jnp.float32)
        xyd = camera.distort(cam, xy)
        xyu = camera.undistort(cam, xyd)
        np.testing.assert_allclose(np.asarray(xyu), np.asarray(xy), atol=1e-5)

    def test_project_bearing_consistency(self, rng):
        cam = self.make_cam()
        X_cam = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, (50, 2)), rng.uniform(2, 10, (50, 1))], axis=1
            ),
            jnp.float32,
        )
        uv = camera.project_cam(cam, X_cam)
        b = camera.bearing(cam, uv)
        Xn = np.asarray(X_cam) / np.linalg.norm(np.asarray(X_cam), axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(b), Xn, atol=1e-4)

    def test_zero_distortion_identity(self, rng):
        cam = self.make_cam(k=(0.0, 0.0, 0.0))
        uv = jnp.asarray(rng.uniform(0, 700, size=(10, 2)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(camera.undistort_pixel(cam, uv)), np.asarray(uv), atol=1e-3
        )


class TestTriangulation:
    def test_two_view_roundtrip(self, rng):
        R1, C1 = jnp.eye(3), jnp.zeros(3)
        R2 = jnp.asarray(random_rotation(rng, 0.1))
        C2 = jnp.asarray([1.0, 0.1, 0.0], jnp.float32)
        X = jnp.asarray(
            np.concatenate(
                [rng.uniform(-2, 2, (64, 2)), rng.uniform(4, 12, (64, 1))], axis=1
            ),
            jnp.float32,
        )
        def proj(R, C, X):
            Xc = (X - C) @ R.T
            return Xc[..., :2] / Xc[..., 2:3]
        xy1 = proj(R1, C1, X)
        xy2 = proj(R2, C2, X)
        Xt = triangulation.triangulate_points(R1, C1, xy1, R2, C2, xy2)
        np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=2e-2)

    def test_nview(self, rng):
        V = 4
        Rs = jnp.stack([jnp.eye(3)] + [jnp.asarray(random_rotation(rng, 0.1)) for _ in range(V - 1)])
        Cs = jnp.asarray(rng.uniform(-1, 1, (V, 3)), jnp.float32)
        X = jnp.asarray([0.3, -0.2, 8.0], jnp.float32)
        def proj(R, C):
            Xc = (X - C) @ R.T
            return Xc[:2] / Xc[2]
        xys = jnp.stack([proj(Rs[i], Cs[i]) for i in range(V)])
        mask = jnp.asarray([True, True, True, False])
        Xt = triangulation.triangulate_nview(Rs, Cs, xys, mask)
        np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=5e-2)

    def test_ray_angle(self):
        C1 = jnp.zeros(3)
        C2 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        X = jnp.asarray([0.5, 0.0, 0.5], jnp.float32)
        ang = triangulation.ray_angle_deg(C1, C2, X)
        assert np.asarray(ang) == pytest.approx(90.0, abs=1e-3)


def test_jit_vmap_composability(rng):
    """Geometry must survive jit+vmap (determinism under transforms)."""
    ws = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    Rs = jax.jit(so3.exp_batch)(ws)
    assert Rs.shape == (16, 3, 3)
    es = jax.jit(so3.rot_to_euler_batch)(Rs)
    Rs2 = jax.jit(so3.euler_to_rot_batch)(es)
    np.testing.assert_allclose(np.asarray(Rs), np.asarray(Rs2), atol=1e-4)
