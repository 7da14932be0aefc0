"""Golden-value tests against the pure-numpy reference oracle (oracle.py).

BASELINE.md north star: "pose error within 1% of the OpenMVG CPU reference".
No OpenMVG exists in this environment, so oracle.py independently implements
the reference's geometric semantics (float64 numpy) and these tests measure
the production pipeline against it on the first three BASELINE.json configs:

  config 1: two-view detect/describe/match   -> match correctness vs GT warp
  config 2: two-view relative pose (E RANSAC) -> pose + inlier set vs oracle
  config 3: map localization (P3P + refine)   -> pose within 1%, inliers vs
            oracle reprojection classification
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle

from coloc_tpu.config import ColocConfig, DetectorOptions, MatcherOptions, RansacOptions, RefinerOptions
from coloc_tpu.frontend import detect_and_describe
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import so3
from coloc_tpu.io import synthetic
from coloc_tpu.matching import match_pair, match_with_map
from coloc_tpu.robust import relative_pose_essential
from coloc_tpu.sfm import localize
from coloc_tpu.types import MapDB

H, W = 240, 376
K = np.array([[0.62 * W, 0.0, W / 2], [0.0, 0.62 * W, H / 2], [0.0, 0.0, 1.0]],
             np.float32)
CAM = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.zeros(3, jnp.float32))
OPTS = DetectorOptions(width=W, height=H, max_keypoints=256, num_levels=4,
                       fast_threshold=12)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(H, W, K, seed=11)


@pytest.fixture(scope="module")
def views(scene):
    R2 = np.asarray(so3.exp(jnp.asarray([0.01, -0.04, 0.005], jnp.float32)))
    C2 = np.array([0.35, 0.05, 0.02], np.float32)
    img1 = synthetic.render(scene, np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32))
    img2 = synthetic.render(scene, R2, C2)
    f1 = detect_and_describe(jnp.asarray(img1), OPTS)
    f2 = detect_and_describe(jnp.asarray(img2), OPTS)
    return f1, f2, R2, C2


class TestConfig1MatchingVsOracle:
    def test_matches_agree_with_gt_epipolar_geometry(self, views):
        """Accepted descriptor matches must be geometrically consistent with
        the ground-truth camera motion (oracle epipolar classification):
        the frontend+matcher stack produces predominantly TRUE matches."""
        f1, f2, R2, C2 = views
        m = match_pair(f1, f2, MatcherOptions())
        idx = np.asarray(m.idx)
        ok = idx >= 0
        uv1 = np.asarray(f1.xy)[ok]
        uv2 = np.asarray(f2.xy)[idx[ok]]
        E = oracle.essential_from_pose(np.eye(3), np.zeros(3), R2, C2)
        x1 = oracle.undistort_normalized(K, np.zeros(3), uv1)
        x2 = oracle.undistort_normalized(K, np.zeros(3), uv2)
        f = (K[0, 0] + K[1, 1]) / 2
        inl = oracle.symmetric_epipolar_inliers(E, x1, x2, 4.0, f, f)
        assert ok.sum() >= 40
        # descriptor matching is not geometry-aware; require a strong
        # majority consistent with GT (the rest are genuine mismatches)
        assert inl.mean() > 0.75

    def test_projection_model_matches_oracle(self, views):
        """JAX camera model == float64 oracle camera model (distorted)."""
        rng = np.random.default_rng(5)
        X = np.c_[rng.uniform(-1, 1, (64, 2)), rng.uniform(4, 9, (64, 1))]
        distv = np.array([-0.2, 0.05, 0.0], np.float32)
        cam = cam_ops.Camera(K=jnp.asarray(K), dist=jnp.asarray(distv))
        R = np.asarray(so3.exp(jnp.asarray([0.1, -0.2, 0.05], jnp.float32)))
        C = np.array([0.5, -0.2, 0.1], np.float32)
        uv_jax = np.asarray(cam_ops.project(
            cam, jnp.asarray(R), jnp.asarray(C), jnp.asarray(X, jnp.float32)))
        uv_np = oracle.project(K, distv, R, C, X)
        np.testing.assert_allclose(uv_jax, uv_np, atol=2e-2)


class TestConfig2RelativePoseVsOracle:
    def test_pose_and_inliers_match_oracle(self, views):
        f1, f2, R2, C2 = views
        m = match_pair(f1, f2, MatcherOptions())
        uv2m = jnp.asarray(np.asarray(f2.xy)[np.asarray(m.idx)])
        geo = relative_pose_essential(
            jax.random.PRNGKey(0), f1.xy, uv2m, m.mask, CAM, CAM,
            RansacOptions(),
        )
        assert bool(geo.success)

        # oracle relative motion (camera 1 frame -> camera 2 frame)
        R_gt = R2 @ np.eye(3).T
        t_gt = R2 @ (np.zeros(3) - C2)
        assert oracle.rot_angle_deg(np.asarray(geo.R), R_gt) < 0.5
        assert oracle.dir_angle_deg(np.asarray(geo.t), t_gt) < 1.5

        # inlier-set agreement: classify the SAME correspondences with the
        # oracle's residual at the pipeline's adaptive threshold
        mask = np.asarray(m.mask)
        uv1 = np.asarray(f1.xy)
        uv2 = np.asarray(uv2m)
        x1 = oracle.undistort_normalized(K, np.zeros(3), uv1)
        x2 = oracle.undistort_normalized(K, np.zeros(3), uv2)
        E_est = oracle.hat(np.asarray(geo.t)) @ np.asarray(geo.R)
        f = (K[0, 0] + K[1, 1]) / 2
        # use the estimated model for classification parity (threshold from
        # the fixed gate; adaptive thresholds classify against geo's E)
        inl_oracle = oracle.symmetric_epipolar_inliers(
            E_est, x1, x2, 4.0, f, f) & mask
        inl_pipe = np.asarray(geo.inliers)
        jacc = (inl_oracle & inl_pipe).sum() / max(
            (inl_oracle | inl_pipe).sum(), 1)
        assert jacc > 0.85

    def test_triangulation_matches_oracle(self, views):
        f1, f2, R2, C2 = views
        from coloc_tpu.geometry import triangulation as tri
        rng = np.random.default_rng(3)
        X = np.c_[rng.uniform(-1, 1, (32, 2)), rng.uniform(4, 9, (32, 1))]
        uv1 = oracle.project(K, np.zeros(3), np.eye(3), np.zeros(3), X)
        uv2 = oracle.project(K, np.zeros(3), R2, C2, X)
        x1 = oracle.undistort_normalized(K, np.zeros(3), uv1)
        x2 = oracle.undistort_normalized(K, np.zeros(3), uv2)
        X_jax = np.asarray(tri.triangulate_points(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(x1, jnp.float32),
            jnp.asarray(R2), jnp.asarray(C2), jnp.asarray(x2, jnp.float32)))
        X_np = np.stack([
            oracle.triangulate_dlt(np.eye(3), np.zeros(3), x1[i], R2, C2, x2[i])
            for i in range(len(X))
        ])
        np.testing.assert_allclose(X_jax, X_np, atol=5e-3)
        np.testing.assert_allclose(X_np, X, atol=5e-3)

    def test_decomposition_matches_oracle(self, views):
        """Pipeline E-decomposition (cheirality vote) == oracle decomposition
        on the ground-truth essential matrix."""
        _, _, R2, C2 = views
        from coloc_tpu.geometry import essential as ess
        rng = np.random.default_rng(7)
        X = np.c_[rng.uniform(-1, 1, (48, 2)), rng.uniform(4, 9, (48, 1))]
        uv1 = oracle.project(K, np.zeros(3), np.eye(3), np.zeros(3), X)
        uv2 = oracle.project(K, np.zeros(3), R2, C2, X)
        x1 = oracle.undistort_normalized(K, np.zeros(3), uv1)
        x2 = oracle.undistort_normalized(K, np.zeros(3), uv2)
        E = oracle.essential_from_pose(np.eye(3), np.zeros(3), R2, C2)
        mask = np.ones(len(X), bool)
        R_np, t_np = oracle.decompose_essential(E, x1, x2, mask)
        R_jax, t_jax = ess.decompose_essential(
            jnp.asarray(E, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32), jnp.asarray(mask))
        assert oracle.rot_angle_deg(np.asarray(R_jax), R_np) < 0.1
        assert oracle.dir_angle_deg(np.asarray(t_jax), t_np) < 0.1


class TestConfig3LocalizationVsOracle:
    def test_pose_within_one_percent(self, views):
        """North-star accuracy gate: localized pose center within 1% of the
        trajectory scale of the oracle (= ground truth for exact synthetic
        correspondences), rotation within 0.2 deg."""
        f1, _, _, _ = views
        rng = np.random.default_rng(9)
        kp = int(np.asarray(f1.valid).sum())
        n = f1.xy.shape[0]
        # consistent map along the frame's bearings (exact 2D-3D geometry)
        uv = np.asarray(f1.xy)
        depths = rng.uniform(4.0, 10.0, (n, 1))
        dirs = (np.linalg.inv(K) @ np.c_[uv, np.ones(n)].T).T
        R_gt = np.asarray(so3.exp(jnp.asarray([0.02, -0.03, 0.01], jnp.float32)))
        C_gt = np.array([0.3, -0.1, 0.05], np.float64)
        # landmarks defined in the query camera's frame => world coords
        X_world = (dirs * depths) @ R_gt + C_gt  # inverse of R(X-C)
        uv_obs = oracle.project(K, np.zeros(3), R_gt, C_gt, X_world)

        mapdb = MapDB(X=jnp.asarray(X_world, jnp.float32), desc=f1.desc,
                      valid=f1.valid)
        mm = match_with_map(
            f1._replace(xy=jnp.asarray(uv_obs, jnp.float32)), mapdb,
            MatcherOptions())
        pwc, inl = localize.localize_image(
            jax.random.PRNGKey(2),
            f1._replace(xy=jnp.asarray(uv_obs, jnp.float32)),
            mm, mapdb, CAM, RansacOptions(), RefinerOptions(),
        )
        assert bool(pwc.success)
        c_err = np.linalg.norm(np.asarray(pwc.pose.C) - C_gt)
        assert c_err < 0.01 * np.linalg.norm(C_gt)   # within 1%
        assert oracle.rot_angle_deg(np.asarray(pwc.pose.R), R_gt) < 0.2

        # inlier set vs oracle reprojection classification at 4 px
        inl_oracle = oracle.reprojection_inliers(
            K, np.zeros(3), R_gt, C_gt, X_world, uv_obs, 4.0)
        inl_pipe = np.asarray(inl)
        valid = np.asarray(f1.valid) & np.asarray(mm.mask)
        agree = (inl_oracle & inl_pipe)[valid].sum() / max(
            inl_pipe[valid].sum(), 1)
        assert agree > 0.95
