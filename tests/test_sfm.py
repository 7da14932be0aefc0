"""SfM layer tests: tracks union-find, two-view bootstrap, map localization
(SURVEY.md §4 golden configs 2-3: relative pose -> map -> localization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coloc_tpu.config import (
    DetectorOptions,
    MatcherOptions,
    RansacOptions,
    RefinerOptions,
)
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.geometry import so3
from coloc_tpu.robust import relative_pose_essential
from coloc_tpu.sfm import localize, reconstruct, tracks
from coloc_tpu.types import Features, Matches, Pose, empty_features

K = jnp.asarray([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], jnp.float32)
CAM = cam_ops.Camera(K=K, dist=jnp.zeros(3, jnp.float32))


class TestTracks:
    def test_chain_merging(self):
        """Match chains 0-1-2 merge into one track."""
        m01 = np.full(8, -1); m01[2] = 5
        m12 = np.full(8, -1); m12[5] = 3
        table, valid = tracks.build_tracks(
            {(0, 1): m01, (1, 2): m12}, num_views=3,
            capacity_per_view=8, max_tracks=16,
        )
        assert valid.sum() == 1
        assert tuple(table[0]) == (2, 5, 3)

    def test_inconsistent_dropped(self):
        """Two view-0 features merged into one track -> dropped."""
        m01 = np.full(8, -1); m01[1] = 4; m01[2] = 4  # both map to same
        table, valid = tracks.build_tracks(
            {(0, 1): m01}, num_views=2, capacity_per_view=8, max_tracks=16,
        )
        assert valid.sum() == 0

    def test_pairwise_only(self):
        m01 = np.full(8, -1); m01[0] = 1; m01[3] = 6
        table, valid = tracks.build_tracks(
            {(0, 1): m01}, num_views=2, capacity_per_view=8, max_tracks=16,
        )
        assert valid.sum() == 2


def synthetic_two_view(rng, n=256):
    """Features + perfect matches between two synthetic views."""
    R = jnp.asarray(so3.exp(jnp.asarray([0.02, -0.2, 0.01], jnp.float32)))
    C = jnp.asarray([1.0, 0.1, 0.05], jnp.float32)
    X = jnp.asarray(
        np.c_[rng.uniform(-3, 3, (n, 2)), rng.uniform(5, 14, (n, 1))],
        jnp.float32,
    )
    uv1 = cam_ops.project(CAM, jnp.eye(3), jnp.zeros(3), X)
    uv2 = cam_ops.project(CAM, R, C, X)
    fi = empty_features(n)._replace(xy=uv1, valid=jnp.ones(n, bool))
    fj = empty_features(n)._replace(xy=uv2, valid=jnp.ones(n, bool))
    matches = Matches(
        idx=jnp.arange(n, dtype=jnp.int32),
        best=jnp.zeros(n, jnp.int32),
        second=jnp.full((n,), 100, jnp.int32),
    )
    return fi, fj, matches, R, C, X


class TestTwoViewScene:
    def test_bootstrap_recovers_structure(self, rng):
        fi, fj, matches, R, C, X = synthetic_two_view(rng)
        geo = relative_pose_essential(
            jax.random.PRNGKey(0), fi.xy, fj.xy[matches.idx], matches.mask,
            CAM, CAM, RansacOptions(),
        )
        assert bool(geo.success)
        scale = float(jnp.linalg.norm(C))  # inject true scale at bootstrap
        scene = reconstruct.two_view_scene(
            fi, fj, matches, geo.inliers, geo.R, geo.t,
            Pose(R=jnp.eye(3), C=jnp.zeros(3)), scale, CAM, CAM,
            num_landmarks=256,
        )
        nv = int(np.asarray(scene.X_valid).sum())
        assert nv > 200
        err = np.linalg.norm(
            np.asarray(scene.X) - np.asarray(X), axis=1
        )[np.asarray(scene.X_valid)]
        assert np.median(err) < 0.05

    def test_refine_scene_and_mapdb(self, rng):
        fi, fj, matches, R, C, X = synthetic_two_view(rng)
        geo = relative_pose_essential(
            jax.random.PRNGKey(0), fi.xy, fj.xy[matches.idx], matches.mask,
            CAM, CAM, RansacOptions(),
        )
        scene = reconstruct.two_view_scene(
            fi, fj, matches, geo.inliers, geo.R, geo.t,
            Pose(R=jnp.eye(3), C=jnp.zeros(3)), float(jnp.linalg.norm(C)),
            CAM, CAM, num_landmarks=256,
        )
        Ks = jnp.stack([K, K])
        dists = jnp.zeros((2, 3))
        scene2, res = reconstruct.refine_scene(
            scene, Ks, dists, RefinerOptions(max_iterations=15),
            fix_pose=jnp.asarray([True, False]),
        )
        assert float(res.rmse) < 0.1
        mapdb = reconstruct.scene_to_mapdb(scene2)
        assert int(mapdb.count) == int(np.asarray(scene.X_valid).sum())


class TestLocalize:
    def test_localize_against_map(self, rng):
        """Build a map, localize a third view with outlier matches mixed in."""
        fi, fj, matches, R, C, X = synthetic_two_view(rng)
        geo = relative_pose_essential(
            jax.random.PRNGKey(0), fi.xy, fj.xy[matches.idx], matches.mask,
            CAM, CAM, RansacOptions(),
        )
        scene = reconstruct.two_view_scene(
            fi, fj, matches, geo.inliers, geo.R, geo.t,
            Pose(R=jnp.eye(3), C=jnp.zeros(3)), float(jnp.linalg.norm(C)),
            CAM, CAM, num_landmarks=256,
        )
        mapdb = reconstruct.scene_to_mapdb(scene)

        # third view observing the map landmarks
        R3 = jnp.asarray(so3.exp(jnp.asarray([0.05, -0.4, 0.02], jnp.float32)))
        C3 = jnp.asarray([2.0, 0.2, 0.1], jnp.float32)
        uv3 = cam_ops.project(CAM, R3, C3, mapdb.X)
        n = uv3.shape[0]
        feats3 = empty_features(n)._replace(xy=uv3, valid=mapdb.valid)
        idx = jnp.arange(n, dtype=jnp.int32)
        # corrupt 20% of the matches to wrong landmarks
        rng2 = np.random.default_rng(1)
        bad = rng2.random(n) < 0.2
        wrong = rng2.integers(0, n, n)
        idx = jnp.where(jnp.asarray(bad), jnp.asarray(wrong, jnp.int32), idx)
        mm = Matches(idx=idx, best=jnp.zeros(n, jnp.int32),
                     second=jnp.full((n,), 100, jnp.int32))

        pwc, inl = localize.localize_image(
            jax.random.PRNGKey(1), feats3, mm, mapdb, CAM,
            RansacOptions(), RefinerOptions(max_iterations=15),
        )
        assert bool(pwc.success)
        cos = (np.trace(np.asarray(pwc.pose.R).T @ np.asarray(R3)) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.3
        assert np.linalg.norm(np.asarray(pwc.pose.C) - np.asarray(C3)) < 0.05
        assert np.isfinite(np.asarray(pwc.cov)).all()

    def test_localize_failure_flag(self, rng):
        """Garbage matches -> success=False, identity pose."""
        n = 64
        mapdb = reconstruct.scene_to_mapdb(
            reconstruct.Scene(
                Rs=jnp.stack([jnp.eye(3)] * 2), Cs=jnp.zeros((2, 3)),
                X=jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32),
                X_valid=jnp.ones(n, bool),
                obs=jnp.zeros((2, n, 2)), obs_mask=jnp.zeros((2, n), bool),
                desc=jnp.zeros((n, 16), jnp.uint32),
            )
        )
        feats = empty_features(n)._replace(
            xy=jnp.asarray(rng.uniform(0, 600, (n, 2)), jnp.float32),
            valid=jnp.ones(n, bool),
        )
        mm = Matches(
            idx=jnp.asarray(rng.integers(0, n, n), jnp.int32),
            best=jnp.zeros(n, jnp.int32),
            second=jnp.full((n,), 100, jnp.int32),
        )
        pwc, _ = localize.localize_image(
            jax.random.PRNGKey(2), feats, mm, mapdb, CAM,
            RansacOptions(), RefinerOptions(max_iterations=10),
        )
        assert not bool(pwc.success)
        np.testing.assert_array_equal(np.asarray(pwc.pose.R), np.eye(3))
        np.testing.assert_array_equal(np.asarray(pwc.cov), np.eye(6))
