"""Map-based absolute localization.

Reference parity: Localizer.hpp —
  setupTracks (:59-75): 2D-3D correspondences from map matches (3D = landmark
    via mapRegionIdx, 2D = undistorted query feature).
  localizeImage (:77-108): AC-RANSAC P3P (max 256 iters :84) then `refine`
    (:110-177): single-pose Ceres BA with structure fixed (:132-133),
    reprojection RMSE (:160-170), pose covariance from the refiner.

Failure semantics: `success=False` with identity pose — the session logs an
identity pose + identity covariance and coasts on the KF prediction
(coloc.hpp:246-257), so no exceptions, just flags.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from coloc_tpu.config import RansacOptions, RefinerOptions
from coloc_tpu.geometry import camera as cam_ops
from coloc_tpu.robust import absolute_pose_p3p
from coloc_tpu.sfm.ba import refine_pose_only
from coloc_tpu.types import Features, MapDB, Matches, Pose, PoseWithCov


@functools.partial(jax.jit, static_argnames=("ransac_opts", "refiner_opts"))
def localize_image(
    key: jax.Array,
    feats: Features,
    map_matches: Matches,      # frame features vs map landmarks
    mapdb: MapDB,
    cam: cam_ops.Camera,
    ransac_opts: RansacOptions,
    refiner_opts: RefinerOptions,
) -> Tuple[PoseWithCov, jnp.ndarray]:
    """-> (PoseWithCov, inlier mask over frame features)."""
    # 2D-3D correspondences (setupTracks parity)
    X = mapdb.X[map_matches.idx]                       # (K, 3)
    uv = feats.xy                                      # (K, 2)
    corr_mask = map_matches.mask & feats.valid

    pose0, inliers, n_inl, success = absolute_pose_p3p(
        key, X, uv, corr_mask, cam, ransac_opts
    )

    # pose-only refinement, structure fixed (Localizer.hpp:132-133)
    res = refine_pose_only(
        pose0.R, pose0.C, X, uv, inliers, cam.K, cam.dist, refiner_opts
    )
    pose = Pose(R=res.Rs[1], C=res.Cs[1])

    # masked failure: identity pose + identity covariance (coloc.hpp:246-257)
    pose = Pose(
        R=jnp.where(success, pose.R, jnp.eye(3)),
        C=jnp.where(success, pose.C, jnp.zeros(3)),
    )
    cov = jnp.where(success, res.cov, jnp.eye(6))
    rmse = jnp.where(success, res.rmse, jnp.float32(0.0))

    return (
        PoseWithCov(pose=pose, cov=cov, rmse=rmse, n_tracks=n_inl,
                    success=success),
        inliers,
    )
