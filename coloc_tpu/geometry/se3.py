"""SE(3) pose algebra in the OpenMVG (rotation, center) convention.

Reference parity: OpenMVG Pose3 as used throughout — x_cam = R (X - C),
t = -R C. Pose writes back as Pose3(R, -R^T t) (Refiner.hpp:234); relative
poses compose to absolute via pose_J = relative * pose_I
(Reconstructor.hpp:215-221 `relativePoseToAbsolute`).
"""

from __future__ import annotations

import jax.numpy as jnp

from coloc_tpu.types import Pose


def identity() -> Pose:
    return Pose(R=jnp.eye(3), C=jnp.zeros(3))


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> Pose:
    """Build from (R, t) with x_cam = R X + t  =>  C = -R^T t."""
    return Pose(R=R, C=-R.T @ t)


def transform(pose: Pose, X: jnp.ndarray) -> jnp.ndarray:
    """World -> camera frame. X: (..., 3)."""
    return (X - pose.C) @ pose.R.T


def inverse(pose: Pose) -> Pose:
    """Camera -> world as a Pose: R' = R^T, C' = -R C (= t of the forward pose)."""
    return Pose(R=pose.R.T, C=-pose.R @ pose.C)


def compose(p2: Pose, p1: Pose) -> Pose:
    """(p2 * p1)(X) = p2(p1(X)): apply p1 first. Matches Pose3::operator*."""
    R = p2.R @ p1.R
    # (p2*p1)(X) = R2 (R1 (X - C1) - C2) = R2 R1 (X - (C1 + R1^T C2))
    C = p1.C + p1.R.T @ p2.C
    return Pose(R=R, C=C)


def relative(pose_i: Pose, pose_j: Pose) -> Pose:
    """Relative pose taking cam_i frame to cam_j frame: rel = pose_j * pose_i^{-1}.

    rel(X_i) = R_j R_i^T (X_i - R_i (C_j - C_i)) — matches OpenMVG
    Pose3 relative motion used in RobustMatcher.hpp:312-316.
    """
    R = pose_j.R @ pose_i.R.T
    C = pose_i.R @ (pose_j.C - pose_i.C)
    return Pose(R=R, C=C)


def relative_to_absolute(rel: Pose, pose_i: Pose, scale: float = 1.0) -> Pose:
    """Absolute pose_j from pose_i and a (possibly scaled) relative pose.

    Matches Reconstructor.hpp:215-221: the relative translation is scaled by
    `scale` before composing (monocular scale injection at bootstrap).
    """
    rel_scaled = Pose(R=rel.R, C=rel.C * scale)
    R = rel_scaled.R @ pose_i.R
    C = pose_i.C + pose_i.R.T @ rel_scaled.C
    return Pose(R=R, C=C)
