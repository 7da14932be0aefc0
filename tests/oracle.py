"""Pure-numpy oracle of the reference pipeline's geometric semantics.

Independent (no JAX, no coloc_tpu imports) implementations of the OpenMVG
entry-point semantics the reference calls (SURVEY.md §2.3):

  - pinhole projection + radial-K3 distortion (Pinhole_Intrinsic_Radial_K3)
  - symmetric epipolar distance inlier classification
    (SymmetricEpipolarDistanceError, RobustMatcher.hpp:161-171)
  - essential-matrix decomposition with the cheirality vote
    (RelativePoseFromEssential)
  - DLT triangulation (TriangulateDLT)
  - reprojection-error inlier classification for absolute pose
    (SfM_Localizer / resection residuals)

Used as golden fixtures by test_oracle.py so "pose/inliers match the
reference semantics" is a measured claim (BASELINE.md north star), not an
asserted one. Everything is float64 for a numerically tight reference.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# camera model
# ---------------------------------------------------------------------------


def project(K, dist, R, C, X):
    """World points (N,3) -> distorted pixels (N,2). Pose = (R, C) with
    x_cam = R (X - C) (OpenMVG Pose3 convention)."""
    K = np.asarray(K, np.float64)
    X = np.asarray(X, np.float64)
    Xc = (X - np.asarray(C, np.float64)) @ np.asarray(R, np.float64).T
    xy = Xc[:, :2] / Xc[:, 2:3]
    r2 = np.sum(xy ** 2, axis=1, keepdims=True)
    k1, k2, k3 = np.asarray(dist, np.float64)
    factor = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xyd = xy * factor
    u = K[0, 0] * xyd[:, 0] + K[0, 2]
    v = K[1, 1] * xyd[:, 1] + K[1, 2]
    return np.stack([u, v], axis=1)


def undistort_normalized(K, dist, uv, iters=20):
    """Pixels -> undistorted NORMALIZED coords (get_ud_pixel semantics:
    fixed-point inversion of the radial model)."""
    K = np.asarray(K, np.float64)
    xy_d = np.stack(
        [(uv[:, 0] - K[0, 2]) / K[0, 0], (uv[:, 1] - K[1, 2]) / K[1, 1]],
        axis=1,
    )
    k1, k2, k3 = np.asarray(dist, np.float64)
    xy = xy_d.copy()
    for _ in range(iters):
        r2 = np.sum(xy ** 2, axis=1, keepdims=True)
        factor = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        xy = xy_d / factor
    return xy


# ---------------------------------------------------------------------------
# epipolar geometry
# ---------------------------------------------------------------------------


def hat(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64
    )


def essential_from_pose(R1, C1, R2, C2):
    """Ground-truth E for normalized coords: x2^T E x1 = 0."""
    R_rel = np.asarray(R2, np.float64) @ np.asarray(R1, np.float64).T
    t_rel = np.asarray(R2, np.float64) @ (np.asarray(C1, np.float64) - np.asarray(C2, np.float64))
    return hat(t_rel) @ R_rel


def symmetric_epipolar_inliers(E, x1, x2, threshold_px, f1, f2):
    """Inlier classification under the reference's residual: symmetric
    point-to-line distance, each side in its own camera's pixels."""
    h1 = np.c_[x1, np.ones(len(x1))]
    h2 = np.c_[x2, np.ones(len(x2))]
    l2 = h1 @ E.T          # epipolar lines in image 2
    l1 = h2 @ E            # epipolar lines in image 1
    num = np.sum(h2 * l2, axis=1) ** 2
    d_img2 = num / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-300)
    d_img1 = num / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-300)
    return (f2 ** 2) * d_img2 + (f1 ** 2) * d_img1 < threshold_px ** 2


def triangulate_dlt(R1, C1, x1, R2, C2, x2):
    """DLT triangulation for one normalized correspondence -> X (3,)."""
    P1 = np.asarray(R1, np.float64)
    p1 = -P1 @ np.asarray(C1, np.float64)
    P2 = np.asarray(R2, np.float64)
    p2 = -P2 @ np.asarray(C2, np.float64)
    M1 = np.c_[P1, p1]
    M2 = np.c_[P2, p2]
    A = np.stack([
        x1[0] * M1[2] - M1[0],
        x1[1] * M1[2] - M1[1],
        x2[0] * M2[2] - M2[0],
        x2[1] * M2[2] - M2[1],
    ])
    _, _, vt = np.linalg.svd(A)
    Xh = vt[-1]
    return Xh[:3] / Xh[3]


def decompose_essential(E, x1, x2, mask):
    """E -> (R_rel, t_rel) via the 4-motion cheirality vote
    (RelativePoseFromEssential semantics). Relative pose maps camera-1 coords
    to camera-2: x2 ~ R x1 + t."""
    U, _, Vt = np.linalg.svd(np.asarray(E, np.float64))
    if np.linalg.det(U) < 0:
        U[:, -1] *= -1
    if np.linalg.det(Vt) < 0:
        Vt[-1] *= -1
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    candidates = [
        (U @ W @ Vt, U[:, 2]),
        (U @ W @ Vt, -U[:, 2]),
        (U @ W.T @ Vt, U[:, 2]),
        (U @ W.T @ Vt, -U[:, 2]),
    ]
    best, best_count = None, -1
    for R, t in candidates:
        # camera 1 at origin; camera 2 pose: R2 = R, C2 = -R^T t
        C2 = -R.T @ t
        count = 0
        for i in np.nonzero(mask)[0]:
            X = triangulate_dlt(np.eye(3), np.zeros(3), x1[i],
                                R, C2, x2[i])
            z1 = X[2]
            z2 = (R @ (X - C2))[2]
            count += (z1 > 0) and (z2 > 0)
        if count > best_count:
            best, best_count = (R, t), count
    return best


# ---------------------------------------------------------------------------
# absolute pose
# ---------------------------------------------------------------------------


def reprojection_inliers(K, dist, R, C, X, uv, threshold_px):
    """Reprojection-error inlier set for a pose (resection residuals)."""
    pred = project(K, dist, R, C, X)
    err = np.sum((pred - np.asarray(uv, np.float64)) ** 2, axis=1)
    Xc = (np.asarray(X, np.float64) - C) @ np.asarray(R, np.float64).T
    return (err < threshold_px ** 2) & (Xc[:, 2] > 0)


def rot_angle_deg(Ra, Rb):
    cos = (np.trace(np.asarray(Ra).T @ np.asarray(Rb)) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def dir_angle_deg(a, b):
    a = np.asarray(a, np.float64); a = a / np.linalg.norm(a)
    b = np.asarray(b, np.float64); b = b / np.linalg.norm(b)
    return np.degrees(np.arccos(np.clip(abs(a @ b), -1.0, 1.0)))
