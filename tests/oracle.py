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


# ---------------------------------------------------------------------------
# collaborative core (BASELINE configs 4-5)
# ---------------------------------------------------------------------------
#
# Independent float64 semantics of the inter-drone fusion chain and the
# per-drone filter, mirroring the reference entry points:
#   computeScaleDifference        colocUtils.hpp:184-211
#   refinePose (poses-only BA)    Refiner.hpp:47-238 w/ Structure NONE
#                                 (the coloc.hpp:339 call-site pattern)
#   CovIntersection               CovIntersection.hpp:24-49 (ICI)
#   colocFilter                   KalmanFilter.hpp:44-161
# No JAX, no coloc_tpu imports; jacobians are CENTRAL FINITE DIFFERENCES so
# even the derivative computation is independent of the production code.


def rodrigues(w):
    """Angle-axis (3,) -> rotation matrix, float64."""
    w = np.asarray(w, np.float64)
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + hat(w)
    k = w / th
    K = hat(k)
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def scale_ratio_mean(Xa, Xb):
    """computeScaleDifference semantics: mean over CONSECUTIVE matched
    landmark pairs of the inter-landmark distance ratio |dXa| / |dXb|.
    `Xa`, `Xb` are (N, 3) matched landmark positions in slot order (the
    production code compresses valid slots to the front preserving order —
    pass them the same way). Returns 1.0 with < 2 usable pairs."""
    Xa = np.asarray(Xa, np.float64)
    Xb = np.asarray(Xb, np.float64)
    if len(Xa) < 2:
        return 1.0
    da = np.linalg.norm(np.diff(Xa, axis=0), axis=1)
    db = np.linalg.norm(np.diff(Xb, axis=0), axis=1)
    ok = db > 1e-9
    if not ok.any():
        return 1.0
    return float(np.mean(da[ok] / db[ok]))


def _huber_sqrt_weights(res_sq, delta_sq):
    """sqrt of the IRLS weight for Huber loss (applied to residual AND
    jacobian rows): weight = 1 inside delta, delta/|r| outside."""
    w = np.where(res_sq <= delta_sq, 1.0,
                 np.sqrt(delta_sq / np.maximum(res_sq, 1e-300)))
    return np.sqrt(w)


def bundle_adjust(Ks, dists, Rs, Cs, X, obs, obs_mask, fix_pose,
                  optimize_structure=False, huber_delta_sq=16.0,
                  max_iters=100, cov_view=1):
    """Float64 LM bundle adjustment over V views / L landmarks.

    Pose parameterization: per-view tangent (w, dC) — rotation update
    R <- exp(w) R, center update C <- C + dC (the production convention, so
    covariances are comparable block-for-block). Returns
    (Rs, Cs, X, cov6 of `cov_view`, rmse) where cov6 is the 6x6 block of the
    inverse Gauss-Newton Hessian over ALL free parameters (ceres::Covariance
    semantics: other free poses and, if optimized, structure are
    marginalized).

    optimize_structure=False is the reference's poses-only pattern
    (Structure_Parameter_Type::NONE, coloc.hpp:339)."""
    Ks = [np.asarray(k, np.float64) for k in Ks]
    dists = [np.asarray(d, np.float64) for d in dists]
    Rs = [np.asarray(r, np.float64).copy() for r in Rs]
    Cs = [np.asarray(c, np.float64).copy() for c in Cs]
    X = np.asarray(X, np.float64).copy()
    obs = np.asarray(obs, np.float64)
    obs_mask = np.asarray(obs_mask, bool)
    fix_pose = np.asarray(fix_pose, bool)
    V, L = obs.shape[0], X.shape[0]
    free_views = [v for v in range(V) if not fix_pose[v]]

    def pack_residuals(Rs_, Cs_, X_):
        """(n_obs * 2,) raw residual vector over masked observations."""
        rows = []
        for v in range(V):
            li = np.nonzero(obs_mask[v])[0]
            if li.size:
                pred = project(Ks[v], dists[v], Rs_[v], Cs_[v], X_[li])
                rows.append((pred - obs[v, li]).ravel())
            else:
                rows.append(np.zeros(0))
        return np.concatenate(rows)

    def apply_params(p):
        """Parameter vector -> (Rs, Cs, X). Layout: 6 per free view
        (w, dC), then 3 per landmark if optimize_structure."""
        Rs_ = [r.copy() for r in Rs]
        Cs_ = [c.copy() for c in Cs]
        X_ = X.copy()
        o = 0
        for v in free_views:
            Rs_[v] = rodrigues(p[o:o + 3]) @ Rs[v]
            Cs_[v] = Cs[v] + p[o + 3:o + 6]
            o += 6
        if optimize_structure:
            X_ = X + p[o:].reshape(L, 3)
        return Rs_, Cs_, X_

    n_params = 6 * len(free_views) + (3 * L if optimize_structure else 0)

    def residuals_at(p):
        return pack_residuals(*apply_params(p))

    def weighted_system(p, eps=1e-6):
        """Huber-weighted (J, r) at parameters p via central differences."""
        r = residuals_at(p)
        res_sq = (r.reshape(-1, 2) ** 2).sum(axis=1)
        sw = np.repeat(_huber_sqrt_weights(res_sq, huber_delta_sq), 2)
        J = np.zeros((r.size, n_params))
        for j in range(n_params):
            dp = np.zeros(n_params)
            dp[j] = eps
            J[:, j] = (residuals_at(p + dp) - residuals_at(p - dp)) / (2 * eps)
        return J * sw[:, None], r * sw

    def weighted_cost(p):
        r = residuals_at(p)
        res_sq = (r.reshape(-1, 2) ** 2).sum(axis=1)
        w = np.repeat(_huber_sqrt_weights(res_sq, huber_delta_sq) ** 2, 2)
        return float(np.sum(w * r * r))

    # LM about the CURRENT state: parameters are always a delta from the
    # stored (Rs, Cs, X), re-anchored after each accepted step so the
    # rotation tangent stays small.
    lam = 1e-3
    for _ in range(max_iters):
        J, r = weighted_system(np.zeros(n_params))
        H = J.T @ J
        g = -J.T @ r
        cost = float(r @ r)
        step = np.linalg.solve(H + lam * np.diag(np.maximum(np.diag(H), 1e-6)), g)
        new_cost = weighted_cost(step)
        if new_cost < cost:
            Rs, Cs, X = apply_params(step)
            Rs = [np.asarray(r_, np.float64) for r_ in Rs]
            lam = max(lam / 3.0, 1e-10)
            if (cost - new_cost) / max(cost, 1e-300) < 1e-12:
                break
            if np.linalg.norm(step) < 1e-12:
                break
        else:
            lam = min(lam * 4.0, 1e10)
            if lam >= 1e10:
                break

    # covariance: inverse GN Hessian at the solution, free params only
    J, r = weighted_system(np.zeros(n_params))
    H = J.T @ J
    Hinv = np.linalg.pinv(H)
    try:
        ci = free_views.index(cov_view)
        cov6 = Hinv[6 * ci:6 * ci + 6, 6 * ci:6 * ci + 6]
    except ValueError:
        cov6 = np.zeros((6, 6))

    n_obs = int(obs_mask.sum())
    raw = pack_residuals(Rs, Cs, X)
    rmse = float(np.sqrt(np.sum(raw ** 2) / max(n_obs, 1)))
    return Rs, Cs, X, cov6, rmse


def covariance_intersection(Ca, Cb, a, b):
    """Float64 ICI (CovIntersection.hpp:24-49 semantics):
      C_f(w) = (Ca^-1 + Cb^-1 - (w Ca + (1-w) Cb)^-1)^-1,
      w* = argmin_{w in [0,1]} tr C_f(w),
      K = C_f (Ca^-1 - w* M), L = C_f (Cb^-1 - (1-w*) M),  x = K a + L b.
    The 1-D minimization is a dense scan + golden refinement — independent
    of both dlib's and the production golden-section implementations.
    Returns (cov, pos, omega)."""
    Ca = np.asarray(Ca, np.float64)
    Cb = np.asarray(Cb, np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    Cai, Cbi = np.linalg.inv(Ca), np.linalg.inv(Cb)

    def trace_at(w):
        M = np.linalg.inv(w * Ca + (1.0 - w) * Cb)
        return np.trace(np.linalg.inv(Cai + Cbi - M))

    ws = np.linspace(0.0, 1.0, 2001)
    vals = np.array([trace_at(w) for w in ws])
    i = int(np.argmin(vals))
    lo, hi = ws[max(i - 1, 0)], ws[min(i + 1, len(ws) - 1)]
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    for _ in range(80):
        m1 = hi - phi * (hi - lo)
        m2 = lo + phi * (hi - lo)
        if trace_at(m1) < trace_at(m2):
            hi = m2
        else:
            lo = m1
    w = 0.5 * (lo + hi)
    M = np.linalg.inv(w * Ca + (1.0 - w) * Cb)
    Cf = np.linalg.inv(Cai + Cbi - M)
    Kg = Cf @ (Cai - w * M)
    Lg = Cf @ (Cbi - (1.0 - w) * M)
    return Cf, Kg @ a + Lg @ b, float(w)


def rot_to_euler(R):
    """Reference Euler convention (colocUtils.hpp:63-100), float64."""
    R = np.asarray(R, np.float64)
    m10 = R[1, 0]
    if m10 > 0.998:
        return np.array([0.0, np.pi / 2, np.arctan2(R[0, 2], R[2, 2])])
    if m10 < -0.998:
        return np.array([0.0, -np.pi / 2, np.arctan2(R[0, 2], R[2, 2])])
    return np.array([
        np.arctan2(-R[1, 2], R[1, 1]),
        np.arcsin(np.clip(m10, -1.0, 1.0)),
        np.arctan2(-R[2, 0], R[0, 0]),
    ])


def kalman_trajectory(zs, cov_centers, rmses, availables,
                      process_noise=1e-2, measurement_noise=1e-1,
                      initial_covariance=1.0, gate=10.0, warmup=5):
    """Float64 constant-position 6-state Kalman filter over one drone's
    measurement sequence (colocFilter semantics, KalmanFilter.hpp:44-161 as
    characterized in coloc_tpu/fusion/kalman.py):
      - F = I (cv::KalmanFilter default transition), Q = 1e-2 I, R = 1e-1 I
        with the [3:6,3:6] block overwritten by cov_center * rmse per update,
      - ENERGY gate innv^T S innv with S = P_pre + R (the reference
        multiplies by S, not S^-1), reject > 10 after `warmup` accepted
        updates, coast on prediction otherwise,
      - innovation angles wrapped to [-pi, pi].
    zs: (F, 6) [x, y, z, bank, attitude, heading]. Returns (xs (F, 6),
    Ps (F, 6, 6)) — the filtered state after each step."""
    zs = np.asarray(zs, np.float64)
    F = zs.shape[0]
    x = np.zeros(6)
    P = np.eye(6) * initial_covariance
    steps = 0
    xs, Ps = [], []
    for f in range(F):
        Q = np.eye(6) * process_noise
        Rm = np.eye(6) * measurement_noise
        Rm[3:6, 3:6] = np.asarray(cov_centers[f], np.float64) * float(rmses[f])
        x_pred = x
        P_pred = P + Q
        innv = zs[f] - x_pred
        innv[3:6] = np.arctan2(np.sin(innv[3:6]), np.cos(innv[3:6]))
        S = P_pred + Rm
        dist = innv @ S @ innv
        reject = (dist > gate) and (steps >= warmup)
        K = P_pred @ np.linalg.inv(S)
        use = bool(availables[f]) and not reject
        if use:
            x = x_pred + K @ innv
            P = (np.eye(6) - K) @ P_pred
            steps += 1
        else:
            x = x_pred
            P = P_pred
        xs.append(x.copy())
        Ps.append(P.copy())
    return np.stack(xs), np.stack(Ps)


def dir_angle_deg(a, b):
    a = np.asarray(a, np.float64); a = a / np.linalg.norm(a)
    b = np.asarray(b, np.float64); b = b / np.linalg.norm(b)
    return np.degrees(np.arccos(np.clip(abs(a @ b), -1.0, 1.0)))
