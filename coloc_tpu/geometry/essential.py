"""Essential/fundamental matrix estimation + decomposition, batched.

Reference parity: RobustMatcher.hpp filterEssential (:153-186) — AC-RANSAC
with OpenMVG's FivePointSolver and SymmetricEpipolarDistanceError, then
RelativePoseFromEssential (E -> 4 motion candidates -> cheirality vote).

Solver inventory: the production 'E' path uses the batched Nistér 5-point
solver in geometry/fivept.py (exact reference parity, planar-safe); this
module provides the linear 8-point E (least-squares re-fit / testing), the
Hartley-normalized 8-point F, the exact 7-point F (cubic via interpolation),
the E -> (R, t) cheirality-voting decomposition with closed-form two-view
depths, Sampson/symmetric epipolar errors, and Gauss-Newton refinement on
the essential manifold.

All inputs are normalized (unit-focal, undistorted) image coords except the
F solvers, which take pixels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp



def _epipolar_design_rows(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rows of the epipolar constraint x2^T E x1 = 0. x1,x2: (N, 2) -> (N, 9)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def eight_point(x1: jnp.ndarray, x2: jnp.ndarray,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point: (N>=8, 2) correspondences -> E (3,3).

    Solves min ||A e|| via the smallest eigenvector of A^T A (9x9 symmetric
    eigh — cheap, batched), then projects to the essential manifold
    (singular values (s, s, 0)).
    """
    A = _epipolar_design_rows(x1, x2)  # (N, 9)
    if weights is not None:
        A = A * weights[:, None]
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[:, 0]
    E = e.reshape(3, 3)
    # project to essential manifold
    U, s, Vt = jnp.linalg.svd(E)
    sig = (s[0] + s[1]) / 2.0
    E = U @ jnp.diag(jnp.array([sig, sig, 0.0])) @ Vt
    return E


eight_point_batch = jax.vmap(eight_point)


def fundamental_8pt(x1: jnp.ndarray, x2: jnp.ndarray,
                    weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """8-point fundamental with Hartley normalization and rank-2 projection.

    Replaces the reference's 7-point solver (RobustMatcher.hpp:134-150) with
    the batched-friendly 8-point variant (documented deviation). `weights`
    enables the post-RANSAC least-squares re-fit over the inlier set.
    """
    w = jnp.ones(x1.shape[0]) if weights is None else weights
    wsum = jnp.sum(w) + 1e-9

    def normalize(x):
        mean = jnp.sum(x * w[:, None], axis=0) / wsum
        scale = jnp.sqrt(2.0) / (
            jnp.sum(jnp.linalg.norm(x - mean, axis=1) * w) / wsum + 1e-9
        )
        T = jnp.array(
            [[scale, 0.0, -scale * mean[0]],
             [0.0, scale, -scale * mean[1]],
             [0.0, 0.0, 1.0]]
        )
        return (x - mean) * scale, T

    x1n, T1 = normalize(x1)
    x2n, T2 = normalize(x2)
    A = _epipolar_design_rows(x1n, x2n) * w[:, None]
    _, vecs = jnp.linalg.eigh(A.T @ A)
    F = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(F)
    F = U @ jnp.diag(jnp.array([s[0], s[1], 0.0])) @ Vt
    F = T2.T @ F @ T1
    return F / (F[2, 2] + 1e-12)


fundamental_8pt_batch = jax.vmap(fundamental_8pt)


def seven_point(x1: jnp.ndarray, x2: jnp.ndarray):
    """7-point fundamental solver -> (3, 3, 3) candidates + (3,) valid.

    Reference parity: OpenMVG SevenPointSolver used by the 'F' model
    (RobustMatcher.hpp:134-150). The 2-dim null space of the 7x9 design
    matrix gives F = F1 + lam*F2; det(F) = 0 is a cubic in lam solved in
    closed form (Cardano, branch-free via trig/hyperbolic formulas evaluated
    on all three roots and masked) — up to 3 real candidates per sample,
    scored by the RANSAC harness like the 5-point solver's 10.
    """
    # Hartley normalization for f32 conditioning (pixel-coord inputs)
    def normalize(x):
        mean = jnp.mean(x, axis=0)
        scale = jnp.sqrt(2.0) / (jnp.mean(jnp.linalg.norm(x - mean, axis=1)) + 1e-9)
        T = jnp.array(
            [[scale, 0.0, -scale * mean[0]],
             [0.0, scale, -scale * mean[1]],
             [0.0, 0.0, 1.0]]
        )
        return (x - mean) * scale, T

    x1n, T1 = normalize(x1)
    x2n, T2 = normalize(x2)

    A = _epipolar_design_rows(x1n, x2n)  # (7, 9)
    # null space via complete QR of A^T (trailing 2 columns of Q) — same
    # replacement as the 5-point solver's null basis: TPU batch SVD costs
    # ~10x the complete QR at these shapes, and any orthonormal basis of
    # the 2-dim null space parametrizes the same F pencil
    q, _ = jnp.linalg.qr(A.T, mode="complete")  # (9, 9)
    F1 = q[:, 7].reshape(3, 3)
    F2 = q[:, 8].reshape(3, 3)

    # det(F1 + lam F2) = c0 + c1 lam + c2 lam^2 + c3 lam^3 via 4-point
    # polynomial interpolation (exact for a cubic, no symbolic expansion)
    ts = jnp.array([0.0, 1.0, -1.0, 2.0])
    ds = jax.vmap(lambda t: jnp.linalg.det(F1 + t * F2))(ts)
    # Vandermonde solve for the cubic coefficients
    V = jnp.stack([ts ** 0, ts, ts ** 2, ts ** 3], axis=1)
    c = jnp.linalg.solve(V, ds)  # (4,) ascending

    c3 = jnp.where(jnp.abs(c[3]) < 1e-12, 1e-12, c[3])
    a, b_, cc = c[2] / c3, c[1] / c3, c[0] / c3
    # depressed cubic t^3 + p t + q, lam = t - a/3
    p = b_ - a * a / 3.0
    q = 2.0 * a ** 3 / 27.0 - a * b_ / 3.0 + cc
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three-real-root branch (disc <= 0): trigonometric form
    m = 2.0 * jnp.sqrt(jnp.maximum(-p / 3.0, 1e-12))
    arg = jnp.clip(3.0 * q / (p * m + 1e-12), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    k = jnp.arange(3).astype(jnp.float32)
    t_trig = m * jnp.cos(theta - 2.0 * jnp.pi * k / 3.0)

    # one-real-root branch (disc > 0): Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    cbrt = lambda v: jnp.sign(v) * jnp.abs(v) ** (1.0 / 3.0)
    t_card = cbrt(-q / 2.0 + sq) + cbrt(-q / 2.0 - sq)

    three_real = disc <= 0
    t_roots = jnp.where(three_real, t_trig, jnp.stack([t_card] * 3))
    valid = jnp.where(
        three_real, jnp.ones(3, bool),
        jnp.array([True, False, False]),
    )
    lams = t_roots - a / 3.0

    def build(lam):
        F = T2.T @ (F1 + lam * F2) @ T1  # denormalize
        return F / (jnp.linalg.norm(F) + 1e-12)

    Fs = jax.vmap(build)(lams)
    return Fs, valid


def symmetric_epipolar_distance_sq(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    s1_sq: float = 1.0, s2_sq: float = 1.0,
) -> jnp.ndarray:
    """Squared symmetric epipolar distance, (M,).

    Matches OpenMVG's SymmetricEpipolarDistanceError used by the 'E' and 'F'
    kernels (RobustMatcher.hpp:161-171).

    s1_sq / s2_sq: squared unit scales for the image-1 / image-2 side
    distances. For normalized camera coords pass the squared focal lengths
    (f1^2, f2^2) to express the result in PIXELS — each side scaled by ITS
    OWN camera's focal, which matters when the two drones carry different
    lenses (the reference undistorts/normalizes per camera).
    """
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # (M, 3)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T      # (M, 3): epipolar line of x1 in IMAGE 2
    Etx2 = h2 @ E       # (M, 3): epipolar line of x2 in IMAGE 1
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    # true symmetric point-to-line distance: d(x2, E x1)^2 + d(x1, E^T x2)^2
    # = num * (1/|l1|^2 + 1/|l2|^2). (NOT 4*num/(|l1|^2+|l2|^2), which
    # underestimates without bound when one epipolar-line norm is small.)
    d_img2 = num / (Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + 1e-12)
    d_img1 = num / (Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2 + 1e-12)
    return s2_sq * d_img2 + s1_sq * d_img1


def symmetric_epipolar_distance_sq_batch(
    Es: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    s1_sq: float = 1.0, s2_sq: float = 1.0,
    precision=None,
) -> jnp.ndarray:
    """All-models symmetric epipolar distances -> (Hm, M) in one shot.

    Same values as vmapping symmetric_epipolar_distance_sq over Es to
    ~2e-3 relative (exact on small residuals; the deviation concentrates on
    large far-outlier residuals via denominator cancellation — see below),
    expressed as pure quadratic forms so NO (M, Hm, 3) intermediate is ever materialized (at Hm=7680,
    M=1024 those were 2 x 94 MB of HBM traffic — the dominant cost of
    batched-RANSAC scoring):
      numerator  (h2^T E h1)^2      = ((h2 (x) h1) . vec(E))^2
      den img2   ||(E h1)_xy||^2    = h1^T (r0 r0^T + r1 r1^T) h1
      den img1   ||(E^T h2)_xy||^2  = h2^T (c0 c0^T + c1 c1^T) h2
    i.e. three (M, 9) x (9, Hm) matmuls + an elementwise epilogue. The
    quadratic-form denominators can round to tiny NEGATIVE values where the
    true denominator ~ 0 (epipole on the point); clamped from below.

    precision: matmul precision for the three contractions. None inherits
    the library-wide HIGHEST (f32-exact, ~6 MXU passes per f32 matmul on
    TPU). Pass jax.lax.Precision.DEFAULT for single-pass bf16 matmuls when
    the residuals only feed a RANKING (RANSAC candidate pre-rank) — ~0.4%
    relative error, never for inlier classification or NFA scores.
    """
    Hm = Es.shape[0]
    M = x1.shape[0]
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # (M, 3)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    O = (h2[:, :, None] * h1[:, None, :]).reshape(M, 9)     # h2 (x) h1
    A = jnp.matmul(Es.reshape(Hm, 9), O.T, precision=precision)  # (Hm, M)
    num = A * A
    rows = Es[:, :2, :]                                     # (Hm, 2, 3)
    S1 = jnp.einsum("had,hak->hdk", rows, rows)             # (Hm, 3, 3)
    cols = Es[:, :, :2]                                     # (Hm, 3, 2)
    S2 = jnp.einsum("hda,hka->hdk", cols, cols)             # (Hm, 3, 3)
    P1 = (h1[:, :, None] * h1[:, None, :]).reshape(M, 9)    # h1 (x) h1
    P2 = (h2[:, :, None] * h2[:, None, :]).reshape(M, 9)
    # model-side operands on the LEFT so every matmul lands directly in the
    # (Hm, M) output layout — no 31 MB physical transpose at the end
    den2 = jnp.maximum(
        jnp.matmul(S1.reshape(Hm, 9), P1.T, precision=precision), 1e-12
    )                                                       # (Hm, M)
    den1 = jnp.maximum(
        jnp.matmul(S2.reshape(Hm, 9), P2.T, precision=precision), 1e-12
    )
    return s2_sq * num / den2 + s1_sq * num / den1          # (Hm, M)


def sampson_distance_sq(E, x1, x2):
    """First-order geometric (Sampson) epipolar error, (M,)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T
    Etx2 = h2 @ E
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    denom = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / (denom + 1e-12)


def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """(3, 2) orthonormal basis of the plane orthogonal to unit vector t."""
    # pick the axis least aligned with t to seed Gram-Schmidt (branch-free)
    a = jnp.where(jnp.abs(t[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                  jnp.array([0.0, 1.0, 0.0]))
    b1 = a - t * jnp.dot(a, t)
    b1 = b1 / (jnp.linalg.norm(b1) + 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def refine_relative_pose(
    R: jnp.ndarray,
    t: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on the essential manifold: minimize weighted Sampson error
    over (R in SO(3), t on S^2) — 5 DoF, so planar scenes stay well-posed
    (unlike a linear 8-point re-fit). Plays the role of ACRANSAC's local
    optimization + the essential part of the reference's later BA polish.

    Early-exit while_loop (same rationale as the LM pose refiner in
    sfm/ba.py): each GN step costs ~7 residual evaluations (jacfwd with 5
    tangents + the acceptance re-eval), and a typical inlier set converges
    in 2-3 steps — a fixed 8-step scan burned ~2x the needed latency.
    Exits on step rejection (undamped GN would re-derive the same rejected
    step forever), a tiny step, or a relatively tiny cost improvement."""
    from coloc_tpu.geometry import so3 as so3_ops

    def cond(carry):
        _, _, it, done = carry
        return (it < iters) & ~done

    def body(carry):
        R, t, it, _ = carry
        B = _tangent_basis(t)

        def resid(p):
            Rp = so3_ops.exp(p[:3]) @ R
            tp = t + B @ p[3:]
            tp = tp / (jnp.linalg.norm(tp) + 1e-12)
            E = hat3(tp) @ Rp
            return jnp.sqrt(sampson_distance_sq(E, x1, x2) + 1e-12) * weights

        p0 = jnp.zeros(5)
        r = resid(p0)
        J = jax.jacfwd(resid)(p0)  # (M, 5)
        JtJ = J.T @ J + 1e-8 * jnp.eye(5)
        p = -jnp.linalg.solve(JtJ, J.T @ r)
        R_new = so3_ops.exp(p[:3]) @ R
        t_new = t + B @ p[3:]
        t_new = t_new / (jnp.linalg.norm(t_new) + 1e-12)
        # accept only if the weighted cost decreased (cheap trust region)
        c_old = jnp.sum(r ** 2)
        E_new = hat3(t_new) @ R_new
        c_new = jnp.sum(
            (jnp.sqrt(sampson_distance_sq(E_new, x1, x2) + 1e-12) * weights) ** 2
        )
        better = c_new < c_old
        R_out = jnp.where(better, R_new, R)
        t_out = jnp.where(better, t_new, t)
        done = (
            ~better
            | (jnp.sum(p * p) < 1e-12)                 # |step| < 1e-6
            | (c_old - c_new < 1e-7 * (c_old + 1e-20))  # relative stall
        )
        return (R_out, t_out, it + 1, done)

    R, t, _, _ = jax.lax.while_loop(
        cond, body, (R, t, jnp.int32(0), jnp.bool_(False))
    )
    return R, t


def hat3(w: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros_like(w[0])
    return jnp.array(
        [[zero, -w[2], w[1]], [w[2], zero, -w[0]], [-w[1], w[0], zero]]
    )


def decompose_essential(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E -> (R, t) with max cheirality votes over the masked correspondences.

    RelativePoseFromEssential parity: 4 candidates (R1|R2 x ±t), triangulate
    each correspondence under each candidate, count points with positive depth
    in both views, take the argmax (RobustMatcher.hpp:180).
    Convention: x2-frame pose of camera 2 relative to camera 1 — x_cam2 =
    R (x_cam1 - C), i.e. (R, t) with t = -R C.

    Closed-form extraction (no 3x3 SVD — the SVD's iterative Jacobi sweeps
    were most of this function's latency): for E = [t]x R with unit t,
      adj([t]x) = t t^T  and  [t]x^T [t]x = I - t t^T
    give  Cof(E) = t t^T R  and  R = -[t]x E + Cof(E); negating t yields
    the twisted-pair mate (2 t t^T - I) R. t itself is the unit left null
    vector of E = the largest cross product of two columns. Validated
    head-to-head against the SVD route on noisy essentials: worst-case
    candidate rotation error 0.049 vs 0.047 deg at 1e-4 Frobenius noise
    (the RANSAC-winner regime), 0.42 vs 0.38 deg at 1e-3. One first-order
    polar step re-orthogonalizes R against that noise (error drops
    quadratically, ~6e-4 -> ~5e-7).
    """
    c0, c1, c2 = E[:, 0], E[:, 1], E[:, 2]
    crosses = jnp.stack(
        [jnp.cross(c0, c1), jnp.cross(c0, c2), jnp.cross(c1, c2)]
    )                                                    # (3, 3)
    norms = jnp.sum(crosses * crosses, axis=1)
    t = crosses[jnp.argmax(norms)]
    t = t / (jnp.linalg.norm(t) + 1e-12)
    # scale E to singular values (1, 1, 0): ||E||_F^2 = 2 for unit t
    Es = E * (jnp.sqrt(2.0) / (jnp.linalg.norm(E) + 1e-12))
    cof = jnp.stack(
        [jnp.cross(Es[:, 1], Es[:, 2]),
         jnp.cross(Es[:, 2], Es[:, 0]),
         jnp.cross(Es[:, 0], Es[:, 1])], axis=1
    )                                                    # Cof(Es)
    tx = hat3(t)

    def polar_fix(R):
        # first-order polar correction toward the nearest rotation
        return 1.5 * R - 0.5 * R @ (R.T @ R)

    R1 = polar_fix(-tx @ Es + cof)
    R2 = polar_fix(tx @ Es + cof)
    candidates = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # (M, 3)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)

    def votes(R, t):
        # closed-form two-view depths (no eigensolve): from
        # z2 x2 = R (z1 x1) + t, crossing with x2 eliminates z2:
        # z1 (x2 x R x1) = -(x2 x t)  =>  z1 by least squares on the cross.
        Rx1 = h1 @ R.T                      # (M, 3)
        cr = jnp.cross(h2, Rx1)             # (M, 3)
        ct = jnp.cross(h2, jnp.broadcast_to(t, h2.shape))
        z1 = -jnp.sum(cr * ct, axis=-1) / (jnp.sum(cr * cr, axis=-1) + 1e-12)
        z2 = (z1[:, None] * Rx1 + t[None, :])[:, 2]
        return jnp.sum((z1 > 0) & (z2 > 0) & mask)

    vote_counts = jnp.stack([votes(R, t) for R, t in candidates])
    k = jnp.argmax(vote_counts)
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    return Rs[k], ts[k]
