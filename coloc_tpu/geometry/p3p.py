"""Batched P3P absolute-pose solver (Grunert) + 3-point alignment.

Reference parity: OpenMVG SfM_Localizer::Localize(P3P_KE_CVPR17) used for
resection (Reconstructor.hpp:306) and map localization (Localizer.hpp:93).
Ke's CVPR17 solver is rotation-algebraic; here we use the classical Grunert
formulation because it reduces to (a) a quartic whose coefficients come from
pure polynomial arithmetic and (b) a 3-point Horn alignment — both of which
batch/vmap cleanly on TPU with no data-dependent branching.

The quartic is solved by fixed-iteration Durand-Kerner (complex64, 24 steps,
trace-static) + 2 Newton polish steps — no closed-form case analysis, no
nonsymmetric eigensolve (unsupported on TPU).

Each minimal sample yields up to 4 pose candidates with a validity mask; the
RANSAC harness scores all of them.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from coloc_tpu.types import Pose


def _polymul(p, q):
    """Coefficient convolution, ascending order."""
    n = len(p) + len(q) - 1
    out = [0.0] * n
    res = [jnp.zeros(()) for _ in range(n)]
    for i, a in enumerate(p):
        for j, b in enumerate(q):
            res[i + j] = res[i + j] + a * b
    return res


def _durand_kerner_quartic(coeffs: jnp.ndarray, iters: int = 24) -> jnp.ndarray:
    """Roots of c0 + c1 v + c2 v^2 + c3 v^3 + c4 v^4, (4,) complex64."""
    c = coeffs / (coeffs[4] + jnp.where(jnp.abs(coeffs[4]) < 1e-20, 1e-20, 0.0))

    def poly(z):
        return ((((z + c[3]) * z + c[2]) * z + c[1]) * z) + c[0]

    # standard distinct starting points
    z0 = jnp.array(
        [0.4 + 0.9j, (0.4 + 0.9j) ** 2, (0.4 + 0.9j) ** 3, (0.4 + 0.9j) ** 4],
        jnp.complex64,
    )

    def body(_, z):
        def update(k, zk):
            others = jnp.prod(jnp.where(jnp.arange(4) == k, 1.0 + 0.0j, zk - z))
            return zk - poly(zk) / (others + 1e-20)
        return jnp.stack([update(k, z[k]) for k in range(4)])

    z = jax.lax.fori_loop(0, iters, body, z0)

    # Newton polish on the real axis for near-real roots
    def dpoly(x):
        return ((4.0 * x + 3.0 * c[3]) * x + 2.0 * c[2]) * x + c[1]

    x = jnp.real(z)
    for _ in range(2):
        x = x - jnp.real(poly(x.astype(jnp.complex64))) / (
            jnp.real(dpoly(x)) + 1e-12
        )
    is_real = jnp.abs(jnp.imag(z)) < 1e-3 * (jnp.abs(jnp.real(z)) + 1.0)
    return x, is_real


def _triad(p1, p2, p3):
    """Orthonormal frame from 3 points (right-handed)."""
    u1 = p2 - p1
    u1 = u1 / (jnp.linalg.norm(u1) + 1e-12)
    u2 = jnp.cross(u1, p3 - p1)
    u2 = u2 / (jnp.linalg.norm(u2) + 1e-12)
    u3 = jnp.cross(u1, u2)
    return jnp.stack([u1, u2, u3], axis=1)  # (3, 3) columns


def _horn_3pt(P: jnp.ndarray, X: jnp.ndarray) -> Pose:
    """Rigid alignment world->camera from 3 point pairs: X_i = R (P_i - C).

    Triad construction, no SVD: P3P distances satisfy the inter-point
    distance constraints by construction, so the two 3-point clouds are
    exactly congruent and R = triad(X) @ triad(P)^T is exact. (The SVD-based
    Kabsch alignment costs ~1000 batched tiny SVDs per RANSAC call on TPU —
    this is the hot path of absolute-pose RANSAC.)
    """
    A = _triad(P[0], P[1], P[2])
    B = _triad(X[0], X[1], X[2])
    R = B @ A.T
    C = jnp.mean(P, axis=0) - R.T @ jnp.mean(X, axis=0)
    return Pose(R=R, C=C)


def p3p_grunert(
    X_world: jnp.ndarray,   # (3, 3) world points
    bearings: jnp.ndarray,  # (3, 3) unit bearing vectors in camera frame
) -> Tuple[Pose, jnp.ndarray]:
    """-> (poses stacked as Pose of (4,3,3)/(4,3), valid (4,) bool)."""
    P1, P2, P3 = X_world[0], X_world[1], X_world[2]
    f1, f2, f3 = bearings[0], bearings[1], bearings[2]

    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    cos_a = jnp.dot(f2, f3)
    cos_b = jnp.dot(f1, f3)
    cos_g = jnp.dot(f1, f2)

    b2 = jnp.maximum(b2, 1e-12)
    ab = a2 / b2
    cb = c2 / b2

    # u = N(v) / D(v); quartic Q(v) = N^2 - 2 cos_g N D + K1 D^2 = 0
    # N(v) = (1 - ab + cb) v^2 + 2 cos_b (ab - cb) v - (1 + ab - cb)
    # D(v) = 2 (cos_a v - cos_g)
    # K1(v) = -cb v^2 + 2 cb cos_b v + (1 - cb)
    N = [-(1.0 + ab - cb), 2.0 * cos_b * (ab - cb), (1.0 - ab + cb)]
    Dp = [-2.0 * cos_g, 2.0 * cos_a]
    K1 = [(1.0 - cb), 2.0 * cb * cos_b, -cb]

    NN = _polymul(N, N)                       # deg 4
    ND = _polymul(N, Dp)                      # deg 3
    DD = _polymul(Dp, Dp)                     # deg 2
    K1DD = _polymul(K1, DD)                   # deg 4
    q = [
        NN[0] - 2.0 * cos_g * ND[0] + K1DD[0],
        NN[1] - 2.0 * cos_g * ND[1] + K1DD[1],
        NN[2] - 2.0 * cos_g * ND[2] + K1DD[2],
        NN[3] - 2.0 * cos_g * ND[3] + K1DD[3],
        NN[4] + K1DD[4],
    ]
    coeffs = jnp.stack(q)

    v_roots, is_real = _durand_kerner_quartic(coeffs)

    def solution(v):
        Nv = (N[2] * v + N[1]) * v + N[0]
        Dv = Dp[1] * v + Dp[0]
        u = Nv / jnp.where(jnp.abs(Dv) < 1e-9, 1e-9, Dv)
        s1sq = b2 / jnp.maximum(1.0 + v * v - 2.0 * v * cos_b, 1e-12)
        s1 = jnp.sqrt(s1sq)
        s2 = u * s1
        s3 = v * s1
        Xc = jnp.stack([s1 * f1, s2 * f2, s3 * f3])
        pose = _horn_3pt(X_world, Xc)
        ok = (v > 0) & (u > 0) & (s1 > 0)
        return pose, ok

    poses, oks = jax.vmap(solution)(v_roots)
    valid = oks & is_real
    return poses, valid


p3p_grunert_batch = jax.vmap(p3p_grunert)
