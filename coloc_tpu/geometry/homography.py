"""Homography estimation + Euclidean decomposition + chirality test.

Reference parity: RobustMatcher.hpp model 'H' path — 4-point DLT kernel
(:191-206), OpenCV decomposeHomographyMat (:106-126), and
performChiralityTest (:39-104): triangulate the matches under each motion
candidate, count points-in-front, accept the best candidate only if
second_best/best vote ratio < 0.7 (:100-103).

Decomposition uses the Faugeras/Lustman construction (the same family of
solutions OpenCV returns), fully batched: SVD of H^T H, two rotation/normal
candidates + sign flips = 4 motions.

All coords are normalized (unit-focal, undistorted).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp



def four_point(
    x1: jnp.ndarray, x2: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """DLT homography from N>=4 correspondences; returns H (3,3), x2 ~ H x1.

    `weights` (M,) enables a masked least-squares refit over an inlier set
    (rows scaled by sqrt(w))."""
    x, y = x1[:, 0], x1[:, 1]
    u, v = x2[:, 0], x2[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    if weights is not None:
        sw = jnp.sqrt(weights)[:, None]
        r1 = r1 * sw
        r2 = r2 * sw
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 9)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    H = vecs[:, 0].reshape(3, 3)
    return H / (H[2, 2] + jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, 0.0))


four_point_batch = jax.vmap(four_point)


def transfer_error_sq(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer error ||x2 - pi(H x1)||^2, (M,)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    p = h1 @ H.T
    w = p[:, 2]
    bad = jnp.abs(w) < 1e-9
    proj = p[:, :2] / jnp.where(bad, 1.0, w)[:, None]
    err = jnp.sum((proj - x2) ** 2, axis=-1)
    return jnp.where(bad, 1e12, err)


def transfer_error_sq_batch(
    Hs: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """All-models forward transfer errors -> (Hm, M) in one shot.

    Division-cleared form of transfer_error_sq (same values to f32
    rounding): with [u, v, w] = H h1,
      err = ((u - x2x w)^2 + (v - x2y w)^2) / w^2
    so each projective coordinate plane is one (Hm, 3) x (3, M) matmul —
    model side on the LEFT so the result lands directly in (Hm, M) layout
    (no (M, Hm, 3) intermediate; same scheme as the batched epipolar / P3P
    scorers). precision=jax.lax.Precision.DEFAULT gives single-pass bf16
    matmuls for ladder RANKING only.
    """
    h1t = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1).T  # (3, M)
    U = jnp.matmul(Hs[:, 0], h1t, precision=precision)  # (Hm, M)
    V = jnp.matmul(Hs[:, 1], h1t, precision=precision)
    W = jnp.matmul(Hs[:, 2], h1t, precision=precision)
    bad = jnp.abs(W) < 1e-9
    Wc = jnp.where(bad, 1.0, W)
    du = U - x2[:, 0][None, :] * W
    dv = V - x2[:, 1][None, :] * W
    err = (du * du + dv * dv) / (Wc * Wc)
    return jnp.where(bad, 1e12, err)


def decompose_homography(
    H: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    chirality_ratio: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Calibrated H -> (R, t_unit, n, chirality_ok) best motion by voting.

    Faugeras/Lustman: with H scaled so the middle singular value of H is 1,
    the two base solutions come from the eigen-structure of H^T H; together
    with sign flips that is 4 candidates (plane in front/behind x motion
    direction). Chirality voting mirrors RobustMatcher.hpp:39-104.
    """
    # fix overall sign so x2^T H x1 > 0 for the (masked) majority
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    s = jnp.sum(jnp.sum(h2 * (h1 @ H.T), axis=-1) * mask)
    H = H * jnp.where(s < 0, -1.0, 1.0)

    _, sv, _ = jnp.linalg.svd(H)
    Hn = H / jnp.maximum(sv[1], 1e-12)

    # eigen-structure of Hn^T Hn (symmetric): eigenvalues s1^2 >= 1 >= s3^2
    evals, evecs = jnp.linalg.eigh(Hn.T @ Hn)  # ascending
    s3sq, s1sq = jnp.maximum(evals[0], 1e-12), jnp.maximum(evals[2], 1e-12)
    v1 = evecs[:, 2]
    v2 = evecs[:, 1]
    v3 = evecs[:, 0]

    denom = jnp.maximum(s1sq - s3sq, 1e-12)
    a = jnp.sqrt(jnp.clip(1.0 - s3sq, 0.0, None) / denom)
    b = jnp.sqrt(jnp.clip(s1sq - 1.0, 0.0, None) / denom)
    u1 = a * v1 + b * v3
    u2 = a * v1 - b * v3

    def motion(u):
        n = jnp.cross(v2, u)
        U = jnp.stack([v2, u, n], axis=1)
        Hv2 = Hn @ v2
        Hu = Hn @ u
        W = jnp.stack([Hv2, Hu, jnp.cross(Hv2, Hu)], axis=1)
        R = W @ U.T
        t = (Hn - R) @ n
        return R, t, n

    R1, t1, n1 = motion(u1)
    R2, t2, n2 = motion(u2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])

    def votes(R, t):
        # closed-form two-view depths via cross products (see
        # essential.decompose_essential — no per-point eigensolve)
        tn = t / (jnp.linalg.norm(t) + 1e-12)
        Rx1 = h1 @ R.T
        cr = jnp.cross(h2, Rx1)
        ct = jnp.cross(h2, jnp.broadcast_to(tn, h2.shape))
        z1 = -jnp.sum(cr * ct, axis=-1) / (jnp.sum(cr * cr, axis=-1) + 1e-12)
        z2 = (z1[:, None] * Rx1 + tn[None, :])[:, 2]
        return jnp.sum((z1 > 0) & (z2 > 0) & mask)

    vote_counts = jnp.stack([votes(Rs[i], ts[i]) for i in range(4)])
    order = jnp.argsort(-vote_counts)
    best, second = order[0], order[1]
    ratio = vote_counts[second].astype(jnp.float32) / jnp.maximum(
        vote_counts[best].astype(jnp.float32), 1.0
    )
    ok = ratio < chirality_ratio  # RobustMatcher.hpp:100-103 gate
    t_best = ts[best] / (jnp.linalg.norm(ts[best]) + 1e-12)
    return Rs[best], t_best, ns[best], ok
