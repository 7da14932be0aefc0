"""Map-alignment utilities.

Reference parity: colocUtils.hpp —
  computeScaleDifference (:184-211): mean over CONSECUTIVE common-feature
    pairs of the inter-landmark distance ratio between two maps (monocular
    scale alignment between independently-built maps).
  rescaleMap (:213-223): scale landmark positions and pose centers.
  handlePairs (:58-61): exhaustive pair enumeration.
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Tuple

import jax.numpy as jnp

from coloc_tpu.types import MapDB, Matches


def exhaustive_pairs(n: int) -> List[Tuple[int, int]]:
    """handlePairs parity: all (i, j) with i < j."""
    return list(combinations(range(n), 2))


def compute_scale_difference(
    map_a: MapDB, map_b: MapDB, matches: Matches
) -> jnp.ndarray:
    """Scale of map_a relative to map_b from common landmarks.

    Follows the reference's estimator: ratio of distances between CONSECUTIVE
    matched landmark pairs, averaged (colocUtils.hpp:193-209). Masked,
    fixed-shape; returns 1.0 when fewer than 2 common features (reference
    :186-189 returns 1.0 when empty).
    """
    mask = matches.mask & map_a.valid
    Xa = map_a.X
    Xb = map_b.X[matches.idx]

    # consecutive valid pairs: compress valid entries to the front
    order = jnp.argsort(~mask)  # valid first, stable
    Xa_s = Xa[order]
    Xb_s = Xb[order]
    m_s = mask[order]

    d_a = jnp.linalg.norm(Xa_s[1:] - Xa_s[:-1], axis=1)
    d_b = jnp.linalg.norm(Xb_s[1:] - Xb_s[:-1], axis=1)
    pair_ok = m_s[1:] & m_s[:-1] & (d_b > 1e-9)
    ratios = jnp.where(pair_ok, d_a / jnp.maximum(d_b, 1e-9), 0.0)
    n = jnp.sum(pair_ok.astype(jnp.float32))
    scale = jnp.sum(ratios) / jnp.maximum(n, 1.0)
    return jnp.where(n >= 1.0, scale, 1.0)


def rescale_map(X: jnp.ndarray, Cs: jnp.ndarray, scale) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rescaleMap parity: landmarks and camera centers scaled by `scale`."""
    return X * scale, Cs * scale


def align_maps(map_a: MapDB, map_b: MapDB, opts, min_matches: int = 12):
    """Sim(3) alignment of map_b into map_a's world frame from map-to-map
    descriptor matches: returns (s, R, t, n_inliers, matched_b) with
    X_a ~= s R X_b + t, or None when fewer than `min_matches` common
    landmarks survive.

    Generalizes the reference's scale-only alignment
    (computeScaleDifference + rescaleMap, colocUtils.hpp:184-223, which
    assumes both maps share an orientation because interPoseEstimator
    already rotated the temp scene): independently-built session maps share
    neither scale nor orientation nor origin, so the matched 3D-3D landmark
    pairs are fit with the Umeyama closed-form similarity instead. One
    reweighting round drops pairs whose residual exceeds 3x the median —
    a wrong descriptor match is a 3D outlier that least squares would
    otherwise absorb (host-side numpy; map merging is an infrequent event,
    like the reference's updateMap).

    `matched_b` marks map_b entries consumed by a match (duplicates of
    map_a landmarks — a merge keeps map_a's copy, first-observation
    convention, colocData.hpp:111-119).
    """
    import numpy as np

    from coloc_tpu import matching, metrics

    m = matching.match_maps(map_a, map_b, opts)
    idx = np.asarray(m.idx)
    vb = np.asarray(map_b.valid)
    safe = np.clip(idx, 0, vb.size - 1)
    ok = np.asarray(m.mask) & np.asarray(map_a.valid) & vb[safe]
    if int(ok.sum()) < min_matches:
        return None
    Xa = np.asarray(map_a.X)[ok]
    Xb = np.asarray(map_b.X)[safe[ok]]
    s, R, t = metrics.umeyama_alignment(Xb, Xa, with_scale=True)
    res = np.linalg.norm((s * (R @ Xb.T)).T + t - Xa, axis=1)
    keep = res <= 3.0 * max(float(np.median(res)), 1e-9)
    if int(keep.sum()) >= min_matches and not keep.all():
        s, R, t = metrics.umeyama_alignment(Xb[keep], Xa[keep],
                                            with_scale=True)
    matched_b = np.zeros(vb.size, bool)
    matched_b[safe[ok]] = True
    return s, R, t, int(keep.sum()), matched_b


def guided_match_residuals(
    K1: jnp.ndarray,           # (3, 3) intrinsics of map A's anchor view
    K2: jnp.ndarray,           # (3, 3) intrinsics of map B's anchor view
    R_diff: jnp.ndarray,       # (3, 3) known relative rotation between maps
    t_diff: jnp.ndarray,       # (3,) known relative translation
    uv1: jnp.ndarray,          # (M, 2) map-A observation pixels
    uv2: jnp.ndarray,          # (M, 2) matched map-B observation pixels
    mask: jnp.ndarray,         # (M,) bool
) -> jnp.ndarray:
    """Epipolar residuals of map-to-map matches under a KNOWN relative pose.

    RobustMatcher::matchMaps parity (:241-370): builds the fundamental matrix
    from the known rotation/translation difference,
    F = K2^-T [t]_x R K1^-1 (:318-328), evaluates the per-match epipolar
    residual x2^T F x1, and reports it (the reference logs these to
    guidedmatches2.txt and currently passes all matches through :348-362 —
    we reproduce the diagnostic; thresholding is the caller's choice).
    """
    from coloc_tpu.geometry.essential import hat3

    F = jnp.linalg.inv(K2).T @ hat3(t_diff) @ R_diff @ jnp.linalg.inv(K1)
    h1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)
    h2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=-1)
    res = jnp.abs(jnp.sum(h2 * (h1 @ F.T), axis=-1))
    return jnp.where(mask, res, 0.0)
