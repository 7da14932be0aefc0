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
