"""Batched fixed-shape RANSAC harness.

Reference parity: OpenMVG ACRANSAC as driven by RobustMatcher.hpp (256
iterations, RobustMatcher.hpp:34) and Localizer.hpp (:84). The host loop
"sample -> solve -> score -> keep best" becomes: sample ALL B minimal sets at
once, vmap the minimal solver (which may emit several candidate models per
sample), score every model against every correspondence in one (B, M)
computation, argmax inlier count (SURVEY.md §7.1.4).

Deviation (documented): scoring uses a fixed inlier threshold rather than
AC-RANSAC's adaptive NFA threshold; the acceptance gate is the same
`inliers >= inlier_multiple x minimal sample` rule the reference applies on
top of AC-RANSAC (RobustMatcher.hpp:147,175,210). An a-contrario scored
variant can be layered on the same batched machinery later.

Degenerate-sample hygiene: duplicate indices inside one minimal sample simply
produce degenerate models that score few inliers — they lose the argmax, so no
rejection branch is needed (fixed-shape philosophy).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray      # best model parameters (pytree leaf stack)
    inliers: jnp.ndarray    # (M,) bool
    n_inliers: jnp.ndarray  # () int32
    success: jnp.ndarray    # () bool


def sample_indices(
    key: jax.Array, valid: jnp.ndarray, num_samples: int, sample_size: int
) -> jnp.ndarray:
    """(B, S) indices drawn from the valid entries of a fixed-size bank.

    Permutation-free trick: argsort(~valid) packs valid indices first; draw
    uniform [0, n_valid) positions into that packed list. Duplicates within a
    sample are allowed (they yield degenerate, losing models).
    """
    order = jnp.argsort(~valid)  # valid entries first, stable
    n_valid = jnp.sum(valid.astype(jnp.int32))
    u = jax.random.uniform(key, (num_samples, sample_size))
    pos = jnp.floor(u * jnp.maximum(n_valid, 1).astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.clip(pos, 0, jnp.maximum(n_valid - 1, 0))
    return order[pos]


def ransac(
    key: jax.Array,
    data: Tuple[jnp.ndarray, ...],
    valid: jnp.ndarray,
    solver: Callable,         # (sampled data...) -> (models, model_valid)
    scorer: Callable,         # (model, data...) -> (M,) squared residuals
    sample_size: int,
    num_hypotheses: int,
    threshold_sq: float,
    inlier_multiple: float = 2.5,
) -> RansacResult:
    """Generic batched RANSAC.

    solver: takes per-sample gathered data (each (S, ...)) and returns
      (models, valid) where models is a pytree with leading axis H (candidate
      models per sample, H>=1) and valid is (H,) bool.
    scorer: takes one model pytree + full data, returns squared residuals (M,).
    """
    M = valid.shape[0]
    idx = sample_indices(key, valid, num_hypotheses, sample_size)  # (B, S)

    gathered = tuple(jax.tree_util.tree_map(lambda a: a[idx], d) for d in data)
    models, model_valid = jax.vmap(solver)(*gathered)  # leaves (B, H, ...), (B, H)

    flat_models = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), models
    )
    flat_valid = model_valid.reshape(-1)  # (B*H,)

    def score_one(model):
        res = scorer(model, *data)  # (M,)
        inl = (res < threshold_sq) & valid
        return jnp.sum(inl.astype(jnp.int32))

    counts = jax.vmap(score_one)(flat_models)  # (B*H,)
    counts = jnp.where(flat_valid, counts, -1)
    best = jnp.argmax(counts)

    best_model = jax.tree_util.tree_map(lambda a: a[best], flat_models)
    res = scorer(best_model, *data)
    inliers = (res < threshold_sq) & valid
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    success = n_inl >= jnp.int32(inlier_multiple * sample_size)
    return RansacResult(
        model=best_model, inliers=inliers, n_inliers=n_inl, success=success
    )
