"""Descriptor matching APIs.

Reference parity: FeatureMatcher.hpp policy wrapper with CPUMatcher /
GPUMatcher backends —
  computeMatchesPair  (CPUMatcher.hpp:67, GPUMatcher.hpp:165): frame-vs-frame
  matchSceneWithMap   (CPUMatcher.hpp:78, GPUMatcher.hpp:174): frame-vs-map
  matchMapFeatures    (CPUMatcher.hpp:56, GPUMatcher.hpp:157): map-vs-map
  setMapData          (GPUMatcher.hpp:110): resident map descriptor bank

Accept criteria: margin `second - best > threshold` (KORAL/CUDAK2NN parity,
thresholds: pairwise 40, map 60 — GPUMatcher.hpp / coloc_node.cpp:85) or Lowe
ratio `best < ratio * second` (AKAZE/OpenMVG parity, ratio 0.8). The map bank
staying device-resident is automatic here: MapDB.desc is an HBM array reused
across jit calls.
"""

from __future__ import annotations

import jax.numpy as jnp

from coloc_tpu.config import MatcherOptions
from coloc_tpu.ops import hamming
from coloc_tpu.types import Features, MapDB, Matches


def _accept(idx, best, second, q_valid, opts: MatcherOptions, threshold: int) -> Matches:
    if opts.mode == "ratio":
        ok = best.astype(jnp.float32) < opts.dist_ratio * second.astype(jnp.float32)
    else:
        ok = (second - best) > threshold
    # A real train hit has Hamming distance <= 512; anything larger means the
    # best "match" was an invalid (penalized) bank entry — reject it. Without
    # this, an all-invalid bank still passes the margin test because the
    # penalty shifts best and second equally.
    ok = ok & q_valid & (best <= 512)
    return Matches(idx=jnp.where(ok, idx, -1), best=best, second=second)


def match_pair(
    query: Features, train: Features, opts: MatcherOptions
) -> Matches:
    """Frame-vs-frame putative matching (computeMatchesPair parity)."""
    idx, best, second = hamming.hamming_2nn(
        query.desc, train.desc, query.valid, train.valid
    )
    return _accept(idx, best, second, query.valid, opts, opts.pair_margin_threshold)


def pack_map_bank(mapdb: MapDB):
    """Precompute the device-resident map descriptor bank (setMapData parity,
    GPUMatcher.hpp:110-117). Pass the result to match_with_map(bank=...) to
    skip the per-call unpack of the full landmark bank (~0.5 ms at 4096)."""
    return hamming.pack_bank(mapdb.desc, mapdb.valid)


def pack_map_bank_twostage(mapdb: MapDB):
    """Resident bank for the two-stage large-map matcher (coarse 128-bit
    group prefilter + exact 512-bit re-rank; see
    ops/hamming.hamming_2nn_twostage for the contract). Worth it past
    ~10^5 landmarks, where the brute-force matmul is bank-bound."""
    return hamming.pack_bank_twostage(mapdb.desc, mapdb.valid)


def match_with_map(query: Features, mapdb: MapDB, opts: MatcherOptions,
                   bank=None, twostage_bank=None) -> Matches:
    """Frame-vs-map matching (matchSceneWithMap / matchFeaturesWithMap parity).

    Returned idx indexes into the map landmark bank (mapdb.X / mapdb.desc),
    mirroring the reference's mapRegionIdx indirection (colocData.hpp:111-119).
    `bank`: optional precomputed resident bank from pack_map_bank.
    `twostage_bank`: optional pack_map_bank_twostage bank — the two-stage
    prefilter + exact-re-rank path for very large maps.
    """
    if twostage_bank is not None:
        idx, best, second = hamming.hamming_2nn_twostage(
            query.desc, query.valid, twostage_bank
        )
    elif bank is not None:
        idx, best, second = hamming.hamming_2nn_bank(
            query.desc, query.valid, bank
        )
    else:
        idx, best, second = hamming.hamming_2nn(
            query.desc, mapdb.desc, query.valid, mapdb.valid
        )
    return _accept(idx, best, second, query.valid, opts, opts.margin_threshold)


def match_maps(map_a: MapDB, map_b: MapDB, opts: MatcherOptions) -> Matches:
    """Map-vs-map descriptor matching (matchMapFeatures parity)."""
    idx, best, second = hamming.hamming_2nn(
        map_a.desc, map_b.desc, map_a.valid, map_b.valid
    )
    return _accept(idx, best, second, map_a.valid, opts, opts.margin_threshold)
