"""coloc_tpu — TPU-native collaborative visual localization framework.

A greenfield JAX/XLA/Pallas re-design of the capabilities of saihv/coloc
(CoLoC: collaborative localization for micro aerial vehicles). The reference
is a host-driven C++/CUDA pipeline; this framework keeps all per-frame math
resident on device with fixed shapes and validity masks, batches every
irregular loop (RANSAC hypotheses, keypoints, landmarks, drones), and shards
the drone axis over a `jax.sharding.Mesh`.

Module map (reference parity noted per module docstring):
  config      — declarative session config (reference: colocParams.hpp, colocData.hpp options)
  types       — fixed-capacity pytree data model (reference: colocData.hpp)
  geometry/   — SO3/SE3, cameras, triangulation, minimal solvers
  ransac      — batched AC-RANSAC harness (reference: RobustMatcher.hpp)
  ops/        — Pallas/XLA kernels: Hamming 2-NN, pyramid, FAST, descriptors
  frontend    — detect+describe pipeline (reference: GPUDetector.hpp / KORAL)
  matching    — descriptor matching APIs (reference: FeatureMatcher/CPUMatcher/GPUMatcher)
  sfm/        — tracks, triangulation, bundle adjustment, localization
  fusion/     — Kalman filter bank, inverse covariance intersection
  parallel/   — drone-axis mesh sharding and collectives
  io/         — disk ingest, calibration parsing, CSV/PLY logging
  session     — orchestrator (reference: coloc.hpp ColoC)
  serving     — batched multi-stream localization server (ServingEngine)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code is precision-critical: on TPU, float32 matmuls/einsums lower
# to bfloat16 MXU passes under the DEFAULT matmul precision, which silently
# degrades triangulation, P3P triads, and BA normal equations (measured: map
# localization error 0.04 deg on CPU vs 2.5 deg on TPU before this). Force
# full f32. The hot kernels are unaffected: the Hamming matcher uses int8
# dot_general with int32 accumulation, which this setting does not touch.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles of the big fused graphs take
# 15-130 s (remote-compile path); the cache cuts warm starts to seconds.
# ONE implementation (policy, TPU-only gate, opt-outs, default dir) lives
# in coloc_tpu/compile_cache.py; entrypoints re-call enable() harmlessly.
from coloc_tpu import compile_cache as _compile_cache

_compile_cache.enable()

from coloc_tpu.config import (  # noqa: F401
    ColocConfig,
    DetectorOptions,
    MatcherOptions,
)
