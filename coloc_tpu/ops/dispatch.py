"""Runtime backend dispatch for kernels.

- On TPU: Pallas kernels (optionally forced off with COLOC_TPU_PALLAS=0).
- On CPU (tests, virtual multi-device meshes): XLA reference path; Pallas
  kernels can still be exercised via interpreter mode (COLOC_TPU_INTERPRET=1).
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    if os.environ.get("COLOC_TPU_PALLAS", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Whether pallas_call should run interpreted (CPU testing)."""
    return os.environ.get("COLOC_TPU_INTERPRET", "0") == "1" and (
        jax.default_backend() != "tpu"
    )
