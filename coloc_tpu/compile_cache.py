"""Persistent XLA compilation cache — ONE implementation for the library.

The reference pays no compile cost (C++ ahead-of-time); our per-process jit
compiles are the one place the TPU build is structurally slower at startup
(headline graph ~5 s warm-host, session/serving graphs tens of seconds on a
first launch). JAX's persistent compilation cache amortizes that to a disk
read.

Two call sites share this module:
  - `coloc_tpu/__init__` calls `enable()` on import for axon/TPU sessions
    (library users get the cache with no ceremony);
  - `cli.py` / `serve.py` / `bench.py` call it explicitly at their
    entrypoints (harmless re-entry — enable() is idempotent).

TPU-only BY DESIGN: cached XLA:CPU AOT results can reload with mismatched
machine-feature baselines (observed "+prefer-no-gather not supported"
warnings with a SIGILL caveat), so CPU sessions always compile fresh.

Opt-out / override:
  COLOC_COMPILE_CACHE=0            disable (legacy alias:
                                   COLOC_TPU_NO_COMPILE_CACHE=1)
  COLOC_COMPILE_CACHE_DIR=PATH     cache directory (default
                                   ~/.cache/coloc_tpu_xla)
  JAX_COMPILATION_CACHE_DIR        if set (env or jax.config), the user's
                                   setting wins

Measured on the round-5 bench chip: the CLI synthetic session drops from
84.3 s (fresh cache dir) to 52.2 s total wall including frame processing on
the second launch, and bench.py's headline 'compile=' falls from 27.2 s to
4.8 s on a cache hit (see ROUNDLOG round 5).
"""

from __future__ import annotations

import os


def _disabled() -> bool:
    if os.environ.get("COLOC_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return True
    if os.environ.get("COLOC_TPU_NO_COMPILE_CACHE", "0") == "1":
        return True
    return False


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent, TPU-only).

    Returns the cache directory in use, or None when disabled, not on a
    TPU-backed session, or unavailable. Safe to call before or after the
    first jit: jax.config.update takes effect for subsequent compiles.
    """
    if _disabled():
        return None

    import jax

    # TPU-only gate without forcing backend init: the platform string is
    # already decided (env JAX_PLATFORMS, or jax.config set by an
    # entrypoint's --cpu handling).
    platforms = str(
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    ).lower()
    if not ("axon" in platforms or "tpu" in platforms):
        return None

    # Respect an explicit user/env configuration.
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current

    path = (
        cache_dir
        or os.environ.get("COLOC_COMPILE_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "coloc_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every program: the session/serving graphs the entrypoints
        # build are all worth keeping, and small entries are cheap.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - unwritable HOME / older jax
        return None
    return path
