"""Persistent XLA compilation cache, on by default at process entrypoints.

The reference pays no compile cost (C++ ahead-of-time); our per-process jit
compiles are the one place the TPU build is structurally slower at startup
(headline graph ~6 s, session/serving graphs tens of seconds on first
launch). JAX's persistent compilation cache amortizes that to a disk read,
so `cli.py` and `serve.py` enable it by default — the same mechanism the
driver's multi-chip dryrun child already uses (__graft_entry__.py).

Opt-out / override:
  COLOC_COMPILE_CACHE=0          disable entirely
  COLOC_COMPILE_CACHE_DIR=PATH   cache directory (default
                                 ~/.cache/coloc_tpu/xla)
  JAX_COMPILATION_CACHE_DIR      if already set (env or jax.config), we
                                 leave the user's setting alone

Measured cold->warm on the round-5 bench chip (see ROUNDLOG round 5):
`python -m coloc_tpu.serve` runner compile and the CLI session graphs drop
from tens of seconds of XLA work to seconds of cache reads on the second
launch of the same program shapes.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use, or None when disabled (opt-out via
    COLOC_COMPILE_CACHE=0) or unavailable. Safe to call before or after the
    first jit: jax.config.update takes effect for subsequent compiles.
    """
    if os.environ.get("COLOC_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return None

    import jax

    # Respect an explicit user/env configuration.
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current

    path = (
        cache_dir
        or os.environ.get("COLOC_COMPILE_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "coloc_tpu", "xla"
        )
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every program: the session/serving graphs the entrypoints
        # build are all worth keeping, and small entries are cheap.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - unwritable HOME etc.
        return None
    return path
