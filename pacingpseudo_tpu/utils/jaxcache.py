"""Persistent XLA compilation cache for every driver.

Round-3's LVSC-scale rehearsal paid a 774 s epoch-0 compile (~12% of the
whole 40-epoch run) because only bench.py/profile_step.py configured
``jax_compilation_cache_dir`` — the CLI drivers compiled from scratch on
every process start (and on every --max_restarts auto-resume).  Call
``enable_persistent_cache()`` before the first jit in every entry point.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str = "") -> str:
    """Point JAX's persistent compilation cache at the repo-level dir.

    Override with ``PACING_JAX_CACHE`` (empty string disables).  Safe to
    call multiple times; returns the cache dir in effect ('' if disabled).
    """
    import jax

    if not path:
        env = os.environ.get("PACING_JAX_CACHE")
        if env is not None:
            path = env
        else:
            # repo root = two levels above this package
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    if not path:
        return ""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return ""
    return path
