"""Persistent XLA compilation cache (TPU-era addition; no reference
counterpart — the reference's TF graphs retrace every process start).

First compile of the U-Net train step on a v5e is ~30-50 s; a preempted
and resumed training job, a restarted serving process, or a re-run eval
pays it again. Pointing the JAX persistent compilation cache at a
directory makes every warm restart skip straight to execution — the
cache key covers the program, compile options, and backend, so it is
safe to share one directory across models and entry points.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str) -> None:
    """Cache compiled XLA executables under `path` across processes.

    Must run before the first jitted computation to benefit it (later
    calls still cache subsequent compiles). Thresholds are zeroed so even
    fast-compiling programs (serving buckets, eval windows) persist.
    """
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
