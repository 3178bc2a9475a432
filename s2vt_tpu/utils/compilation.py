"""Persistent XLA compilation cache for the CLI entry points.

Compiles through the tunneled TPU runtime cost 40-250s each; with the
on-disk cache a warm run spends ~1s per hit, so repeat train/eval/extract
invocations (and the driver's bench runs) skip straight to execution. The
cache key includes the computation, compile options, and runtime version,
so it is safe across code changes — edits simply miss and recompile.

Must be called before the first jax backend use. Opt out with
S2VT_NO_COMPILE_CACHE=1 (e.g. when the cache dir is on a slow/readonly
filesystem).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Returns True when the cache was enabled."""
    if os.environ.get("S2VT_NO_COMPILE_CACHE"):
        return False
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/s2vt_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False  # older jax without the knobs: just compile
