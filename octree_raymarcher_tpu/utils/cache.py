"""Persistent XLA compilation cache.

TPU compiles through this machine's tunnel are slow (the 1080p frame is
~15 min cold, see docs/PERF_NOTES.md); jax's persistent compilation cache
makes repeat runs near-instant.  Call once, before the first jit, from any
entry point (bench scripts, demo, driver surface).
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``
    (default: .jax_cache/ next to the repo root).  Idempotent.

    CPU backends are skipped: XLA:CPU caches AOT code pinned to the compile
    machine's feature flags, and reloading it warns (and can SIGILL) on
    feature mismatch — CPU compiles are fast enough to not need the cache."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return ""
    except Exception:  # backend not initializable yet — don't block the cache
        pass
    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, immediately — the default thresholds skip "fast"
    # compiles, but through the tunnel even those are seconds.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
