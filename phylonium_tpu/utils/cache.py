"""Persistent XLA compilation cache.

The fused Pallas kernel takes tens of seconds to compile at full genome
shapes; caching compiled executables on disk makes every run after the
first start instantly.  Safe to call multiple times.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    if path is None:
        path = os.environ.get(
            "PHYLONIUM_TPU_CACHE_DIR",
            os.path.expanduser("~/.cache/phylonium_tpu/jax"),
        )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
        _enabled = True
    except Exception:
        pass
