"""Persistent-cache key portability guards (utils/cache.py).

Round 2 found two jax key leaks that made the shipped executable store
unable to ever hit: the cache key embedded its own directory path (via
an injected xla_gpu_per_fusion_autotune_cache_dir compile option) and
the caller's script path (traceback frames in debug locations).  These
tests pin the fixes so a jax upgrade cannot silently revert them.
"""

import os

import numpy as np
import pytest

from phylonium_tpu.utils.cache import (
    enable_compile_cache,
    seed_from_package,
)


def test_compile_options_do_not_embed_cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PHYLONIUM_TPU_CACHE_DIR", str(tmp_path / "cachedir"))
    import phylonium_tpu.utils.cache as cache_mod

    monkeypatch.setattr(cache_mod, "_enabled", False)
    enable_compile_cache(force=True)

    import jax
    import jax.numpy as jnp
    from jax._src import compilation_cache as cc

    captured = []
    orig = cc.get_cache_key

    def spy(module, devices, compile_options, backend, *a, **kw):
        captured.append(compile_options.SerializeAsString())
        return orig(module, devices, compile_options, backend, *a, **kw)

    monkeypatch.setattr(cc, "get_cache_key", spy)

    @jax.jit
    def f(x):
        return x * 3 + 1

    jax.block_until_ready(f(jnp.ones((8, 128))))
    assert captured, "compilation did not consult the cache"
    needle = str(tmp_path).encode()
    for ser in captured:
        assert needle not in ser, (
            "cache key would embed its own directory path again "
            "(jax_persistent_cache_enable_xla_caches regressed?)"
        )


def test_location_flags_pinned():
    import phylonium_tpu.utils.cache  # noqa: F401
    import jax

    enable_compile_cache(force=True)
    assert jax.config.jax_traceback_in_locations_limit == 0
    assert not jax.config.jax_include_full_tracebacks_in_locations


def test_seed_from_package_copies_once(tmp_path):
    n = seed_from_package(str(tmp_path))
    store = os.path.join(
        os.path.dirname(os.path.dirname(__file__)),
        "phylonium_tpu",
        "data",
        "compile_cache",
    )
    if not os.path.isdir(store) or not os.listdir(store):
        pytest.skip("no shipped store in this checkout")
    assert n == len(
        [f for f in os.listdir(store) if f.endswith("-cache")]
    )
    assert seed_from_package(str(tmp_path)) == 0  # idempotent
