"""Host-dispatch runs must never import jax.

``import jax`` costs ~1.8 s on the deployment host, and the axon
sitecustomize preload adds it to EVERY python start when
``PALLAS_AXON_POOL_IPS`` is set.  Panels below the work threshold are
counted entirely on the host (core/pipeline._auto_prefers_host), so the
whole run — parse, index, map, pileup, count, print — must complete
without touching jax.  ``PHYLONIUM_TPU_EXPECT_NO_JAX=1`` turns a
violation into exit code 70 (phylonium_tpu/__main__.py), and the
deferred-plugin launcher (move ``PALLAS_AXON_POOL_IPS`` into
``PHYLONIUM_TPU_DEFER_AXON``) lets device-bound paths re-arm the TPU
plugin lazily (utils/platform.ensure_device_plugin).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def small_panel(tmp_path):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 4000)
    files = []
    for k in range(3):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.02 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"L{k}.fasta"
        p.write_bytes(b">L%d\n" % k + seq + b"\n")
        files.append(str(p))
    return files


def _cli_env(**extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # deferred-plugin launch
    env.update(extra)
    return env


def test_host_run_never_imports_jax(small_panel):
    r = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu", "--progress=never",
         *small_panel],
        capture_output=True, timeout=300,
        env=_cli_env(PHYLONIUM_TPU_EXPECT_NO_JAX="1"),
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"jax was imported" not in r.stderr
    # sanity: a real matrix came out
    assert r.stdout.startswith(b"3\n")


def test_host_run_verbose_flags_never_import_jax(small_panel):
    """-v -v, -b, ani — the decorated host paths stay jax-free too."""
    r = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu", "--progress=never",
         "-v", "-v", "-b", "2", "--distance", "ani", *small_panel],
        capture_output=True, timeout=300,
        env=_cli_env(PHYLONIUM_TPU_EXPECT_NO_JAX="1"),
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"jax was imported" not in r.stderr


def test_deferred_launch_output_identical(small_panel):
    """The deferred-plugin launch changes startup cost, never bytes."""
    r_plain = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu", "--progress=never",
         *small_panel],
        capture_output=True, timeout=300, env=_cli_env(),
    )
    env_norm = dict(os.environ)
    env_norm["PYTHONPATH"] = REPO + ":" + env_norm.get("PYTHONPATH", "")
    r_norm = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu", "--progress=never",
         *small_panel],
        capture_output=True, timeout=300, env=env_norm,
    )
    assert r_plain.returncode == 0 and r_norm.returncode == 0
    assert r_plain.stdout == r_norm.stdout


def test_ensure_device_plugin_noop_without_deferral(monkeypatch):
    """Nothing stashed -> no env mutation, no sitecustomize reload."""
    import phylonium_tpu.utils.platform as plat

    monkeypatch.setattr(plat, "_plugin_armed", False)
    monkeypatch.delenv("PHYLONIUM_TPU_DEFER_AXON", raising=False)
    before = os.environ.get("PALLAS_AXON_POOL_IPS")
    plat.ensure_device_plugin()
    assert os.environ.get("PALLAS_AXON_POOL_IPS") == before


def test_backends_initialized_nonblocking_under_held_init_lock():
    """A wedged tunnel handshake holds jax's global _backend_lock for
    minutes (make_c_api_client never returns); backends_initialized()
    must not queue behind it — observed live: _should_stream blocked a
    1000-genome run >600 s behind the prewarm thread's hung init.  An
    init in flight means the handshake has NOT completed, so a held
    lock is immediately False."""
    import time

    jax = pytest.importorskip("jax")  # noqa: F841  (forces the import)
    from jax._src import xla_bridge

    from phylonium_tpu.utils.platform import backends_initialized

    assert xla_bridge._backend_lock.acquire(blocking=False)
    try:
        t0 = time.time()
        assert backends_initialized() is False
        assert time.time() - t0 < 1.0
    finally:
        xla_bridge._backend_lock.release()


def test_no_backend_error_classifier():
    from phylonium_tpu.core.pipeline import _is_no_backend_error

    assert _is_no_backend_error(
        RuntimeError("Backend 'axon' is not in the list of known "
                     "backends: cpu.")
    )
    assert _is_no_backend_error(
        RuntimeError("Unable to initialize backend 'axon'")
    )
    assert not _is_no_backend_error(
        RuntimeError("ABORTED: TPU backend error")
    )
    assert not _is_no_backend_error(ValueError("shape mismatch"))
