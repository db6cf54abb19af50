"""Transient-device-abort resilience.

A tunnelled TPU backend can abort mid-run and succeed on the very next
attempt (observed live: "ABORTED: TPU backend error" failed a parity run
that passed clean on rerun).  The production counting dispatch must
survive this: retry once on a reinitialized backend, then fall back to
the bit-identical host path — exit code 0, stdout byte-identical, only
stderr warns.  The reference binary has no failure mode here
(`src/process.cxx:524` runs entirely on host); neither may we.

Faults are injected via PHYLONIUM_TPU_INJECT_ABORT=N (the next N device
counting calls raise a simulated transient abort).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

import phylonium_tpu.core.pipeline as pipe
from phylonium_tpu.config import RunConfig
from phylonium_tpu.core.pipeline import pair_counts
from phylonium_tpu.ops.match_table import pair_counts_numpy


@pytest.fixture
def states(rng):
    return rng.integers(0, 11, size=(12, 4096), dtype=np.uint8)


@pytest.fixture
def inject(monkeypatch):
    """Arm N injected aborts (module-level countdown, reset after)."""

    def arm(n: int):
        monkeypatch.setenv(pipe._INJECT_ENV, str(n))
        monkeypatch.setattr(pipe, "_inject_remaining", None)

    yield arm
    pipe._inject_remaining = None


def _expect(states):
    return pair_counts_numpy(states)


def test_transient_error_classifier():
    assert pipe._is_transient_device_error(
        RuntimeError("ABORTED: TPU backend error (Aborted).")
    )
    assert pipe._is_transient_device_error(
        RuntimeError("UNAVAILABLE: Socket closed")
    )
    # the tunnelled compile service's transport faults are transient...
    assert pipe._is_transient_device_error(
        RuntimeError("INTERNAL: http://127.0.0.1:8083/remote_compile: "
                     "HTTP 500: tpu_compile_helper subprocess exit")
    )
    # ...but compiler INTERNAL defects are NOT — they must raise
    assert not pipe._is_transient_device_error(
        RuntimeError("INTERNAL: Mosaic failed to compile module")
    )
    # genuine defects re-raise
    assert not pipe._is_transient_device_error(ValueError("ABORTED"))
    assert not pipe._is_transient_device_error(
        RuntimeError("shape mismatch in dot_general")
    )
    assert not pipe._is_transient_device_error(KeyboardInterrupt())


def test_explicit_device_retry_succeeds(states, inject, capsys):
    """One abort: the retry (on a reinitialized backend) succeeds."""
    inject(1)
    cfg = RunConfig(count_backend="device", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    err = capsys.readouterr().err
    assert "transient TPU backend error" in err
    assert "retrying" in err


def test_explicit_device_falls_back_to_host(states, inject, capsys):
    """Two aborts: retry also fails -> bit-identical host fallback."""
    inject(2)
    cfg = RunConfig(count_backend="device", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    assert "host" in capsys.readouterr().err


def test_mesh_path_falls_back_to_host(states, inject, capsys):
    inject(2)
    cfg = RunConfig(mesh="2,4", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    assert "host" in capsys.readouterr().err


def test_nontransient_error_still_raises(states, inject, monkeypatch):
    """A genuine defect in the device path keeps its traceback."""

    def boom(s, cfg, progress=None):
        raise RuntimeError("shape mismatch in dot_general")

    monkeypatch.setattr(pipe, "_pair_counts_device", boom)
    cfg = RunConfig(count_backend="device", progress="never")
    with pytest.raises(RuntimeError, match="shape mismatch"):
        pair_counts(states, cfg)


def test_full_cli_survives_injected_aborts(tmp_path, inject, capsys):
    """Full CLI with --count-backend device under 2 injected aborts:
    exit 0 and stdout byte-identical to the clean run."""
    from phylonium_tpu.cli import main

    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, 3000)
    files = []
    for k in range(3):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.02 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"R{k}.fasta"
        p.write_bytes(b">R%d\n" % k + seq + b"\n")
        files.append(str(p))

    def run():
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(
                ["--progress=never", "--count-backend=device", *files]
            )
        return rc, out.getvalue()

    rc_clean, out_clean = run()
    assert rc_clean == 0
    inject(2)
    rc_fault, out_fault = run()
    assert rc_fault == 0
    assert out_fault == out_clean
    assert "transient TPU backend error" in capsys.readouterr().err


def test_hybrid_map_falls_back_on_transient_abort(tmp_path, capsys, monkeypatch):
    """--map-backend hybrid under a transient abort maps on the host
    path instead, byte-identical output."""
    import phylonium_tpu.core.hybrid_map as hm
    from phylonium_tpu.cli import main

    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 2500)
    files = []
    for k in range(2):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.03 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"H{k}.fasta"
        p.write_bytes(b">H%d\n" % k + seq + b"\n")
        files.append(str(p))

    def run(*extra):
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(["--progress=never", *extra, *files])
        return rc, out.getvalue()

    rc0, clean = run()
    assert rc0 == 0

    def boom(*a, **k):
        raise RuntimeError("ABORTED: TPU backend error (Aborted).")

    monkeypatch.setattr(hm, "hybrid_map_queries", boom)
    rc1, faulted = run("--map-backend=hybrid")
    assert rc1 == 0
    assert faulted == clean
    assert "hybrid mapping" in capsys.readouterr().err
