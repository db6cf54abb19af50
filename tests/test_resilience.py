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

A second, nastier failure mode was observed live round 3: a WEDGED
tunnel hangs device calls without raising — no exception, no progress,
for over an hour.  Every device counting attempt is therefore bounded
(PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT; panel-scaled default) and a
timeout goes straight to the host path.  Hangs are injected via
PHYLONIUM_TPU_INJECT_HANG=N.
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
    # the retry succeeded on the device leg: the carrier must say so
    assert pipe.LAST_RUN_INFO["compare_carrier"] == "device"


def test_explicit_device_falls_back_to_host(states, inject, capsys):
    """Two aborts: retry also fails -> bit-identical host fallback."""
    inject(2)
    cfg = RunConfig(count_backend="device", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    assert "host" in capsys.readouterr().err


def test_carrier_reported_on_host_fallback(states, inject):
    """A planned device run that fell back must report carrier=host —
    bench labels its tiers from this (a wedged tunnel otherwise shows
    up as a fake through-the-chip win)."""
    inject(2)
    cfg = RunConfig(count_backend="device", progress="never")
    pair_counts(states, cfg)
    assert pipe.LAST_RUN_INFO["compare_carrier"] == "host"


def test_carrier_reported_for_host_and_numpy(states):
    for backend, expect in (("host", "host"), ("numpy", "numpy")):
        cfg = RunConfig(count_backend=backend, progress="never")
        pair_counts(states, cfg)
        assert pipe.LAST_RUN_INFO["compare_carrier"] == expect


def test_run_report_file(tmp_path, inject, monkeypatch, capsys):
    """PHYLONIUM_TPU_RUN_REPORT dumps {compare_carrier, timings}."""
    import json

    from phylonium_tpu.cli import main

    files = []
    rng = np.random.default_rng(5)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(acgt, 4000)
    for k in range(3):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.02 * (k + 1)
        arr[idx] = acgt[(arr[idx] + 1) % 4]
        f = tmp_path / f"g{k}.fasta"
        f.write_text(">g%d\n%s\n" % (k, arr.tobytes().decode()))
        files.append(str(f))
    report = tmp_path / "report.json"
    monkeypatch.setenv("PHYLONIUM_TPU_RUN_REPORT", str(report))
    inject(2)  # planned device -> double fault -> host fallback
    rc = main(["--count-backend", "device", "--progress=never",
               *files])
    capsys.readouterr()
    assert rc == 0
    info = json.loads(report.read_text())
    assert info["compare_carrier"] == "host"
    assert "compare" in info["timings"]


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


@pytest.fixture
def inject_hang(monkeypatch):
    """Arm N injected hangs (module-level countdown, reset after)."""

    def arm(n: int):
        monkeypatch.setenv(pipe._HANG_ENV, str(n))
        monkeypatch.setattr(pipe, "_hang_remaining", None)

    yield arm
    pipe._hang_remaining = None


def test_call_with_hang_bound_passthrough():
    assert pipe._call_with_hang_bound(lambda: 42, 30.0, "t") == 42
    with pytest.raises(ValueError, match="boom"):
        pipe._call_with_hang_bound(
            lambda: (_ for _ in ()).throw(ValueError("boom")), 30.0, "t"
        )


def test_call_with_hang_bound_times_out():
    import time

    with pytest.raises(TimeoutError, match="no progress"):
        pipe._call_with_hang_bound(lambda: time.sleep(60), 0.2, "t")


def test_attempt_timeout_env_and_default(monkeypatch, states):
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "7.5")
    assert pipe._attempt_timeout_s(states) == 7.5
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "junk")
    assert pipe._attempt_timeout_s(states) >= 900.0  # default survives
    monkeypatch.delenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT")
    assert pipe._attempt_timeout_s(states) >= 900.0


def test_wedged_device_falls_back_to_host(
    states, inject_hang, capsys, monkeypatch
):
    """A wedge (hang, no exception) hits the per-attempt bound and goes
    STRAIGHT to the bit-identical host path — no retry stall."""
    import time

    inject_hang(1)
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "0.5")
    cfg = RunConfig(count_backend="device", progress="never")
    t0 = time.time()
    subs, homs = pair_counts(states, cfg)
    assert time.time() - t0 < 60  # one bound, not 3600 s
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    err = capsys.readouterr().err
    assert "no progress" in err
    assert "host" in err


def test_wedged_mesh_falls_back_to_host(
    states, inject_hang, capsys, monkeypatch
):
    inject_hang(1)
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "0.5")
    cfg = RunConfig(mesh="2,4", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    assert "no progress" in capsys.readouterr().err


def test_abort_then_wedged_retry_falls_back(
    states, inject, inject_hang, capsys, monkeypatch
):
    """First attempt aborts, the reinitialized retry wedges: the bound
    fires on the retry too and the host path still finishes the run."""
    inject(1)
    inject_hang(1)
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "0.5")
    cfg = RunConfig(count_backend="device", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    err = capsys.readouterr().err
    assert "retrying" in err
    assert "no progress" in err


def test_full_cli_survives_wedged_backend(
    tmp_path, inject_hang, capsys, monkeypatch
):
    """Full CLI with --count-backend device under an injected wedge:
    exit 0 and stdout byte-identical to the clean run."""
    from phylonium_tpu.cli import main

    rng = np.random.default_rng(23)
    base = rng.integers(0, 4, 3000)
    files = []
    for k in range(3):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.02 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"W{k}.fasta"
        p.write_bytes(b">W%d\n" % k + seq + b"\n")
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
    inject_hang(1)
    monkeypatch.setenv("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT", "0.5")
    rc_fault, out_fault = run()
    assert rc_fault == 0
    assert out_fault == out_clean
    assert "no progress" in capsys.readouterr().err


def test_devices_or_none_on_live_backend():
    """With the backend reachable (CPU-pinned test env), the bounded
    handshake returns the device list, not None."""
    from phylonium_tpu.utils.platform import devices_or_none

    devs = devices_or_none(timeout_s=120.0)
    assert devs


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


def test_dead_handshake_explicit_device_fast_fallback(
    states, capsys, monkeypatch
):
    """With the backend handshake dead (devices_or_none memoized None),
    an explicit device backend must raise UNAVAILABLE out of the first
    attempt and land on the host path — not stall a full attempt bound
    inside a kernel launch."""
    import time

    import phylonium_tpu.utils.platform as plat

    monkeypatch.setattr(pipe, "_dispatch_devices", lambda: None)
    monkeypatch.setattr(plat, "cpu_pinned", lambda: False)
    cfg = RunConfig(count_backend="device", progress="never")
    t0 = time.time()
    subs, homs = pair_counts(states, cfg)
    assert time.time() - t0 < 60
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
    assert "host" in capsys.readouterr().err


def test_dead_handshake_auto_races_to_host(states, monkeypatch):
    """Auto dispatch makes every device decision on the race thread;
    a dead handshake just loses the race."""
    import phylonium_tpu.utils.platform as plat

    monkeypatch.setattr(pipe, "_dispatch_devices", lambda: None)
    monkeypatch.setattr(plat, "cpu_pinned", lambda: False)
    cfg = RunConfig(count_backend="auto", progress="never")
    subs, homs = pair_counts(states, cfg)
    es, eh = _expect(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)
