"""Streamed map→pileup→transfer pipeline (core/stream.py).

The feeder's concatenated device array must be exactly the array the
one-shot packed path ships, so every chunking must count bit-identically
to the numpy oracle — and the full streamed CLI must stay byte-identical
to the serial pipeline.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

from phylonium_tpu.core.stream import DeviceRowFeeder
from phylonium_tpu.ops.match_table import pair_counts_numpy


def _feed_all(states, groups, **kw):
    n, L = states.shape
    feeder = DeviceRowFeeder(n, L, interpret=True, **kw)
    lo = 0
    for g in groups:
        feeder.feed(states[lo : lo + g])
        lo += g
    assert lo == n
    return feeder.finish()


@pytest.mark.parametrize(
    "n,length,groups",
    [
        (12, 700, [12]),
        (12, 700, [5, 4, 3]),
        (33, 1500, [32, 1]),
        (40, 257, [7, 13, 11, 9]),
    ],
)
def test_feeder_flat_matches_oracle(rng, n, length, groups):
    states = rng.integers(0, 11, size=(n, length), dtype=np.uint8)
    subs, homs = _feed_all(states, groups)
    es, eh = pair_counts_numpy(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)


def test_feeder_blocked_matches_oracle(rng):
    """n > 512 takes the row-blocked panel path on pre-packed input."""
    n, length = 530, 600
    states = rng.integers(0, 11, size=(n, length), dtype=np.uint8)
    subs, homs = _feed_all(states, [256, 256, 18])
    es, eh = pair_counts_numpy(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)


def test_feeder_error_surfaces_in_finish(rng, monkeypatch):
    import phylonium_tpu.ops.pallas_match as pm

    def boom(*a, **k):
        raise RuntimeError("ABORTED: TPU backend error (injected)")

    states = rng.integers(0, 11, size=(8, 256), dtype=np.uint8)
    # patch before construction: the worker thread binds pack_states at
    # start-up
    monkeypatch.setattr(pm, "pack_states", boom)
    feeder = DeviceRowFeeder(8, 256, interpret=True)
    feeder.feed(states)
    with pytest.raises(RuntimeError, match="ABORTED"):
        feeder.finish()


def _write_panel(tmp_path, n, length, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, length)
    files = []
    for k in range(n):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.01 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"Q{k:02d}.fasta"
        p.write_bytes(b">Q%02d\n" % k + seq + b"\n")
        files.append(str(p))
    return files


def test_streamed_cli_byte_identical(tmp_path, monkeypatch):
    """PHYLONIUM_TPU_STREAM=force drives the full streamed pipeline
    (grouped native mapping, feeder, compare race) — stdout must be
    byte-identical to the serial run, including multi-group splits."""
    from phylonium_tpu.cli import main

    files = _write_panel(tmp_path, 7, 2600, seed=3)

    def run():
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(["--progress=never", *files])
        return rc, out.getvalue()

    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "0")
    rc0, serial = run()
    assert rc0 == 0

    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "force")
    monkeypatch.setenv("PHYLONIUM_TPU_STREAM_GROUP", "3")
    rc1, streamed = run()
    assert rc1 == 0
    assert streamed == serial


def test_streamed_cli_survives_feeder_abort(tmp_path, monkeypatch, capsys):
    """A transient abort inside the feeder loses the device leg of the
    race, not the run: rc 0 and byte-identical output."""
    import phylonium_tpu.core.stream as st
    from phylonium_tpu.cli import main

    files = _write_panel(tmp_path, 5, 2200, seed=9)

    def run():
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(["--progress=never", *files])
        return rc, out.getvalue()

    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "0")
    rc0, serial = run()
    assert rc0 == 0

    class BoomFeeder(st.DeviceRowFeeder):
        def finish(self, progress=None):
            raise RuntimeError("ABORTED: TPU backend error (injected)")

    monkeypatch.setattr(st, "DeviceRowFeeder", BoomFeeder)
    import phylonium_tpu.core.pipeline  # noqa: F401 — imports from st at call time

    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "force")
    rc1, streamed = run()
    assert rc1 == 0
    assert streamed == serial


def test_should_stream_conditions(monkeypatch):
    from phylonium_tpu.config import RunConfig
    from phylonium_tpu.core.pipeline import _should_stream

    class FakeRef:
        backend_name = "native"

    ref = FakeRef()
    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "force")
    assert _should_stream(100, 1000, RunConfig(), ref)
    # excluded paths stay serial even when forced
    assert not _should_stream(
        100, 1000, RunConfig(complete_deletion=True), ref
    )
    assert not _should_stream(
        100, 1000, RunConfig(count_backend="pallas"), ref
    )
    assert not _should_stream(100, 1000, RunConfig(mesh="2,4"), ref)
    assert not _should_stream(
        100, 1000, RunConfig(checkpoint_dir="/tmp/x"), ref
    )
    ref.backend_name = "numpy"
    assert not _should_stream(100, 1000, RunConfig(), ref)
    ref.backend_name = "native"
    monkeypatch.setenv("PHYLONIUM_TPU_STREAM", "0")
    assert not _should_stream(100, 1000, RunConfig(), ref)
    # without force: CPU platform + below-threshold panels stay serial
    monkeypatch.delenv("PHYLONIUM_TPU_STREAM", raising=False)
    assert not _should_stream(10, 1000, RunConfig(), ref)
