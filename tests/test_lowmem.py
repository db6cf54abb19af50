"""Low-memory pipeline (core/lowmem.py): bounded RSS, bit-identical.

The windowed pileup builder + chunked counter must equal the full-
matrix oracle for every window split, the raw-array mapping must equal
the object mapping, and the forced low-mem CLI must stay byte-identical
to the standard run.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

from phylonium_tpu.config import RunConfig
from phylonium_tpu.core.homology import FORWARD, REVERSE, Homology
from phylonium_tpu.core.lowmem import (
    _window_slices,
    build_window,
    pair_counts_windowed,
    should_lowmem,
)
from phylonium_tpu.core.pileup import build_pileup
from phylonium_tpu.data.sequence import Sequence
from phylonium_tpu.ops.match_table import pair_counts_numpy


def _hom_rows(hv):
    """Homology objects -> the raw [H, 5] int64 mapper rows."""
    return np.array(
        [
            [
                h.direction,
                h.index_reference,
                h.index_reference_projected,
                h.index_query,
                h.length,
            ]
            for h in hv
        ],
        dtype=np.int64,
    ).reshape(-1, 5)


def _panel(rng, n, ref_len):
    acgt = np.frombuffer(b"ACGT", np.uint8)
    queries, homologies = [], []
    for g in range(n):
        qlen = ref_len + int(rng.integers(0, 60))
        q = rng.choice(acgt, qlen).astype(np.uint8)
        if g % 4 == 1 and qlen > 40:
            q[qlen // 2] = ord("!")
        hv = []
        if g % 5 != 4:
            cut = int(rng.integers(1, ref_len))
            len1 = int(rng.integers(1, cut + 1))
            hv.append(
                Homology(FORWARD, cut - len1, cut - len1, 0, len1)
            )
            len2 = int(rng.integers(0, ref_len - cut + 1))
            if len2 > 0:
                rev = g % 3 == 0
                hv.append(
                    Homology(
                        REVERSE if rev else FORWARD, cut, cut,
                        qlen - len2 - 1 if rev else cut, len2,
                    )
                )
        queries.append(q)
        homologies.append(hv)
    return queries, homologies


@pytest.mark.parametrize("window", [64, 257, 1024, 5000])
def test_window_build_matches_full(rng, window):
    n, ref_len = 11, 1200
    queries, homologies = _panel(rng, n, ref_len)
    seqs = []
    for k, q in enumerate(queries):
        s = Sequence(f"g{k}", q.tobytes())
        if k % 2:
            s.compact()  # both storage modes must agree
        seqs.append(s)
    pre = [_window_slices(_hom_rows(hv)) for hv in homologies]
    full = build_pileup(queries, homologies, ref_len)
    for c0 in range(0, ref_len, window):
        c1 = min(c0 + window, ref_len)
        out = np.empty((n, c1 - c0), np.uint8)
        build_window(seqs, pre, c0, c1, out)
        np.testing.assert_array_equal(out, full[:, c0:c1])


def test_pair_counts_windowed_matches_oracle(rng, monkeypatch):
    import phylonium_tpu.core.lowmem as lm

    n, ref_len = 13, 3000
    queries, homologies = _panel(rng, n, ref_len)
    seqs = [Sequence(f"g{k}", q.tobytes()) for k, q in enumerate(queries)]
    for s in seqs:
        s.compact()
    harrs = [_hom_rows(hv) for hv in homologies]
    monkeypatch.setattr(lm, "_WINDOW_BYTES", 13 * 512)  # many windows
    subs, homs = pair_counts_windowed(seqs, harrs, ref_len)
    states = build_pileup(queries, homologies, ref_len)
    es, eh = pair_counts_numpy(states)
    np.testing.assert_array_equal(subs, es)
    np.testing.assert_array_equal(homs, eh)


def test_raw_mapping_matches_objects(rng, make_genome, make_mutant):
    from phylonium_tpu.core.anchor_stats import min_anchor_length
    from phylonium_tpu.data.sequence import gc_content
    from phylonium_tpu.index.esa import ESAIndex

    base = make_genome(rng, 12_000)
    seqs = [
        Sequence("a", base),
        Sequence("b", make_mutant(base, 0.02, rng)),
        Sequence("c", make_mutant(base, 0.05, rng)),
    ]
    ref = ESAIndex(seqs[0], backend="native")
    thr = min_anchor_length(0.025, gc_content(seqs[0].nucl), ref.size)
    arrays = [s.as_array() for s in seqs]
    objs = ref._native.map_queries(arrays, thr)
    raws = ref._native.map_queries(arrays, thr, raw=True)
    for hv, rows in zip(objs, raws):
        np.testing.assert_array_equal(_hom_rows(hv), rows)


def test_should_lowmem_gates(monkeypatch):
    monkeypatch.delenv("PHYLONIUM_TPU_LOWMEM", raising=False)
    cfg = RunConfig()
    assert not should_lowmem(29, 29 * 5_000_000, cfg)  # 145 MB
    assert should_lowmem(1000, 5_000_000_000, cfg)  # 5 GB
    assert not should_lowmem(
        1000, 5_000_000_000, RunConfig(print_positions=True)
    )
    assert not should_lowmem(
        1000, 5_000_000_000, RunConfig(complete_deletion=True)
    )
    assert not should_lowmem(
        1000, 5_000_000_000, RunConfig(count_backend="numpy")
    )
    assert not should_lowmem(1000, 5_000_000_000, RunConfig(mesh="2,4"))
    monkeypatch.setenv("PHYLONIUM_TPU_LOWMEM", "0")
    assert not should_lowmem(1000, 5_000_000_000, cfg)
    monkeypatch.setenv("PHYLONIUM_TPU_LOWMEM", "force")
    assert should_lowmem(3, 1000, cfg)


def _write_panel(tmp_path, n, length, seed, contigs=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, length)
    files = []
    for k in range(n):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.01 * (k + 1)
        arr[idx] = (arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4
        seq = bytes(b"ACGT"[c] for c in arr)
        p = tmp_path / f"Q{k:02d}.fasta"
        body = b""
        step = length // contigs + 1
        for c in range(contigs):
            part = seq[c * step : (c + 1) * step]
            if part:
                body += b">Q%02d_c%d\n" % (k, c) + part + b"\n"
        p.write_bytes(body)
        files.append(str(p))
    return files


@pytest.mark.parametrize("contigs", [1, 3])
def test_lowmem_cli_byte_identical(tmp_path, monkeypatch, contigs):
    """Forced low-mem through the full CLI (compacted reads, raw-array
    mapping, windowed host count): byte-identical to the standard run,
    including multi-contig drafts with '!' separators."""
    import phylonium_tpu.core.pipeline as pl
    from phylonium_tpu.cli import main

    files = _write_panel(
        tmp_path, 9, 4800, seed=41 + contigs, contigs=contigs
    )

    def run():
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(["--progress=never", *files])
        return rc, out.getvalue()

    monkeypatch.delenv("PHYLONIUM_TPU_LOWMEM", raising=False)
    rc0, normal = run()
    assert rc0 == 0

    monkeypatch.setenv("PHYLONIUM_TPU_LOWMEM", "force")
    rc1, low = run()
    assert rc1 == 0
    assert low == normal
    assert "lowmem" in pl.LAST_RUN_INFO

    # -2 second pass re-processes with compacted sequences
    monkeypatch.delenv("PHYLONIUM_TPU_LOWMEM", raising=False)
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert main(["--progress=never", "-2", *files]) == 0
    two_normal = out.getvalue()
    monkeypatch.setenv("PHYLONIUM_TPU_LOWMEM", "force")
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        assert main(["--progress=never", "-2", *files]) == 0
    assert out.getvalue() == two_normal
