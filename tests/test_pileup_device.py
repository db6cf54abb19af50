"""Device pileup construction vs the host oracle (ops/pileup_device.py)."""

import numpy as np

from phylonium_tpu.core.homology import FORWARD, REVERSE, Homology
from phylonium_tpu.core.pileup import INVALID, build_pileup
from phylonium_tpu.ops.pileup_device import (
    build_pileup_device,
    pack_queries,
)


def _hom(direction, proj_start, iq, length):
    return Homology(
        direction=direction,
        index_reference=proj_start,
        index_reference_projected=proj_start,
        index_query=iq,
        length=length,
    )


def _compare(queries, homologies, ref_len):
    want = build_pileup(queries, homologies, ref_len)
    got = np.asarray(build_pileup_device(queries, homologies, ref_len))
    assert got.shape[0] == want.shape[0]
    assert got.shape[1] >= ref_len
    np.testing.assert_array_equal(got[:, :ref_len], want)
    # bucket padding must be INVALID (ignored by counting)
    assert (got[:, ref_len:] == INVALID).all()


def test_pack_roundtrip(rng):
    q = np.frombuffer(b"ACGT!TTGCA!AAC", np.uint8).copy()
    packed, sep, bases = pack_queries([q])
    assert list(sep) == [4, 10]
    assert bases[-1] == len(q)


def test_forward_intervals(rng, make_genome):
    q = np.frombuffer(make_genome(rng, 500), np.uint8)
    homs = [[_hom(FORWARD, 10, 3, 100), _hom(FORWARD, 250, 200, 80)]]
    _compare([q], homs, 400)


def test_reverse_interval(rng, make_genome):
    q = np.frombuffer(make_genome(rng, 500), np.uint8)
    homs = [[_hom(REVERSE, 50, 7, 120)]]
    _compare([q], homs, 300)


def test_mixed_multi_genome_with_separators(rng, make_genome):
    q0 = np.frombuffer(
        make_genome(rng, 200) + b"!" + make_genome(rng, 150), np.uint8
    )
    q1 = np.frombuffer(make_genome(rng, 400), np.uint8)
    q2 = np.frombuffer(make_genome(rng, 50), np.uint8)
    homs = [
        [_hom(FORWARD, 0, 0, 180), _hom(REVERSE, 200, 190, 100)],
        [_hom(REVERSE, 20, 5, 60), _hom(FORWARD, 100, 100, 250)],
        [],
    ]
    _compare([q0, q1, q2], homs, 360)


def test_adjacent_and_full_coverage(rng, make_genome):
    q = np.frombuffer(make_genome(rng, 300), np.uint8)
    homs = [[_hom(FORWARD, 0, 0, 150), _hom(FORWARD, 150, 150, 150)]]
    _compare([q], homs, 300)


def test_random_disjoint_fuzz(rng, make_genome):
    ref_len = 2000
    for trial in range(10):
        n = int(rng.integers(1, 5))
        queries, homologies = [], []
        for _ in range(n):
            qlen = int(rng.integers(200, 3000))
            q = np.frombuffer(make_genome(rng, qlen), np.uint8)
            hv = []
            pos = 0
            while True:
                pos += int(rng.integers(1, 300))
                length = int(rng.integers(1, 200))
                if pos + length > ref_len:
                    break
                if length > qlen - 1:
                    continue
                iq = int(rng.integers(0, qlen - length))
                d = int(rng.integers(0, 2))
                hv.append(_hom(d, pos, iq, length))
                pos += length
            queries.append(q)
            homologies.append(hv)
        _compare(queries, homologies, ref_len)


def test_counts_match_host_path(rng, make_genome):
    """Counts from the device-built pileup == host-built pileup."""
    from phylonium_tpu.ops.match_table import pair_counts_numpy

    ref_len = 1500
    queries, homologies = [], []
    for g in range(4):
        qlen = 1800
        q = np.frombuffer(make_genome(rng, qlen), np.uint8)
        hv = [
            _hom(FORWARD, 100 * g, 50, 400),
            _hom(REVERSE, 800, 600, 300),
        ]
        queries.append(q)
        homologies.append(hv)
    host = build_pileup(queries, homologies, ref_len)
    dev = np.asarray(build_pileup_device(queries, homologies, ref_len))
    s1, h1 = pair_counts_numpy(host)
    s2, h2 = pair_counts_numpy(dev)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(h1, h2)


def test_row_group_splitting(rng, make_genome, monkeypatch):
    """Force the >int32-bases group split path and compare to host."""
    import phylonium_tpu.ops.pileup_device as pd

    # the group limit reserves 2*ref_len+1 headroom for reverse-interval
    # base indices; aim for an effective per-group budget of 1500 bases
    monkeypatch.setattr(pd, "_MAX_GROUP_BASES", 1500 + 2 * 800 + 1)
    queries, homologies = [], []
    for g in range(5):
        q = np.frombuffer(make_genome(rng, 900), np.uint8)
        queries.append(q)
        homologies.append([_hom(g % 2, 40 * g, 10, 300)])
    _compare(queries, homologies, 800)


def test_zero_length_homology_mid_list(rng, make_genome):
    """Regression: a zero-length homology BETWEEN two real ones must not
    corrupt the telescoped B/dir fills of the later intervals."""
    q = np.frombuffer(make_genome(rng, 1200), np.uint8)
    hv = [
        _hom(FORWARD, 10, 0, 200),
        _hom(FORWARD, 400, 300, 0),  # dropped by the host builder too
        _hom(REVERSE, 600, 500, 250),
    ]
    _compare([q], [hv], 1000)


def test_pack2_native_matches_numpy(rng, make_genome):
    """The native one-pass 2-bit packer is bit-identical to the numpy
    oracle (codes, separator positions, offsets) for odd lengths,
    multi-contig '!' genomes, and empty inputs."""
    import pytest

    from phylonium_tpu.ops.pileup_device import (
        _pack_queries_numpy,
        pack_queries,
    )

    try:
        from phylonium_tpu.native import pack2_native
    except Exception:
        pytest.skip("native backend unavailable")

    cases = [
        [],
        [np.frombuffer(b"ACGT", np.uint8)],
        [np.frombuffer(b"A", np.uint8), np.frombuffer(b"!", np.uint8)],
        [
            np.frombuffer(
                make_genome(rng, 333) + b"!" + make_genome(rng, 77),
                np.uint8,
            ),
            np.frombuffer(make_genome(rng, 1021), np.uint8),
            np.frombuffer(b"!!", np.uint8),
        ],
    ]
    for queries in cases:
        pn, sn, bn = _pack_queries_numpy(queries)
        pc, sc, bc = pack2_native(queries)
        np.testing.assert_array_equal(pn, pc)
        np.testing.assert_array_equal(sn, sc)
        np.testing.assert_array_equal(bn, bc)
        pd, sd, bd = pack_queries(queries)
        np.testing.assert_array_equal(pn, pd)
