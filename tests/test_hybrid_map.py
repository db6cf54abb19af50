"""Hybrid (device-extension) mapping parity vs the chain-loop oracle."""

import numpy as np
import pytest

from phylonium_tpu.core.anchor_stats import min_anchor_length
from phylonium_tpu.core.anchors import anchor_homologies
from phylonium_tpu.core.filter import filter_overlaps_max
from phylonium_tpu.core.hybrid_map import hybrid_map_queries
from phylonium_tpu.data.sequence import Sequence, gc_content, revcomp
from phylonium_tpu.index.esa import ESAIndex


def _as_tuples(hv):
    return [
        (
            h.direction,
            h.index_reference,
            h.index_reference_projected,
            h.index_query,
            h.length,
        )
        for h in hv
    ]


def _check_parity(subject_bytes, query_bytes_list, chunk=1 << 12):
    subject = Sequence("S", subject_bytes)
    ref = ESAIndex(subject)
    thr = min_anchor_length(0.025, gc_content(subject.nucl), ref.size)
    queries = [Sequence(f"Q{k}", qb) for k, qb in enumerate(query_bytes_list)]

    want = []
    for q in queries:
        hv = anchor_homologies(ref, thr, q)
        want.append(_as_tuples(hv))

    got_raw = hybrid_map_queries(
        ref, thr, [q.as_array() for q in queries], chunk=chunk
    )
    got = [_as_tuples(hv) for hv in got_raw]
    assert got == want

    # and through the overlap filter (pipeline shape)
    for hv_raw, q in zip(got_raw, queries):
        hv_raw.sort(key=lambda h: h.start())
        oracle = anchor_homologies(ref, thr, q)
        oracle.sort(key=lambda h: h.start())
        assert _as_tuples(filter_overlaps_max(hv_raw)) == _as_tuples(
            filter_overlaps_max(oracle)
        )


def test_hybrid_substitutions_only(rng, make_genome, make_mutant):
    base = make_genome(rng, 8000)
    qs = [base, make_mutant(base, 0.02, rng), make_mutant(base, 0.08, rng)]
    _check_parity(base, qs)


def test_hybrid_identical_sequence(rng, make_genome):
    base = make_genome(rng, 3000)
    _check_parity(base, [base])


def test_hybrid_revcomp_segment(rng, make_genome, make_mutant):
    base = make_genome(rng, 6000)
    q = bytearray(make_mutant(base, 0.01, rng))
    q[2000:3500] = revcomp(bytes(q[2000:3500]))
    _check_parity(base, [bytes(q)])


def test_hybrid_contig_separators(rng, make_genome, make_mutant):
    base = make_genome(rng, 6000)
    m = make_mutant(base, 0.01, rng)
    q = m[:2000] + b"!" + m[2000:4100] + b"!" + m[4100:]
    subj = base[:3000] + b"!" + base[3000:]
    _check_parity(subj, [q])


def test_hybrid_unrelated_and_insert(rng, make_genome, make_mutant):
    base = make_genome(rng, 5000)
    insert = make_genome(rng, 1500)
    q = make_mutant(base[:2500], 0.02, rng) + insert + make_mutant(
        base[2500:], 0.02, rng
    )
    unrelated = make_genome(rng, 4000)
    _check_parity(base, [q, unrelated])


def test_hybrid_rearrangement(rng, make_genome, make_mutant):
    base = make_genome(rng, 6000)
    m = make_mutant(base, 0.015, rng)
    q = m[3000:] + m[:3000]  # swapped halves
    _check_parity(base, [q])


@pytest.mark.parametrize("chunk", [256, 1024, 1 << 15])
def test_hybrid_chunk_sizes(rng, make_genome, make_mutant, chunk):
    base = make_genome(rng, 4000)
    qs = [make_mutant(base, 0.03, rng)]
    _check_parity(base, qs, chunk=chunk)


def test_hybrid_short_and_empty(rng, make_genome):
    base = make_genome(rng, 1000)
    _check_parity(base, [base[:50], base[400:420]])


def test_hybrid_through_pipeline_matrix(rng, make_genome, make_mutant):
    """Full process() with --map-backend hybrid == native/python path."""
    from phylonium_tpu.config import RunConfig
    from phylonium_tpu.core.pipeline import process

    base = make_genome(rng, 5000)
    queries = [
        Sequence("a", base),
        Sequence("b", make_mutant(base, 0.03, rng)),
        Sequence("c", make_mutant(base, 0.07, rng)),
    ]
    cfg_h = RunConfig(progress="never", map_backend="hybrid",
                      count_backend="numpy")
    cfg_d = RunConfig(progress="never", count_backend="numpy")
    got = process(queries[0], queries, cfg_h)
    want = process(queries[0], queries, cfg_d)
    np.testing.assert_array_equal(got.substitutions, want.substitutions)
    np.testing.assert_array_equal(got.homologs, want.homologs)


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_hybrid_structural_sweep(seed):
    """Randomized structural cases: parity on every chain-rule branch."""
    rng = np.random.default_rng(seed)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = acgt[rng.integers(0, 4, 4000)].tobytes()

    def mutate(s, p):
        arr = np.frombuffer(s, np.uint8).copy()
        idx = np.flatnonzero(rng.random(arr.size) < p)
        arr[idx] = acgt[
            (np.searchsorted(acgt, arr[idx]) + rng.integers(1, 4, idx.size))
            % 4
        ]
        return arr.tobytes()

    queries = []
    for _ in range(4):
        g = mutate(base, float(rng.uniform(0.005, 0.08)))
        k = int(rng.integers(0, 3))
        if k == 1:  # inversion
            lo = int(rng.integers(0, 2000))
            hi = lo + int(rng.integers(200, 1500))
            g = g[:lo] + revcomp(g[lo:hi]) + g[hi:]
        elif k == 2:  # translocation + contig split
            cut = int(rng.integers(500, 3500))
            g = g[cut:] + b"!" + g[:cut]
        queries.append(g)
    _check_parity(base, queries, chunk=int(rng.choice([512, 4096])))
