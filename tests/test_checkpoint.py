"""Mapping checkpoint/resume (a capability the reference lacks)."""

import numpy as np

from phylonium_tpu.config import RunConfig
from phylonium_tpu.core.anchor_stats import min_anchor_length
from phylonium_tpu.core.pipeline import map_queries, process
from phylonium_tpu.data.sequence import Sequence, gc_content
from phylonium_tpu.index.esa import ESAIndex
from phylonium_tpu.utils.checkpoint import (
    MappingCheckpoint,
    query_key,
    subject_key,
)
from tests.conftest import mutate, random_genome


def _panel(rng, n=3, length=8000):
    ref = random_genome(rng, length)
    return [Sequence(f"g{k}", ref if k == 0 else mutate(ref, 0.01 * k, rng))
            for k in range(n)]


def test_checkpoint_roundtrip(tmp_path, rng):
    queries = _panel(rng)
    ref = ESAIndex(queries[0])
    thr = min_anchor_length(0.025, gc_content(queries[0].nucl), ref.size)

    cfg_plain = RunConfig(progress="never")
    plain = map_queries(ref, thr, queries, cfg_plain)

    cfg_ckpt = RunConfig(progress="never", checkpoint_dir=str(tmp_path))
    first = map_queries(ref, thr, queries, cfg_ckpt)
    second = map_queries(ref, thr, queries, cfg_ckpt)  # from cache

    for a, b, c in zip(plain, first, second):
        ta = [(h.direction, h.index_reference, h.index_reference_projected,
               h.index_query, h.length) for h in a]
        tb = [(h.direction, h.index_reference, h.index_reference_projected,
               h.index_query, h.length) for h in b]
        tc = [(h.direction, h.index_reference, h.index_reference_projected,
               h.index_query, h.length) for h in c]
        assert ta == tb == tc

    # cache files exist and are keyed per query
    skey = subject_key(queries[0].nucl, thr)
    for q in queries:
        key = query_key(skey, q.name, q.nucl)
        assert MappingCheckpoint(str(tmp_path)).load(key) is not None


def test_checkpoint_grown_panel(tmp_path, rng):
    queries = _panel(rng, n=2)
    cfg = RunConfig(progress="never", checkpoint_dir=str(tmp_path))
    counts2 = process(queries[0], queries, cfg)

    # grow the panel; previously mapped genomes come from the cache and
    # the final counts are identical to an uncached run
    grown = queries + _panel(rng, n=1)  # unrelated genome appended
    grown[2].name = "extra"
    counts3 = process(queries[0], grown, cfg)
    cfg_plain = RunConfig(progress="never")
    counts3_plain = process(queries[0], grown, cfg_plain)

    assert np.array_equal(counts3.substitutions, counts3_plain.substitutions)
    assert np.array_equal(counts3.homologs, counts3_plain.homologs)
    assert np.array_equal(
        counts2.substitutions, counts3.substitutions[:2, :2]
    )


def test_corrupt_checkpoint_ignored(tmp_path, rng):
    queries = _panel(rng, n=2)
    cfg = RunConfig(progress="never", checkpoint_dir=str(tmp_path))
    process(queries[0], queries, cfg)
    # corrupt every cache file; the run must fall back to remapping
    for f in tmp_path.iterdir():
        f.write_bytes(b"garbage")
    counts = process(queries[0], queries, cfg)
    cfg_plain = RunConfig(progress="never")
    plain = process(queries[0], queries, cfg_plain)
    assert np.array_equal(counts.substitutions, plain.substitutions)
