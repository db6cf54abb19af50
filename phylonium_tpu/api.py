"""Programmatic API: the CLI pipeline as a library call.

The CLI (`python -m phylonium_tpu`) stays the byte-parity surface; this
module packages the same pipeline for Python callers (notebooks,
pipelines, other frameworks) without subprocesses or stdout parsing.

    from phylonium_tpu import distance_matrix

    result = distance_matrix(["a.fasta", "b.fasta", "c.fasta"])
    result.names            # genome names, input order
    result.distances        # [N, N] float64 (jc by default)
    result.counts           # EvoCounts (substitutions / homologs)

Sequences may also be given directly as (name, bytes/str) pairs or
`Sequence` objects — same semantics as one FASTA file per genome
(multi-contig inputs join with '!' exactly like the file reader).
Every keyword mirrors a CLI flag (reference: `src/phylonium.cxx:96-205`);
the distance matrix is bit-identical to the CLI's cells for the same
inputs because it IS the same `process()` call.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from phylonium_tpu.config import RunConfig
from phylonium_tpu.data.sequence import Sequence
from phylonium_tpu.model.evo import EvoCounts


@dataclass
class DistanceResult:
    """Outcome of one pipeline run."""

    names: list[str]
    distances: np.ndarray  # [N, N] float64, diagonal 0
    counts: EvoCounts  # substitutions / homologs matrices
    reference_index: int  # which genome anchored the run
    lengths: np.ndarray  # filtered genome lengths
    extras: dict = field(default_factory=dict)

    @property
    def reference_name(self) -> str:
        return self.names[self.reference_index]

    def coverage(self) -> np.ndarray:
        """Per-pair coverage (homologs / row-genome length)."""
        return self.counts.coverage(self.lengths)


def _as_sequences(genomes) -> list[Sequence]:
    from phylonium_tpu.data.sequence import join
    from phylonium_tpu.io.fasta import read_genome

    seqs: list[Sequence] = []
    for g in genomes:
        if isinstance(g, Sequence):
            seqs.append(g)
        elif isinstance(g, str):
            # one FASTA file = one genome; contigs join with '!'
            seqs.append(join(read_genome(g)))
        else:
            name, data = g
            if isinstance(data, str):
                data = data.encode()
            from phylonium_tpu.data.sequence import filter_nucl

            seqs.append(Sequence(str(name), filter_nucl(data)))
    return seqs


def distance_matrix(
    genomes,
    *,
    distance: str = "jc",
    reference: str | None = None,
    two_pass: bool = False,
    complete_deletion: bool = False,
    anchor_p_value: float | None = None,
    count_backend: str = "auto",
    mesh: str | None = None,
    threads: int | None = None,
) -> DistanceResult:
    """Run the full pipeline and return the distance matrix.

    ``genomes``: FASTA paths, ``Sequence`` objects, or (name, seq)
    pairs — one genome each.  ``distance``: "jc" | "raw" | "ani".
    ``reference``: pin the reference genome by name (CLI ``-r``);
    ``two_pass``: recompute against the most central genome (``-2``).
    Remaining keywords mirror their CLI flags.
    """
    from phylonium_tpu.core.pipeline import process
    from phylonium_tpu.core.reference_pick import (
        pick_first_pass,
        pick_second_pass,
    )
    from phylonium_tpu.io.phylip import estimate

    if distance not in ("jc", "raw", "ani"):
        raise ValueError(
            f"distance must be 'jc', 'raw', or 'ani' (got {distance!r})"
        )
    queries = _as_sequences(genomes)
    if len(queries) < 2:
        raise ValueError("need at least two genomes")

    cfg = RunConfig(progress="never")
    cfg.distance = distance
    cfg.complete_deletion = complete_deletion
    if anchor_p_value is not None:
        cfg.anchor_p_value = anchor_p_value
    cfg.count_backend = count_backend
    cfg.two_pass = two_pass
    if mesh:
        cfg.mesh = mesh
    if threads:
        from phylonium_tpu.native import set_threads

        set_threads(threads)

    if reference is not None:
        matches = [i for i, q in enumerate(queries) if q.name == reference]
        if not matches:
            raise ValueError(f"no genome named {reference!r}")
        reference_index = matches[0]
    else:
        reference_index = pick_first_pass(queries)

    counts = process(queries[reference_index], queries, cfg)
    if two_pass:
        second = pick_second_pass(counts)
        if second != reference_index:
            reference_index = second
            counts = process(queries[reference_index], queries, cfg)

    dist = estimate(counts, distance)
    dist = np.array(dist, dtype=np.float64, copy=True)
    np.fill_diagonal(dist, 0.0)
    lengths = np.array([len(q) for q in queries], dtype=np.int64)
    return DistanceResult(
        names=[q.name for q in queries],
        distances=dist,
        counts=counts,
        reference_index=reference_index,
        lengths=lengths,
    )
