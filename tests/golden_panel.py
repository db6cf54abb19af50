"""Deterministic synthetic golden panel (simf-style, self-contained).

The reference's canonical regression oracle is the eco29 dataset
(`documentation/manual.tex:131-174` in /root/reference), which needs
network access to fetch.  This module generates an eco29-SHAPED panel —
29 genomes, one base + 27 mutants at graded divergence + one draft
assembly with contig splits and an inversion — from pure integer
arithmetic (counter-based splitmix64), so the bytes are identical on
every platform and numpy version.  ``tools/regen_golden.py`` runs the
reference binary on this panel once and commits its stdout per flag
combo under ``tests/data/golden/``; ``tests/test_golden_fixtures.py``
then asserts our CLI reproduces those bytes with no compiler, oracle
binary, or network present.

numpy ``Generator`` method streams are NOT version-stable by policy
(NEP 19 reserves the right to improve algorithms), which is why this
generator uses raw splitmix64 instead of ``default_rng``.
"""

from __future__ import annotations

import numpy as np

N_GENOMES = 29
LENGTH = 80_000
PANEL_SEED = 29

_GAMMA = np.uint64(0x9E3779B97F4A7C15)

ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)

# revcomp byte LUT (A<->T, C<->G), same trick as data/sequence.py
_COMP = np.arange(256, dtype=np.uint8)
for _a, _b in ((ord("A"), ord("T")), (ord("C"), ord("G"))):
    _COMP[_a], _COMP[_b] = _b, _a


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound arithmetic)."""
    z = x + _GAMMA
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def rand_u64(seed: int, n: int) -> np.ndarray:
    """n counter-based splitmix64 words for stream ``seed``."""
    ctr = np.arange(n, dtype=np.uint64) * _GAMMA
    with np.errstate(over="ignore"):
        return _splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + ctr)


def _rand_unit(seed: int, n: int) -> np.ndarray:
    """n floats in [0, 1) from the top 53 bits (exactly reproducible)."""
    return (rand_u64(seed, n) >> np.uint64(11)).astype(np.float64) * (
        2.0**-53
    )


def _mutate(base_codes: np.ndarray, p: float, seed: int) -> np.ndarray:
    n = base_codes.size
    hit = _rand_unit(seed, n) < p
    shift = 1 + (rand_u64(seed + 1, n) % np.uint64(3)).astype(np.int64)
    return np.where(hit, (base_codes + shift) % 4, base_codes)


def golden_panel(
    n: int = N_GENOMES, length: int = LENGTH, seed: int = PANEL_SEED
) -> list[list[bytes]]:
    """The committed golden panel: ``n`` genomes as contig lists.

    Genome 0 is the base; 1..n-2 are substitution mutants at graded
    rates 0.5%..6%; the last is a 4-contig draft of the 2%-mutant with
    a revcomp'd middle segment (exercises the reverse strand and the
    '!' contig separators end to end).
    """
    base = (rand_u64(seed, length) & np.uint64(3)).astype(np.int64)
    genomes: list[list[bytes]] = [[ACGT[base].tobytes()]]
    for k in range(1, n - 1):
        p = 0.005 + 0.055 * (k - 1) / max(n - 3, 1)
        codes = _mutate(base, p, seed * 1_000 + 7 * k)
        genomes.append([ACGT[codes].tobytes()])

    draft = bytearray(ACGT[_mutate(base, 0.02, seed * 1_000 + 997)].tobytes())
    third = length // 3
    inv = length // 5
    seg = bytes(draft[third : third + inv])
    draft[third : third + inv] = _COMP[
        np.frombuffer(seg, np.uint8)[::-1]
    ].tobytes()
    contig_len = -(-length // 4)
    genomes.append(
        [
            bytes(draft[i : i + contig_len])
            for i in range(0, length, contig_len)
        ]
    )
    return genomes


def write_panel(dirpath: str) -> list[str]:
    """Write the panel as FASTA files; returns the file paths."""
    import os

    files = []
    for k, contigs in enumerate(golden_panel()):
        path = os.path.join(dirpath, f"G{k:03d}.fasta")
        with open(path, "wb") as f:
            for ci, contig in enumerate(contigs):
                f.write(b">G%03d_c%d\n" % (k, ci))
                for i in range(0, len(contig), 70):
                    f.write(contig[i : i + 70] + b"\n")
        files.append(path)
    return files


# flag combos covered by the committed fixtures, name -> argv tail.
# '-p' writes REFPOS_FILE (compared as a second fixture); '-b' runs
# under the seeded-PRNG replication envs (RD seed 4242).
GOLDEN_CASES: dict[str, list[str]] = {
    "default": [],
    "two_pass": ["-2"],
    "bootstrap": ["-b", "2"],
    "complete_deletion": ["--complete-deletion"],
    "refpos": ["-p", "REFPOS_FILE"],
    "dist_raw": ["--distance", "raw"],
    "dist_ani": ["--distance", "ani"],
    # sticky --distance bits: estimator raw > ani, formatter keys on ani
    "dist_ani_raw": ["--distance", "ani", "--distance", "raw"],
    "verbose_cd_2pass": ["-2", "--complete-deletion", "--distance", "ani"],
}

RD_SEED = 4242
