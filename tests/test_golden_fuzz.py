"""Randomized golden parity fuzz vs the reference binary.

Generates structurally messy panels — substitutions plus indels,
inversions, duplications, translocations, multi-contig drafts, and an
unrelated genome — and asserts byte-identical CLI stdout against the
reference oracle.  Complements test_oracle_parity.py's curated cases
with breadth: every run covers anchor breaks, reverse-strand projection,
overlap-filter chains, and low-coverage warning paths at once.
"""

import numpy as np
import pytest

from tests.test_oracle_parity import oracle, run_oracle, run_ours  # noqa: F401

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _mutate(arr, p, rng):
    arr = arr.copy()
    idx = np.flatnonzero(rng.random(arr.size) < p)
    shift = rng.integers(1, 4, idx.size)
    lut = np.full(256, 0, np.uint8)
    for c, byte in enumerate(b"ACGT"):
        lut[byte] = c
    arr[idx] = ACGT[(lut[arr[idx]] + shift) % 4]
    return arr


def _scramble(base, rng):
    """Apply a random structural edit: indel, inversion, dup, or move."""
    g = base.copy()
    n = len(g)
    kind = int(rng.integers(0, 5))
    lo = int(rng.integers(0, n // 2))
    ln = int(rng.integers(50, max(n // 10, 60)))
    hi = min(lo + ln, n)
    if kind == 0:  # deletion
        g = np.concatenate([g[:lo], g[hi:]])
    elif kind == 1:  # insertion of random sequence
        ins = ACGT[rng.integers(0, 4, ln)]
        g = np.concatenate([g[:lo], ins, g[lo:]])
    elif kind == 2:  # inversion (revcomp in place)
        seg = g[lo:hi]
        comp = seg ^ np.where((seg & 2) != 0, 4, 21).astype(np.uint8)
        g = np.concatenate([g[:lo], comp[::-1], g[hi:]])
    elif kind == 3:  # tandem duplication
        g = np.concatenate([g[:hi], g[lo:hi], g[hi:]])
    else:  # translocation to the end
        g = np.concatenate([g[:lo], g[hi:], g[lo:hi]])
    return g


def _write_fasta(path, name, arr, contigs, rng):
    with open(path, "w") as f:
        if contigs > 1:
            cuts = np.sort(
                rng.integers(1, len(arr) - 1, contigs - 1)
            )
            parts = np.split(arr, cuts)
        else:
            parts = [arr]
        for ci, part in enumerate(parts):
            if len(part) == 0:
                continue
            f.write(f">{name}_c{ci}\n")
            s = part.tobytes().decode()
            for i in range(0, len(s), 70):
                f.write(s[i : i + 70] + "\n")


# 1049: its panel yields a pair with homologs > 0 and raw > 3/4 — the
# JC map then produces glibc's NEGATIVE-signed NaN, printed "-nan"
# (caught by a 100-seed campaign; fixed in model/evo.py + io/phylip.py)
@pytest.mark.parametrize("seed", [11, 23, 47, 83, 131, 1049])
def test_structural_fuzz_matches_reference(oracle, tmp_path, seed):  # noqa: F811
    rng = np.random.default_rng(seed)
    n_genomes = int(rng.integers(4, 7))
    length = int(rng.integers(60_000, 120_000))
    base = ACGT[rng.integers(0, 4, length)]

    files = []
    for k in range(n_genomes):
        g = _mutate(base, float(rng.uniform(0.005, 0.06)), rng)
        for _ in range(int(rng.integers(0, 4))):
            g = _scramble(g, rng)
        contigs = int(rng.integers(1, 6))
        path = tmp_path / f"F{k:02d}.fasta"
        _write_fasta(path, f"F{k:02d}", g, contigs, rng)
        files.append(path.name)
    # one unrelated genome exercises nan/low-coverage warning paths
    unrelated = ACGT[rng.integers(0, 4, length // 2)]
    path = tmp_path / "UNREL.fasta"
    _write_fasta(path, "UNREL", unrelated, 1, rng)
    files.append(path.name)

    # random flag combinations widen the surface under fuzz; our-side
    # backend flags rotate too (every counting path must stay identical)
    flag_sets = [[], ["-2"], ["--complete-deletion"], ["--distance=ani"]]
    flags = flag_sets[int(rng.integers(0, len(flag_sets)))]
    backend_sets = [[], ["--count-backend=host"], ["--mesh=2,4"]]
    backend = backend_sets[int(rng.integers(0, len(backend_sets)))]

    rc0, out0, _err0 = run_oracle([*flags, *sorted(files)], str(tmp_path))
    rc1, out1, _err1 = run_ours(
        ["--progress=never", *backend, *flags, *sorted(files)],
        str(tmp_path),
    )
    assert rc0 == rc1
    assert out1 == out0
