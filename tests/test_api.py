"""Programmatic API (phylonium_tpu.distance_matrix) vs the CLI.

The API is the same process() call as the CLI, so its matrix cells must
format to exactly the CLI's stdout cells for the same inputs.
"""

import numpy as np
import pytest

from phylonium_tpu import Sequence, distance_matrix

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _panel(tmp_path, rng, n=4, length=30_000):
    base = ACGT[rng.integers(0, 4, length)]
    files, raw = [], []
    for k in range(n):
        arr = base.copy()
        idx = rng.random(arr.size) < 0.01 * (k + 1)
        arr[idx] = ACGT[(arr[idx] + 1) % 4]
        path = tmp_path / f"G{k}.fasta"
        s = arr.tobytes().decode()
        path.write_text(
            f">G{k}\n" + "\n".join(s[i : i + 70] for i in range(0, len(s), 70))
            + "\n"
        )
        files.append(str(path))
        raw.append((f"G{k}", arr.tobytes()))
    return files, raw


def _cli_matrix(files, *flags):
    import contextlib
    import io

    from phylonium_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--progress=never", *flags, *files])
    assert rc == 0
    lines = buf.getvalue().splitlines()
    n = int(lines[0])
    names = [ln.split()[0] for ln in lines[1 : 1 + n]]
    cells = [ln.split()[1:] for ln in lines[1 : 1 + n]]
    return names, cells


@pytest.mark.parametrize("distance", ["jc", "raw", "ani"])
def test_api_matches_cli_cells(tmp_path, rng, distance):
    files, _ = _panel(tmp_path, rng)
    names, cells = _cli_matrix(files, f"--distance={distance}")
    res = distance_matrix(files, distance=distance)
    assert res.names == names
    fmt = "%.4g" if distance == "ani" else "%.4e"
    for i in range(len(names)):
        got = [fmt % v for v in res.distances[i]]
        assert got == cells[i], f"row {i}"


def test_api_accepts_pairs_and_sequences(tmp_path, rng):
    files, raw = _panel(tmp_path, rng)
    from_files = distance_matrix(files)
    from_pairs = distance_matrix(raw)
    from_seqs = distance_matrix([Sequence(n, s) for n, s in raw])
    np.testing.assert_array_equal(from_files.distances, from_pairs.distances)
    np.testing.assert_array_equal(from_files.distances, from_seqs.distances)


def test_api_two_pass_and_reference(tmp_path, rng):
    files, _ = _panel(tmp_path, rng)
    names, cells = _cli_matrix(files, "-2")
    res = distance_matrix(files, two_pass=True)
    for i in range(len(names)):
        got = ["%.4e" % v for v in res.distances[i]]
        assert got == cells[i]
    pinned = distance_matrix(files, reference="G2")
    assert pinned.reference_name == "G2"
    with pytest.raises(ValueError):
        distance_matrix(files, reference="NOPE")
    with pytest.raises(ValueError):
        distance_matrix(files[:1])
    with pytest.raises(ValueError):
        distance_matrix(files, distance="bogus")


def test_api_counts_and_coverage(tmp_path, rng):
    files, _ = _panel(tmp_path, rng)
    res = distance_matrix(files)
    cov = res.coverage()
    n = len(res.names)
    assert res.counts.substitutions.shape == (n, n)
    offdiag = ~np.eye(n, dtype=bool)
    assert (cov[offdiag] > 0.8).all()
    assert (res.lengths == 30_000).all()
