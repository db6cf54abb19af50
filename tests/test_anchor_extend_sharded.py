"""Sharded-text extension vs the single-device op (bit-equality).

Exercises shard-boundary-straddling requests, limits inside/outside
shards, and every 1-D mesh size that divides the 8 virtual devices.
"""

import jax
import numpy as np
import pytest

from phylonium_tpu.ops.anchor_extend import diagonal_neq, pad_text
from phylonium_tpu.ops.anchor_extend_sharded import (
    diagonal_neq_sharded,
    shard_text,
)
from phylonium_tpu.parallel.mesh import make_mesh


def _mesh(n):
    devices = jax.devices()[:n]
    if len(devices) < n:
        pytest.skip(f"needs {n} devices")
    return jax.sharding.Mesh(np.array(devices), ("x",))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_matches_single_device(rng, n_shards):
    mesh = _mesh(n_shards)
    tile = 256
    n_a, n_b = 40_000, 20_000
    acgt = np.frombuffer(b"ACGT", np.uint8)
    a_text = rng.choice(acgt, n_a)
    # correlated texts so long matches exist across shard boundaries
    b_text = a_text[5_000 : 5_000 + n_b].copy()
    flip = rng.random(n_b) < 0.01
    b_text[flip] = acgt[(b_text[flip] + 1) % 4]

    a_pad = pad_text(a_text, "a", tile)
    b_pad = pad_text(b_text, "b", tile)
    length = 4096

    n_jobs = 64
    width = -(-a_pad.shape[0] // n_shards)
    # cluster offsets around shard boundaries + random ones
    boundary = np.array(
        [s * width + d for s in range(1, n_shards) for d in (-3, -1, 0, 1)]
    )
    boundary = boundary[(boundary >= 0) & (boundary < n_a)]
    off_a = np.concatenate(
        [boundary, rng.integers(0, n_a, n_jobs - boundary.size)]
    ).astype(np.int32)
    off_b = rng.integers(0, n_b, n_jobs).astype(np.int32)
    lim_a = np.full(n_jobs, n_a, np.int32)
    lim_b = np.full(n_jobs, n_b, np.int32)

    want = diagonal_neq(
        a_pad, b_pad, off_a, off_b, lim_a, lim_b, length, tile
    )
    shards = shard_text(a_pad, n_shards, tile)
    got = diagonal_neq_sharded(
        shards, b_pad, off_a, off_b, lim_a, lim_b, length, mesh, tile
    )
    np.testing.assert_array_equal(got, want)


def test_limits_force_mismatch(rng):
    mesh = _mesh(4)
    tile = 128
    acgt = np.frombuffer(b"ACGT", np.uint8)
    a_text = rng.choice(acgt, 3000)
    b_text = a_text.copy()  # identical -> only limits create mismatches
    a_pad, b_pad = pad_text(a_text, "a", tile), pad_text(b_text, "b", tile)
    off = np.array([2900, 0, 1500], np.int32)
    lim_a = np.array([3000, 100, 1600], np.int32)
    lim_b = np.array([3000, 3000, 1550], np.int32)
    want = diagonal_neq(a_pad, b_pad, off, off, lim_a, lim_b, 256, tile)
    got = diagonal_neq_sharded(
        shard_text(a_pad, 4, tile), b_pad, off, off, lim_a, lim_b, 256,
        mesh, tile,
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_extension_through_cli(tmp_path, monkeypatch):
    """PHYLONIUM_TPU_SHARDED_EXTEND=1 routes the hybrid mapper's
    extension requests through the sharded-text op (index split across
    every device of a 1-D mesh — the beyond-HBM index path), reachable
    from the CLI surface and byte-identical to the default run."""
    import contextlib
    import io

    import phylonium_tpu.ops.anchor_extend_sharded as aes
    from phylonium_tpu.cli import main

    rng = np.random.default_rng(17)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(acgt, 4000)
    files = []
    for k, p in enumerate([0.0, 0.02, 0.06]):
        arr = base.copy()
        idx = rng.random(arr.size) < p
        arr[idx] = acgt[(arr[idx] + rng.integers(1, 4, int(idx.sum()))) % 4]
        path = tmp_path / f"g{k}.fasta"
        path.write_bytes(b">g%d\n" % k + arr.tobytes() + b"\n")
        files.append(str(path))

    def run(extra):
        out = io.StringIO()
        with contextlib.redirect_stdout(out):
            rc = main(["--progress=never", *extra, *files])
        return rc, out.getvalue()

    rc0, want = run([])
    assert rc0 == 0

    calls = []
    real = aes.diagonal_neq_sharded

    def counting(*a, **k):
        calls.append(a[0].shape)  # the shard array proves the split
        return real(*a, **k)

    monkeypatch.setattr(aes, "diagonal_neq_sharded", counting)
    monkeypatch.setenv("PHYLONIUM_TPU_SHARDED_EXTEND", "1")
    rc1, got = run(["--map-backend", "hybrid"])
    assert rc1 == 0
    assert got == want
    assert calls, "sharded extension op never ran"
    assert all(shape[0] > 1 for shape in calls)  # genuinely sharded
