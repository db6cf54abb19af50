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
