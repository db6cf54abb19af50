"""Device anchor-extension ops vs scalar oracles (ops/anchor_extend.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phylonium_tpu.ops.anchor_extend import (
    DEFAULT_TILE,
    diagonal_neq,
    lce_batch,
    pad_text,
)


def lce_oracle(a: np.ndarray, b: np.ndarray, oa: int, ob: int, cap: int):
    """Scalar reference: leading equal bytes, capped (native lcp spec)."""
    m = min(cap, len(a) - oa, len(b) - ob)
    t = 0
    while t < m and a[oa + t] == b[ob + t]:
        t += 1
    return t


def _random_texts(rng, n=5000, p=0.02):
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = a.copy()
    flips = rng.random(n) < p
    b[flips] = ((b[flips] - 65 + 1) % 4 + 65).astype(np.uint8)
    return a, b


@pytest.mark.parametrize("tile", [128, 512])
def test_lce_batch_matches_oracle(rng, tile):
    a, b = _random_texts(rng)
    nb = 64
    off_a = rng.integers(0, len(a), nb).astype(np.int32)
    off_b = rng.integers(0, len(b), nb).astype(np.int32)
    cap = np.minimum(
        rng.integers(0, len(a), nb).astype(np.int32),
        np.minimum(len(a) - off_a, len(b) - off_b),
    ).astype(np.int32)

    ad = jnp.asarray(pad_text(a, "a", tile))
    bd = jnp.asarray(pad_text(b, "b", tile))
    got = lce_batch(ad, bd, off_a, off_b, cap, tile=tile)
    want = [
        lce_oracle(a, b, int(off_a[k]), int(off_b[k]), int(cap[k]))
        for k in range(nb)
    ]
    np.testing.assert_array_equal(got, want)


def test_lce_batch_long_identical_run(rng):
    # one job extends the full text while others finish in round one
    a = rng.integers(65, 69, 20000).astype(np.uint8)
    b = a.copy()
    b[0] = a[0] ^ 1
    off_a = np.array([0, 1, 100], np.int32)
    off_b = np.array([0, 1, 101], np.int32)
    cap = np.array([20000, 19999, 15000], np.int32)
    ad = jnp.asarray(pad_text(a, "a"))
    bd = jnp.asarray(pad_text(b, "b"))
    got = lce_batch(ad, bd, off_a, off_b, cap)
    want = [
        lce_oracle(a, b, 0, 0, 20000),
        lce_oracle(a, b, 1, 1, 19999),
        lce_oracle(a, b, 100, 101, 15000),
    ]
    np.testing.assert_array_equal(got, want)


def test_lce_batch_zero_cap(rng):
    a, b = _random_texts(rng, 1000)
    ad = jnp.asarray(pad_text(a, "a"))
    bd = jnp.asarray(pad_text(b, "b"))
    got = lce_batch(
        ad,
        bd,
        np.array([0, 5], np.int32),
        np.array([0, 5], np.int32),
        np.array([0, 0], np.int32),
    )
    np.testing.assert_array_equal(got, [0, 0])


@pytest.mark.parametrize("tile", [128, 256])
def test_diagonal_neq_matches_oracle(rng, tile):
    a, b = _random_texts(rng, 3000, p=0.05)
    nb = 16
    off_a = rng.integers(0, len(a), nb).astype(np.int32)
    off_b = rng.integers(0, len(b), nb).astype(np.int32)
    length = 700

    ad = jnp.asarray(pad_text(a, "a", tile))
    bd = jnp.asarray(pad_text(b, "b", tile))
    got = diagonal_neq(
        ad, bd, off_a, off_b, len(a), len(b), length, tile=tile
    )
    for k in range(nb):
        for i in range(length):
            pa, pb = int(off_a[k]) + i, int(off_b[k]) + i
            if pa >= len(a) or pb >= len(b):
                want = True
            else:
                want = a[pa] != b[pb]
            assert bool(got[k, i]) == want, (k, i)


def test_diagonal_neq_past_end_is_mismatch(rng):
    a, b = _random_texts(rng, 400, p=0.0)  # identical texts
    tile = 128
    ad = jnp.asarray(pad_text(a, "a", tile))
    bd = jnp.asarray(pad_text(b, "b", tile))
    # job starting 50 before the end: first 50 match, rest mismatch
    got = diagonal_neq(
        ad,
        bd,
        np.array([350], np.int32),
        np.array([350], np.int32),
        400,
        400,
        300,
        tile=tile,
    )
    assert not got[0, :50].any()
    assert got[0, 50:].all()


def test_lce_consistent_with_diagonal_neq(rng):
    a, b = _random_texts(rng, 4000, p=0.03)
    ad = jnp.asarray(pad_text(a, "a"))
    bd = jnp.asarray(pad_text(b, "b"))
    off = np.arange(0, 3000, 317, dtype=np.int32)
    cap = np.minimum(4000 - off, 4000 - off).astype(np.int32)
    lens = lce_batch(ad, bd, off, off, cap)
    bits = diagonal_neq(ad, bd, off, off, 4000, 4000, 1024)
    for k in range(len(off)):
        first = np.flatnonzero(bits[k])
        want = int(first[0]) if first.size else 1024
        assert int(lens[k]) == min(want, int(cap[k])) or int(
            lens[k]
        ) >= 1024
