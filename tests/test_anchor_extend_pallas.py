"""Pallas diagonal-mismatch kernel vs the XLA/scalar oracle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylonium_tpu.ops.anchor_extend import diagonal_neq, pad_text
from phylonium_tpu.ops.anchor_extend_pallas import (
    diagonal_neq_pallas,
    pad_text2,
)

ON_TPU = bool(os.environ.get("PHYLONIUM_TPU_TEST_REAL")) and (
    jax.devices()[0].platform == "tpu"
)
INTERPRET = not ON_TPU


def _random_texts(rng, n=6000, p=0.03):
    a = rng.integers(65, 69, n).astype(np.uint8)
    b = a.copy()
    flips = rng.random(n) < p
    b[flips] = ((b[flips] - 65 + 1) % 4 + 65).astype(np.uint8)
    return a, b


@pytest.mark.parametrize("tile", [256, 512])
def test_pallas_matches_xla(rng, tile):
    a, b = _random_texts(rng)
    nb = 24
    off_a = rng.integers(0, len(a), nb).astype(np.int32)
    off_b = rng.integers(0, len(b), nb).astype(np.int32)
    length = 900

    want = diagonal_neq(
        jnp.asarray(pad_text(a, "a", tile)),
        jnp.asarray(pad_text(b, "b", tile)),
        off_a, off_b, len(a), len(b), length, tile=tile,
    )
    got = diagonal_neq_pallas(
        jnp.asarray(pad_text2(a, "a", tile)),
        jnp.asarray(pad_text2(b, "b", tile)),
        off_a, off_b, len(a), len(b), length,
        tile=tile, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_near_text_end(rng):
    tile = 256
    a, b = _random_texts(rng, 1000, p=0.0)  # identical
    off = np.array([900, 999, 0], np.int32)
    got = diagonal_neq_pallas(
        jnp.asarray(pad_text2(a, "a", tile)),
        jnp.asarray(pad_text2(b, "b", tile)),
        off, off, len(a), len(b), 512, tile=tile, interpret=INTERPRET,
    )
    # identical texts: mismatch exactly at/after the end
    assert not got[0, :100].any() and got[0, 100:].all()
    assert not got[1, :1].any() and got[1, 1:].all()
    assert not got[2].any()


def test_pallas_unaligned_offsets(rng):
    tile = 256
    a, b = _random_texts(rng, 4000, p=0.05)
    off_a = np.array([1, 255, 257, 1023], np.int32)
    off_b = np.array([513, 2, 777, 100], np.int32)
    want = diagonal_neq(
        jnp.asarray(pad_text(a, "a", tile)),
        jnp.asarray(pad_text(b, "b", tile)),
        off_a, off_b, len(a), len(b), 1024, tile=tile,
    )
    got = diagonal_neq_pallas(
        jnp.asarray(pad_text2(a, "a", tile)),
        jnp.asarray(pad_text2(b, "b", tile)),
        off_a, off_b, len(a), len(b), 1024,
        tile=tile, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(got, want)
