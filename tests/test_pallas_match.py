"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import os

import jax
import numpy as np
import pytest

from phylonium_tpu.ops.match_table import pair_counts_numpy
from phylonium_tpu.ops.pallas_match import _PARTNERS, pair_counts_pallas

ON_TPU = bool(os.environ.get("PHYLONIUM_TPU_TEST_REAL")) and (
    jax.devices()[0].platform == "tpu"
)
INTERPRET = not ON_TPU


def test_partner_sets():
    # forward A matches forward A and reverse T; forward T additionally
    # matches the reverse '!' (the ASCII complement quirk)
    assert _PARTNERS[0] == (0, 8)  # (A,f) -> (A,f), (T,r)
    assert 9 in _PARTNERS[3]  # (T,f) matches (!,r)
    assert all(len(p) <= 3 for p in _PARTNERS)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_equals_numpy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 7))
    length = int(rng.integers(100, 1200))
    states = rng.integers(0, 11, size=(n, length)).astype(np.uint8)
    s0, h0 = pair_counts_numpy(states)
    s1, h1 = pair_counts_pallas(states, block=128, interpret=INTERPRET)
    assert np.array_equal(s0, s1)
    assert np.array_equal(h0, h1)


def test_pallas_chunking_exactness():
    # force multi-chunk accumulation through the f32->int64 path
    import phylonium_tpu.ops.pallas_match as pm

    old = pm._MAX_COLS_PER_CALL
    try:
        pm._MAX_COLS_PER_CALL = 512
        rng = np.random.default_rng(2)
        states = rng.integers(0, 11, size=(3, 2000)).astype(np.uint8)
        s0, h0 = pair_counts_numpy(states)
        s1, h1 = pair_counts_pallas(states, block=128, interpret=INTERPRET)
        assert np.array_equal(s0, s1)
        assert np.array_equal(h0, h1)
    finally:
        pm._MAX_COLS_PER_CALL = old


def test_row_blocked_equals_flat():
    from phylonium_tpu.ops.pallas_match import pair_counts_pallas_blocked

    rng = np.random.default_rng(3)
    states = rng.integers(0, 11, size=(9, 700)).astype(np.uint8)
    s0, h0 = pair_counts_numpy(states)
    s1, h1 = pair_counts_pallas_blocked(
        states, row_block=4, block=128, interpret=INTERPRET
    )
    assert np.array_equal(s0, s1)
    assert np.array_equal(h0, h1)


def test_pack_states_native_matches_numpy(rng):
    """The one-pass native packer must be byte-identical to the numpy
    formulation for every shape/padding combination."""
    import phylonium_tpu.ops.pallas_match as pm

    for n, length, n_pad, width in [
        (1, 1, 32, 128),
        (3, 7, 8, 4),
        (5, 101, 5, 51),
        (4, 100, 6, 64),
        (2, 0, 4, 8),
    ]:
        states = rng.integers(0, 11, size=(n, length), dtype=np.uint8)
        native = pm.pack_states(states, n_pad, width)
        # force the numpy fallback
        import unittest.mock as mock

        with mock.patch(
            "phylonium_tpu.native.pack_states_native",
            side_effect=RuntimeError,
        ):
            fallback = pm.pack_states(states, n_pad, width)
        np.testing.assert_array_equal(native, fallback, err_msg=str((n, length)))
