"""The compile prewarm must target exactly the shapes the real call uses."""

import numpy as np

import phylonium_tpu.ops.pallas_match as pm


def test_prewarm_shape_matches_wrapper_call(monkeypatch):
    """pair_counts_pallas's first kernel call signature == packed_call_shape.

    If the derivations drift, the background prewarm silently compiles a
    never-used executable and every run pays the (minutes-long, remote)
    compile again in the foreground.
    """
    calls = []
    real = pm._pallas_counts

    def spy(states, block, interpret=False, packed=False):
        calls.append((states.shape, block, packed))
        return real(states, block, interpret=True, packed=packed)

    monkeypatch.setattr(pm, "_pallas_counts", spy)

    for n, length in [(3, 1000), (29, 50_000), (40, 7777)]:
        calls.clear()
        states = np.random.default_rng(0).integers(
            0, 11, size=(n, length)
        ).astype(np.uint8)
        pm.pair_counts_pallas(states)
        n_pad, block, cols = pm.packed_call_shape(n, length)
        assert calls[0] == ((n_pad, cols), block, True), (n, length)


def test_packed_call_shape_properties():
    for n, length in [(1, 1), (29, 5_000_000), (512, 123_456)]:
        n_pad, block, cols = pm.packed_call_shape(n, length)
        assert n_pad >= n and n_pad % 32 == 0
        assert block & (block - 1) == 0  # power of two
        assert cols % block == 0
        assert 2 * cols >= min(length, pm._MAX_COLS_PER_CALL)
