"""Property test: the chain loop's lean probe (probe_unique) agrees with
the full longest_match spec on match length, uniqueness, and — when
unique — the match's text position.

probe_unique trades longest_match's two extra range searches for
neighbor lcps (phylonium_native.cpp), which is only safe if the
following invariants hold on arbitrary texts:

- len == longest_match's l (max prefix of q present in S);
- when len >= min_len: unique == (i == j), and if unique, pos == SA[i];
- when len < min_len the probe may skip the uniqueness work entirely.
"""

import numpy as np
import pytest

pytest.importorskip("phylonium_tpu.native")

from phylonium_tpu.native import NativeESA  # noqa: E402


def random_text(rng, n, alphabet=b"ACGT"):
    return rng.choice(np.frombuffer(alphabet, np.uint8), n)


@pytest.mark.parametrize("alphabet", [b"ACGT", b"AC", b"ACGT!#"])
def test_probe_matches_longest_match(rng, alphabet):
    text = random_text(rng, 3000, alphabet)
    esa = NativeESA(text)
    for _ in range(300):
        qlen = int(rng.integers(1, 60))
        if rng.random() < 0.7:
            start = int(rng.integers(0, text.size - qlen))
            q = text[start : start + qlen].copy()
            if rng.random() < 0.5:  # perturb
                q[rng.integers(0, qlen)] = ord("T")
        else:
            q = random_text(rng, qlen, alphabet)

        l, i, j = esa.longest_match(q, 0, qlen)
        plen, pos, unique = esa.probe_unique(q)
        assert plen == max(l, 0)
        if plen > 0:
            assert unique == (i == j)
            if unique:
                assert pos == esa.SA[i]


def test_probe_min_len_gate(rng):
    text = random_text(rng, 2000)
    esa = NativeESA(text)
    for _ in range(100):
        start = int(rng.integers(0, text.size - 40))
        q = text[start : start + 40].copy()
        l, i, j = esa.longest_match(q, 0, 40)
        plen, pos, unique = esa.probe_unique(q, min_len=10)
        assert plen == max(l, 0)
        if plen >= 10:
            assert unique == (i == j)
            if unique:
                assert pos == esa.SA[i]


def test_probe_identical_full_text(rng):
    text = random_text(rng, 500)
    esa = NativeESA(text)
    plen, pos, unique = esa.probe_unique(text)
    l, i, j = esa.longest_match(text, 0, text.size)
    assert plen == l == text.size
    assert unique == (i == j)
