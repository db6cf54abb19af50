"""ESA / longest-match tests: numpy backend vs brute force."""

import numpy as np
import pytest

from phylonium_tpu.data.sequence import Sequence, revcomp
from phylonium_tpu.index.esa import ESAIndex
from phylonium_tpu.index.esa_numpy import (
    NumpySuffixIndex,
    build_suffix_array,
    lcp_bytes,
)


def brute_suffix_array(s: bytes) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


def brute_longest_match(S: bytes, q: bytes) -> tuple[int, int, int]:
    """(l, i, j) by definition: longest prefix of q occurring in S."""
    sa = brute_suffix_array(S)
    best = 0
    for start in range(len(S)):
        l = 0
        while l < len(q) and start + l < len(S) and S[start + l] == q[l]:
            l += 1
        best = max(best, l)
    prefix = q[:best]
    idx = [k for k, p in enumerate(sa) if S[p : p + best] == prefix]
    if best == 0:
        return 0, 0, len(S) - 1
    return best, idx[0], idx[-1]


@pytest.mark.parametrize("seed", range(5))
def test_suffix_array_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 200))
    s = rng.choice(np.frombuffer(b"ACGT!#", np.uint8), n).tobytes()
    arr = np.frombuffer(s, dtype=np.uint8)
    sa = build_suffix_array(arr)
    assert sa.tolist() == brute_suffix_array(s)


def test_lcp_bytes():
    a = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    b = np.frombuffer(b"ACGAACGT", dtype=np.uint8)
    assert lcp_bytes(a, 0, b, 0, 8) == 3
    assert lcp_bytes(a, 0, a, 4, 8) == 4  # capped by array end
    assert lcp_bytes(a, 0, b, 0, 2) == 2  # capped by maxlen


@pytest.mark.parametrize("seed", range(8))
def test_longest_match_matches_bruteforce(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(5, 120))
    S = rng.choice(np.frombuffer(b"ACGT", np.uint8), n).tobytes()
    idx = NumpySuffixIndex(np.frombuffer(S, dtype=np.uint8))
    for _ in range(20):
        m = int(rng.integers(1, 30))
        # half the queries are substrings, half random
        if rng.random() < 0.5 and n > m:
            st = int(rng.integers(0, n - m))
            q = S[st : st + m]
        else:
            q = rng.choice(np.frombuffer(b"ACGT", np.uint8), m).tobytes()
        qa = np.frombuffer(q, dtype=np.uint8)
        got = idx.longest_match(qa, 0, m)
        want = brute_longest_match(S, q)
        assert got == want, (S, q)


def test_esa_index_structure():
    s = Sequence("x", b"ACGTTT")
    esa = ESAIndex(s, backend="numpy")
    assert esa.size == 13
    assert esa.border == 6
    text = s.nucl + b"#" + revcomp(s.nucl)
    assert esa.S.tobytes() == text


def test_unique_match_detection():
    # 'AAC' occurs once forward; its revcomp 'GTT' once in reverse half
    s = Sequence("x", b"AACGGGGG")
    esa = ESAIndex(s, backend="numpy")
    q = np.frombuffer(b"AACG", dtype=np.uint8)
    l, i, j = esa.longest_match(q, 0, 4)
    assert l == 4
    assert i == j
    assert int(esa.SA[i]) == 0
