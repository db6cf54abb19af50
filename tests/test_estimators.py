"""Distance estimator / bootstrap tests (src/evo_model.cxx semantics)."""

import math

import numpy as np

from phylonium_tpu.core.anchor_stats import min_anchor_length, shuprop
from phylonium_tpu.model.evo import EvoCounts


def make_counts(subs, homs):
    return EvoCounts(
        np.array(subs, dtype=np.int64), np.array(homs, dtype=np.int64)
    )


def test_estimate_raw():
    c = make_counts([[0, 5], [5, 0]], [[0, 100], [100, 0]])
    raw = c.estimate_raw()
    assert raw[0, 1] == 0.05
    assert math.isnan(raw[0, 0])
    raw0 = c.estimate_raw(zero_on_error=True)
    assert raw0[0, 0] == 0.0


def test_estimate_jc():
    c = make_counts([[0, 5], [5, 0]], [[0, 100], [100, 0]])
    jc = c.estimate_jc()
    want = -0.75 * math.log(1.0 - (4.0 / 3.0) * 0.05)
    assert jc[0, 1] == want
    # zero distance clamps to exactly 0.0 (src/evo_model.cxx:129-130)
    z = make_counts([[0, 0], [0, 0]], [[0, 100], [100, 0]])
    assert z.estimate_jc()[0, 1] == 0.0
    # saturated distances (raw >= 0.75) give NaN, like log of a negative
    s = make_counts([[0, 80], [80, 0]], [[0, 100], [100, 0]])
    assert math.isnan(s.estimate_jc()[0, 1])


def test_estimate_ani():
    c = make_counts([[0, 5], [5, 0]], [[0, 100], [100, 0]])
    assert c.estimate_ani()[0, 1] == 95.0


def test_bootstrap_distribution():
    c = make_counts([[0, 500], [500, 0]], [[0, 10000], [10000, 0]])
    rng = np.random.default_rng(0)
    draws = [c.bootstrap(rng).substitutions[0, 1] for _ in range(300)]
    mean = np.mean(draws)
    # Binomial(10000, 0.05): mean 500, sd ~21.8
    assert 490 < mean < 510
    assert np.std(draws) > 5
    # homologs unchanged; empty cells stay zero
    b = c.bootstrap(rng)
    assert (b.homologs == c.homologs).all()
    assert b.substitutions[0, 0] == 0


def test_min_anchor_length_properties():
    # monotone in subject length; plausible magnitudes
    t1 = min_anchor_length(0.025, 0.5, 200_000)
    t2 = min_anchor_length(0.025, 0.5, 10_000_000)
    assert t1 < t2
    assert 10 <= t1 <= 25
    assert 15 <= t2 <= 35


def test_shuprop_is_cdf():
    prev = 0.0
    for x in range(1, 30):
        v = shuprop(x, 0.25, 1_000_000)
        assert 0.0 <= v <= 1.0
        assert v >= prev - 1e-12
        prev = v


def test_jc_negative_nan_sign_parity():
    """raw > 3/4 must yield a NEGATIVE-signed NaN (glibc log(x<0)
    semantics, printed "-nan" by the reference); homologs == 0 must
    stay a POSITIVE NaN (the reference's NAN macro, printed "nan")."""
    import numpy as np

    from phylonium_tpu.model.evo import EvoCounts

    subs = np.array([[0, 9, 0], [9, 0, 0], [0, 0, 0]], dtype=np.int64)
    homs = np.array([[20, 10, 0], [10, 20, 0], [0, 0, 20]], dtype=np.int64)
    d = EvoCounts(subs, homs).estimate_jc()
    assert np.isnan(d[0, 1]) and np.signbit(d[0, 1])  # raw = 0.9
    assert np.isnan(d[0, 2]) and not np.signbit(d[0, 2])  # no homology


def test_format_matrix_renders_nan_signs():
    import numpy as np

    from phylonium_tpu.io.phylip import format_matrix

    neg = np.copysign(np.nan, -1.0)
    dist = np.array([[0.0, neg, np.nan],
                     [neg, 0.0, 0.5],
                     [np.nan, 0.5, 0.0]])
    out = format_matrix(["a", "b", "c"], dist, ani=False)
    rows = out.splitlines()
    assert rows[1] == "a  0.0000e+00  -nan  nan"
    assert rows[2] == "b  -nan  0.0000e+00  5.0000e-01"
    assert rows[3] == "c  nan  5.0000e-01  0.0000e+00"
