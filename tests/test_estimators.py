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
