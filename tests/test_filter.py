"""Overlap-filter tests mirroring test/Tprocess.cxx:54-94."""

from phylonium_tpu.core.filter import filter_overlaps_max, filter_overlaps_strict
from phylonium_tpu.core.homology import Homology


def H(ir, iq, l):
    return Homology.at(ir, iq, l)


def eq_list(got, want):
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.start() == b.start()
        assert a.end() == b.end()
        assert a.start_query() == b.start_query()
        assert a.end_query() == b.end_query()


def test_two_possible_beginnings():
    pile = [H(0, 0, 10), H(1, 1, 3)]
    out = filter_overlaps_max(pile)
    eq_list(out, [H(0, 0, 10)])


def test_overlap_in_the_middle():
    pile = [H(0, 0, 10), H(10, 10, 10), H(10, 10, 20), H(40, 40, 5)]
    expected = [H(0, 0, 10), H(10, 10, 20), H(40, 40, 5)]
    eq_list(filter_overlaps_max(pile), expected)


def test_two_possible_endings():
    pile = [
        H(0, 0, 10),
        H(10, 10, 10),
        H(10, 10, 20),
        H(40, 40, 5),
        H(42, 42, 2),
    ]
    expected = [H(0, 0, 10), H(10, 10, 20), H(40, 40, 5)]
    eq_list(filter_overlaps_max(pile), expected)


def test_two_chains():
    pile = [
        H(10, 10, 10),
        H(0, 0, 10),
        H(20, 20, 10),
        H(5, 5, 10),
        H(15, 15, 10),
        H(25, 25, 10),
        H(30, 30, 10),
    ]
    pile.sort(key=lambda h: h.start())
    expected = [H(0, 0, 10), H(10, 10, 10), H(20, 20, 10), H(30, 30, 10)]
    eq_list(filter_overlaps_max(pile), expected)


def test_small_piles_untouched():
    assert filter_overlaps_max([]) == []
    one = [H(3, 3, 5)]
    assert filter_overlaps_max(one) == one


def test_strict_filter():
    pile = [H(0, 0, 10), H(5, 5, 10), H(20, 20, 10)]
    out = filter_overlaps_strict(pile)
    eq_list(out, [H(20, 20, 10)])

    pile = [H(0, 0, 10), H(10, 10, 10)]
    out = filter_overlaps_strict(pile)
    eq_list(out, [H(0, 0, 10), H(10, 10, 10)])
