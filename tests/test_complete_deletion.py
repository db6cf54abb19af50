"""Complete-deletion tests mirroring test/Tprocess.cxx:96-123."""

from phylonium_tpu.core.complete_deletion import complete_delete
from phylonium_tpu.core.homology import Homology


def H(ir, iq, l):
    return Homology.at(ir, iq, l)


def eq_nested(got, want):
    assert len(got) == len(want)
    for ga, wa in zip(got, want):
        assert len(ga) == len(wa)
        for a, b in zip(ga, wa):
            assert a.start() == b.start()
            assert a.end() == b.end()
            assert a.start_query() == b.start_query()
            assert a.end_query() == b.end_query()


def test_complete_deletion_basic():
    homologies = [
        [H(10, 10, 10), H(110, 110, 20), H(220, 220, 10), H(260, 260, 10)],
        [H(10, 10, 10), H(120, 120, 20), H(200, 200, 100)],
        [H(0, 0, 300), H(300, 300, 100)],
    ]
    expected_row = [
        H(10, 10, 10),
        H(120, 120, 10),
        H(220, 220, 10),
        H(260, 260, 10),
    ]
    expected = [expected_row, expected_row, expected_row]

    eq_nested(complete_delete(homologies), expected)
    # idempotence
    eq_nested(complete_delete(expected), expected)


def test_complete_deletion_query_coordinates():
    homologies = [
        [H(10, 110, 10), H(110, 210, 20), H(220, 320, 10), H(260, 460, 10)],
        [H(10, 510, 10), H(120, 620, 20), H(200, 700, 100)],
        [H(0, 0, 300), H(300, 300, 100)],
    ]
    expected = [
        [H(10, 110, 10), H(120, 220, 10), H(220, 320, 10), H(260, 460, 10)],
        [H(10, 510, 10), H(120, 620, 10), H(220, 720, 10), H(260, 760, 10)],
        [H(10, 10, 10), H(120, 120, 10), H(220, 220, 10), H(260, 260, 10)],
    ]
    eq_nested(complete_delete(homologies), expected)


def test_empty_genome_gives_empty_core():
    homologies = [[H(0, 0, 100)], []]
    out = complete_delete(homologies)
    assert out == [[], []]
