"""Homology algebra tests mirroring test/Tprocess.cxx:19-52."""

from phylonium_tpu.core.homology import FORWARD, REVERSE, Homology


def eq(a: Homology, b: Homology) -> bool:
    return (
        a.start() == b.start()
        and a.end() == b.end()
        and a.start_query() == b.start_query()
        and a.end_query() == b.end_query()
    )


def test_homology_basics():
    A = Homology.at(0, 0, 10)
    B = Homology.at(1, 1, 10)

    assert A.starts_left_of(B)
    assert not A.ends_left_of(B)
    assert A.overlaps(B)

    C = Homology.at(10, 10, 10)
    assert A.starts_left_of(C)
    assert A.ends_left_of(C)
    assert not A.overlaps(C)

    # query coordinate doesn't matter
    A = Homology.at(0, 23456, 10)
    B = Homology.at(1, 678, 10)
    C = Homology.at(10, 987, 10)

    assert A.starts_left_of(B)
    assert not A.ends_left_of(B)
    assert A.overlaps(B)
    assert A.starts_left_of(C)
    assert A.ends_left_of(C)
    assert not A.overlaps(C)

    D = Homology.at(0, 0, 100).trim(0, 10)
    A = Homology.at(0, 0, 10)
    assert eq(D, A)


def test_trim_forward():
    h = Homology.at(10, 100, 50)  # covers [10, 60)
    t = h.trim(20, 40)
    assert t.start() == 20 and t.end() == 40
    assert t.start_query() == 110 and t.end_query() == 130
    assert t.index_reference == 20


def test_trim_reverse():
    # reverse homology covering projected [10, 60), query [100, 150)
    h = Homology(REVERSE, 941, 10, 100, 50)
    t = h.trim(20, 40)
    assert t.start() == 20 and t.end() == 40
    # trimming 20 off the right (drift) cuts the query's LEFT end
    # (src/process.h:132-138)
    assert t.index_query == 100 + 20
    assert t.length == 20
    assert t.index_reference == 941 + 20


def test_trim_invalid_range_returns_copy():
    h = Homology.at(10, 100, 50)
    t = h.trim(40, 40)
    assert eq(t, h)


def test_reverse_eh():
    # match into the reverse half of S (length 2n+1, n = 1000)
    n = 1000
    h = Homology.at(1500, 7, 100)
    h.reverse_eh(n)
    assert h.direction == REVERSE
    assert h.index_reference_projected == 2 * n + 1 - 100 - 1500
    # forward matches stay put
    g = Homology.at(500, 7, 100)
    g.reverse_eh(n)
    assert g.direction == FORWARD
    assert g.index_reference_projected == 500


def test_zero_length_equal_start_overlap():
    # equal starts always count as overlap (src/process.h:88-90)
    a = Homology.at(5, 0, 0)
    b = Homology.at(5, 0, 7)
    assert a.overlaps(b)
