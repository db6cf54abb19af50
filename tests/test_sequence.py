"""Sequence-layer tests mirroring test/Tsequence.cxx plus extras."""

import numpy as np

from phylonium_tpu.data.sequence import (
    Genome,
    Sequence,
    filter_nucl,
    gc_content,
    join,
    revcomp,
)


def test_sequence_basics():
    s = Sequence("Name", b"ACGTACGT")
    assert s.name == "Name"
    assert s.nucl == b"ACGTACGT"
    assert len(s) == 8


def test_revcomp():
    assert revcomp(b"") == b""
    assert revcomp(b"A") == b"T"
    assert revcomp(b"C") == b"G"
    assert revcomp(b"G") == b"C"
    assert revcomp(b"T") == b"A"
    assert revcomp(b"ACGTACGT") == b"ACGTACGT"

    s = b"TACGATCGATCGAAAGCTAGTTCGCCCCGAGATA"
    rc = b"TATCTCGGGGCGAACTAGCTTTCGATCGATCGTA"
    assert revcomp(s) == rc
    assert revcomp(revcomp(s)) == s


def test_revcomp_preserves_low_bytes():
    # bytes below 'A' (like the '!' separator) pass through unchanged
    # (src/sequence.cxx:87-88)
    assert revcomp(b"A!T") == b"A!T"


def test_filter_nucl():
    assert filter_nucl(b"") == b""
    for c in b"ACGT":
        assert filter_nucl(bytes([c])) == bytes([c])
    assert filter_nucl(b"!") == b""

    s = b"TACGATCGATCGAAAGCTAGTTCGCCCCGAGATA"
    assert filter_nucl(s) == s
    assert filter_nucl(b"tacgatc!gatc!gaa__agctagttcgcc#ccgagata") == s


def test_gc_content():
    assert gc_content(b"ACGT") == 0.5
    assert gc_content(b"AT") == 0.0
    assert gc_content(b"GC") == 1.0
    # '!' separators count toward the length but not the GC tally,
    # matching gc_content over a joined genome (src/sequence.cxx:152-165)
    assert gc_content(b"GC!!") == 0.5


def test_join():
    g = Genome("gen", [Sequence("c1", b"ACGT"), Sequence("c2", b"TTTT")])
    j = join(g)
    assert j.name == "gen"
    assert j.nucl == b"ACGT!TTTT"
    assert g.joined_length == 9

    single = Genome("gen", [Sequence("contig_name", b"ACGT")])
    j = join(single)
    assert j.name == "gen"  # genome name, not contig name
    assert j.nucl == b"ACGT"

    assert join(Genome("x", [])).nucl == b""


def test_as_array_zero_copy():
    s = Sequence("x", b"ACGT")
    arr = s.as_array()
    assert arr.dtype == np.uint8
    assert arr.tolist() == [65, 67, 71, 84]


def test_compact_roundtrip(rng):
    from phylonium_tpu.core.pileup import byte_to_code
    from phylonium_tpu.data.sequence import Sequence

    acgt = np.frombuffer(b"ACGT", np.uint8)
    arr = rng.choice(acgt, 10_037).astype(np.uint8)
    arr[rng.integers(0, arr.size, 7)] = ord("!")
    raw = arr.tobytes()
    s = Sequence("g", raw)
    codes_ref = byte_to_code(s.as_array())
    s.compact()
    assert s.compacted and len(s) == len(raw)
    assert s.nucl == raw  # property reconstructs exact bytes
    np.testing.assert_array_equal(s.as_array(), arr)
    # codes_slice at every alignment against the byte-mode oracle
    for a, b in [(0, 10_037), (1, 10_036), (3, 4), (4_095, 4_205),
                 (10_030, 10_037), (5, 5)]:
        np.testing.assert_array_equal(
            s.codes_slice(a, b), codes_ref[a:b]
        )
    # byte-mode codes_slice agrees too
    t = Sequence("g", raw)
    np.testing.assert_array_equal(
        t.codes_slice(17, 9_000), codes_ref[17:9_000]
    )


def test_compact_refuses_unfiltered():
    from phylonium_tpu.data.sequence import Sequence

    s = Sequence("x", b"ACGTNACGT")
    s.compact()
    assert not s.compacted  # 'N' is unfiltered: byte storage stays
    assert s.nucl == b"ACGTNACGT"
