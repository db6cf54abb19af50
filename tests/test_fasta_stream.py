"""Streaming FASTA parser (io/fasta.py): chunk-boundary invariance and
pfasta-parity error surface (reference libs/pfasta.c:304-470)."""

import io

import pytest

from phylonium_tpu.io.fasta import FastaError, parse_fasta_bytes, stream_fasta

DATA = b">r1 a comment\nACGT\nTTaa\n>r2\nGG>GG\nCC\r\n>r3\nNNNN\n"
WANT = [
    ("r1", "a comment", b"ACGTTTaa"),
    ("r2", "", b"GG>GGCC"),  # mid-line '>' is sequence data
    ("r3", "", b"NNNN"),
]


@pytest.mark.parametrize("chunk_size", [1, 2, 3, 7, 64, 1 << 20])
def test_chunk_size_invariance(chunk_size):
    recs = list(
        stream_fasta(io.BytesIO(DATA), "x", chunk_size=chunk_size)
    )
    assert [(r.name, r.comment, r.sequence) for r in recs] == WANT


def test_parse_bytes_matches_stream():
    recs = parse_fasta_bytes(DATA)
    assert [(r.name, r.comment, r.sequence) for r in recs] == WANT


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"", "File is empty."),
        (b"ACGT\n", "File must start with '>'."),
        (b">\nACGT\n", "Empty name on line 1."),
        (b">ok\nAC\n>  \nGG\n", "Empty name on line 3."),
        (b">ok\nAC\n>x\n\n", "Empty sequence on line 3."),
        (b">x", "Empty sequence on line 1."),
    ],
)
@pytest.mark.parametrize("chunk_size", [1, 5, 1 << 20])
def test_error_messages_and_lines(data, msg, chunk_size):
    with pytest.raises(FastaError, match="^x: " + msg.replace(".", r"\.")):
        list(stream_fasta(io.BytesIO(data), "x", chunk_size=chunk_size))


def test_bounded_scratch_memory():
    """The parser must hold O(record) bytes, not O(file): feed a file
    of many records through a tiny-chunk stream and watch the parser
    never keep more than the largest record + chunk."""

    class Counting(io.BytesIO):
        reads = 0

        def read(self, n=-1):
            Counting.reads += 1
            return super().read(n)

    payload = b"".join(
        b">g%d\n%s\n" % (k, b"ACGT" * 2500) for k in range(50)
    )
    f = Counting(payload)
    sizes = []
    for rec in stream_fasta(f, "m", chunk_size=4096):
        sizes.append(len(rec.sequence))
    assert sizes == [10000] * 50
    assert Counting.reads >= len(payload) // 4096  # actually streamed


def test_native_body_scan_matches_python():
    """The native one-pass body scan (strip + newline count) must agree
    with the pure-python path byte-for-byte on whitespace-heavy spans
    (both sides of the 4096-byte native threshold)."""
    import numpy as np

    from phylonium_tpu.io.fasta import _WS, _scan_body

    rng = np.random.default_rng(17)
    alphabet = np.frombuffer(b"ACGTacgtNn \t\n\r\x0b\x0c>", np.uint8)
    for size in (0, 1, 100, 4095, 4096, 4097, 1 << 17):
        chunk = alphabet[
            rng.integers(0, len(alphabet), size)
        ].tobytes()
        got_bytes, got_nl = _scan_body(chunk)
        assert got_bytes == chunk.translate(None, delete=_WS)
        assert got_nl == chunk.count(b"\n")


def test_fused_read_matches_legacy_filter(tmp_path, monkeypatch):
    """read_fasta's fused native body pass (filter + counts in one
    traversal) must produce exactly the legacy parse-then-filter_nucl
    output, including the empty-sequence error semantics: an all-N
    record filters to zero bytes but is NOT an empty sequence."""
    import numpy as np
    import pytest as _pytest

    import phylonium_tpu.io.fasta as fa
    from phylonium_tpu.io.fasta import FastaError, read_fasta

    rng = np.random.default_rng(23)
    alphabet = np.frombuffer(b"ACGTacgtNnRyKm", np.uint8)
    recs = []
    for k in range(6):
        body = alphabet[rng.integers(0, len(alphabet), 9000 + k)].tobytes()
        lines = b"\r\n".join(
            body[i : i + 61] for i in range(0, len(body), 61)
        )
        recs.append(b">rec%d some comment\n%s\n" % (k, lines))
    recs.append(b">allN\n" + b"N" * 5000 + b"\n")  # filters to empty
    p = tmp_path / "mix.fasta"
    p.write_bytes(b"".join(recs))

    def run():
        fa._native_filter = None
        out = read_fasta(str(p))
        used_fused = bool(fa._native_filter)
        return out, used_fused

    fused, used = run()
    monkeypatch.setattr(fa, "_native_filter", False)
    legacy = read_fasta(str(p))
    assert [s.name for s in fused] == [s.name for s in legacy]
    assert [s.nucl for s in fused] == [s.nucl for s in legacy]
    assert fused[-1].nucl == b""  # all-N record kept, empty after filter
    if not used:
        _pytest.skip("native backend unavailable; legacy path only")

    # truly empty sequence still errors with the pfasta message
    q = tmp_path / "empty.fasta"
    q.write_bytes(b">a\n\n  \n>b\nACGT\n")
    fa._native_filter = None
    with _pytest.raises(FastaError, match="Empty sequence on line 1"):
        read_fasta(str(q))
