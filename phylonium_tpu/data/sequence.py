"""Sequence data model.

Behavioral parity notes (all citations into /root/reference):

- ``Sequence``/``Genome`` mirror `src/sequence.h:18-160`.
- ``revcomp`` mirrors the complement bit trick `src/sequence.cxx:84-94`:
  bytes below ``'A'`` are passed through unchanged; everything else is
  complemented with ``c ^= (c & 2) ? 4 : 21``.
- ``filter_nucl`` mirrors `src/sequence.cxx:109-146`: keep only ACGTacgt,
  uppercasing as we go.
- ``gc_content`` mirrors `src/sequence.cxx:152-165`: a byte counts as G/C
  iff ``(c & 'G' & 'C') == ('G' & 'C')`` (i.e. ``(c & 0x43) == 0x43``).
- ``join`` mirrors `src/sequence.cxx:171-199`: contigs are concatenated
  with a ``'!'`` separator so exact matches can never span contig borders.

Sequences are stored as ``bytes`` (ASCII) and exposed as numpy ``uint8``
views for vectorized host work and zero-copy device upload.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Technical sequence-length limit, mirroring src/sequence.cxx:36-42
# (64-bit index => limit 2^62).
LENGTH_LIMIT = 1 << 62

# Contig separator used by join(); matches never span it because it does
# not occur in any query's match alphabet (src/sequence.cxx:189).
SEPARATOR = 0x21  # b'!'


def _build_revcomp_table() -> np.ndarray:
    table = np.arange(256, dtype=np.uint8)
    for c in range(ord("A"), 256):
        table[c] = c ^ (4 if (c & 2) else 21)
    return table


def _build_filter_table() -> np.ndarray:
    # 0 = drop; otherwise the (uppercased) replacement byte.
    table = np.zeros(256, dtype=np.uint8)
    for ch in b"ACGT":
        table[ch] = ch
        table[ch + 32] = ch  # lowercase
    return table


_REVCOMP_TABLE = _build_revcomp_table()
_FILTER_TABLE = _build_filter_table()


def revcomp(nucl: bytes) -> bytes:
    """Reverse complement of an ASCII nucleotide string."""
    arr = np.frombuffer(nucl, dtype=np.uint8)
    return _REVCOMP_TABLE[arr[::-1]].tobytes()


def filter_nucl(raw: bytes) -> bytes:
    """Keep only canonical nucleotides (ACGT), uppercased."""
    if len(raw) >= (1 << 16):
        # one native pass beats the three numpy passes on big contigs
        try:
            from phylonium_tpu.native import filter_nucl_native

            return filter_nucl_native(raw)
        except Exception:
            pass
    arr = np.frombuffer(raw, dtype=np.uint8)
    mapped = _FILTER_TABLE[arr]
    return mapped[mapped != 0].tobytes()


def gc_content(nucl: bytes) -> float:
    """Fraction of G/C bytes (by the reference's bitmask test)."""
    arr = np.frombuffer(nucl, dtype=np.uint8)
    if arr.size == 0:
        return float("nan")
    gc = int(np.count_nonzero((arr & 0x43) == 0x43))
    return gc / arr.size


@dataclass
class Sequence:
    """A named nucleotide string (one joined genome or one contig)."""

    name: str = ""
    nucl: bytes = b""

    def __post_init__(self) -> None:
        if len(self.nucl) > LENGTH_LIMIT:
            raise ValueError(
                f"The input sequence {self.name} is too long. "
                f"The technical limit is {LENGTH_LIMIT}."
            )

    def __len__(self) -> int:
        return len(self.nucl)

    @property
    def size(self) -> int:
        return len(self.nucl)

    def as_array(self) -> np.ndarray:
        """Zero-copy uint8 view of the nucleotides."""
        return np.frombuffer(self.nucl, dtype=np.uint8)

    def gc_content(self) -> float:
        return gc_content(self.nucl)

    def to_fasta(self, line_length: int = 70) -> str:
        """FASTA rendering (src/sequence.cxx:48-66)."""
        lines = [f">{self.name}"]
        for i in range(0, len(self.nucl), line_length):
            lines.append(self.nucl[i : i + line_length].decode("ascii"))
        return "\n".join(lines) + "\n"


@dataclass
class Genome:
    """All contigs read from one FASTA file (src/sequence.h:96-160)."""

    name: str = ""
    contigs: list[Sequence] = field(default_factory=list)

    @property
    def joined_length(self) -> int:
        if not self.contigs:
            return 0
        return sum(len(c) for c in self.contigs) + len(self.contigs) - 1


def join(gen: Genome) -> Sequence:
    """Linearize a genome into one sequence with '!' separators."""
    contigs = gen.contigs
    if len(contigs) == 0:
        return Sequence()
    if len(contigs) == 1:
        # use genome name, not sequence name (src/sequence.cxx:179-182)
        return Sequence(gen.name, contigs[0].nucl)
    return Sequence(gen.name, b"!".join(c.nucl for c in contigs))
