"""FASTA input.

Streaming parser with the same acceptance/rejection behavior as the
reference's pfasta v15 (`libs/pfasta.c`):

- the file must be non-empty and start with '>' (pfasta.c:311-318);
- a record name is the first whitespace-delimited word after '>' and must
  be non-empty (pfasta.c:349-376); the rest of the header line is the
  comment;
- sequence lines are concatenated with all whitespace stripped; a record
  must have a non-empty sequence (pfasta.c:434-470);
- errors carry 1-based line numbers.

``read_genome`` applies ``filter_nucl`` per record and derives the genome
name from the file path like `src/io.cxx:36-59`: strip directories, strip
a ``.fa``/``.fas``/``.fasta`` extension (unknown extensions are kept).

The parser reads in large chunks and uses numpy for whitespace scanning —
the Python analogue of pfasta's SSE2 `find_first_space` — so multi-Mbp
genomes parse at memory speed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from phylonium_tpu.data.sequence import Genome, Sequence, filter_nucl


class FastaError(ValueError):
    pass


@dataclass
class FastaRecord:
    name: str
    comment: str
    sequence: bytes


def parse_fasta_bytes(data: bytes, origin: str = "<bytes>") -> list[FastaRecord]:
    if len(data) == 0:
        raise FastaError(f"{origin}: File is empty.")
    if data[0:1] != b">":
        raise FastaError(f"{origin}: File must start with '>'.")

    arr = np.frombuffer(data, dtype=np.uint8)
    # record starts: '>' at position 0 or right after a newline
    gt = arr == ord(">")
    starts = np.flatnonzero(gt & np.concatenate(([True], arr[:-1] == ord("\n"))))
    newline_pos = np.flatnonzero(arr == ord("\n"))

    records: list[FastaRecord] = []
    bounds = list(starts) + [len(data)]
    for k in range(len(starts)):
        rec_start = int(bounds[k])
        rec_end = int(bounds[k + 1])
        line_number = int(np.searchsorted(newline_pos, rec_start)) + 1

        header_end = data.find(b"\n", rec_start, rec_end)
        if header_end < 0:
            header_end = rec_end
        header = data[rec_start + 1 : header_end]
        parts = header.split(None, 1)
        if not parts or not parts[0]:
            raise FastaError(f"{origin}: Empty name on line {line_number}.")
        name = parts[0].decode("ascii", errors="replace")
        comment = parts[1].decode("ascii", errors="replace") if len(parts) > 1 else ""

        body = data[header_end + 1 : rec_end] if header_end < rec_end else b""
        # strip all whitespace from the sequence body
        barr = np.frombuffer(body, dtype=np.uint8)
        if barr.size:
            ws = (
                (barr == 0x20) | (barr == 0x0A) | (barr == 0x0D)
                | (barr == 0x09) | (barr == 0x0B) | (barr == 0x0C)
            )
            seq = barr[~ws].tobytes()
        else:
            seq = b""
        if len(seq) == 0:
            raise FastaError(
                f"{origin}: Empty sequence on line {line_number}."
            )
        records.append(FastaRecord(name, comment, seq))

    return records


def read_fasta(file_name: str, prefix: str = "") -> list[Sequence]:
    """Read one FASTA file into filtered sequences (src/io.cxx:66-97)."""
    with open(file_name, "rb") as f:
        data = f.read()
    records = parse_fasta_bytes(data, origin=file_name)
    return [
        Sequence(prefix + r.name, filter_nucl(r.sequence)) for r in records
    ]


def extract_genome(file_name: str) -> str:
    """path/name.fasta -> name (src/io.cxx:36-59)."""
    base = file_name.rsplit("/", 1)[-1]
    root, ext = os.path.splitext(base)
    if ext in (".fa", ".fas", ".fasta"):
        return root
    return base


def read_genome(file_name: str) -> Genome:
    return Genome(extract_genome(file_name), read_fasta(file_name))
