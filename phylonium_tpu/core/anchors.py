"""Anchor finding and homology extraction.

Mirrors ``anchor_homologies`` (`src/process.cxx:198-295`) step for step —
the exact-parity rules documented there:

- an *anchor* is a longest match that is unique in the index
  (SA interval ``i == j``) and at least ``threshold`` long
  (src/process.cxx:219-225);
- a *lucky anchor* is a cheap direct-text LCP check at the
  diagonal-projected position, attempted when the gap since the last
  anchor is at most ``threshold``; it needs no uniqueness
  (src/process.cxx:227-242);
- a *right anchor* is equidistant on subject and query
  (``this_pos_Q - end_Q == this_pos_S - end_S``), strictly right of the
  last anchor, and on the same strand side of the '#' border
  (src/process.cxx:251-253); it extends the open homology across the gap;
- otherwise the open homology is closed (kept iff it ended in a right
  anchor or its single anchor satisfies ``last_length / 2 >= threshold``,
  src/process.cxx:261,289) and a new one is opened;
- the query cursor advances by ``this_length + 1`` even after failed
  anchor probes (src/process.cxx:281);
- identical-sequence special case (src/process.cxx:284-287).

This Python implementation is the correctness oracle; the C++ backend
(phylonium_tpu/native) implements the same loop for production speed and
is tested for bit-identical output.
"""

from __future__ import annotations

from phylonium_tpu.core.homology import Homology
from phylonium_tpu.data.sequence import Sequence
from phylonium_tpu.index.esa import ESAIndex
from phylonium_tpu.index.esa_numpy import lcp_bytes


def anchor_homologies(ref: ESAIndex, threshold: int, seq: Sequence
                      ) -> list[Homology]:
    hv: list[Homology] = []

    border = ref.size // 2
    q = seq.as_array()
    query_length = len(seq)

    last_pos_Q = 0
    last_pos_S = 0
    last_length = 0
    last_was_right_anchor = False

    this_pos_Q = 0
    this_pos_S = 0
    this_length = 0

    current = Homology.at(0, 0)

    S = ref.S
    SA = ref.SA

    def anchor() -> bool:
        nonlocal this_pos_S, this_length
        l, i, j = ref.longest_match(q, this_pos_Q, query_length - this_pos_Q)
        this_length = max(l, 0)
        this_pos_S = int(SA[i])
        return i == j and this_length >= threshold

    def lucky_anchor() -> bool:
        nonlocal this_pos_S, this_length
        advance = this_pos_Q - last_pos_Q
        gap = this_pos_Q - last_pos_Q - last_length
        try_pos_S = last_pos_S + advance

        if try_pos_S >= ref.size or gap > threshold:
            return False

        this_pos_S = try_pos_S
        this_length = lcp_bytes(
            q, this_pos_Q, S, try_pos_S, query_length - this_pos_Q
        )
        return this_length >= threshold

    while this_pos_Q < query_length:
        if lucky_anchor() or anchor():
            end_S = last_pos_S + last_length
            end_Q = last_pos_Q + last_length
            if (
                this_pos_S > end_S
                and this_pos_Q - end_Q == this_pos_S - end_S
                and (this_pos_S < border) == (last_pos_S < border)
            ):
                # right anchor: extend across the gap
                current.extend(this_pos_Q - end_Q + this_length)
                last_was_right_anchor = True
            else:
                # left anchor: maybe push the previous homology, open new
                if last_was_right_anchor or last_length // 2 >= threshold:
                    current.reverse_eh(border)
                    hv.append(current)
                current = Homology.at(this_pos_S, this_pos_Q, this_length)
                last_was_right_anchor = False

            last_pos_Q = this_pos_Q
            last_pos_S = this_pos_S
            last_length = this_length

        this_pos_Q += this_length + 1

    # Very special case: the sequences are identical
    if last_length >= query_length:
        current = Homology.at(last_pos_S, 0, query_length)

    if last_was_right_anchor or last_length // 2 >= threshold:
        current.reverse_eh(border)
        hv.append(current)

    return hv
