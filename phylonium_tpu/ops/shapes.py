"""jax-free kernel-shape math shared across the compute stack.

These derivations (VMEM-budgeted column blocks, quarter-octave shape
buckets, sublane row padding, the packed/blocked call shapes, the host
nibble pack) are pure numpy/int math, but they used to live in
ops/pallas_match — whose module import pulls jax (~1.8 s and ~400 MB of
RSS).  The device-server transport and the low-memory pipeline need the
SHAPES without the kernels, so the math lives here and pallas_match
re-exports it (single source of truth preserved; see that module for
the kernel-facing rationale of each constant).
"""

from __future__ import annotations

import numpy as np

from phylonium_tpu.core.pileup import INVALID

# columns per grid step; lane-dim friendly (multiple of 128)
DEFAULT_BLOCK_COLS = 4096
# f32 exactness bound: per-cell counts must stay below 2^24 per kernel call
_MAX_COLS_PER_CALL = 1 << 23
# approximate VMEM bytes available to one grid step's working set
_VMEM_BUDGET = 12 << 20

_PACKED_PAD = INVALID | (INVALID << 4)


def default_block_cols(n_pad: int) -> int:
    """Largest lane-aligned column block whose working set fits VMEM.

    Per column the kernel holds ~2 bytes of double-buffered uint8 input,
    4 bytes of widened i32, the 10 resident one-hot bf16 planes, and a
    partner-sum operand per row (~48 bytes/row/column).  Rounded down to
    a power of two so blocks always divide the power-of-two column
    buckets (:func:`bucket_cols`).
    """
    per_col = 48 * n_pad
    block = _VMEM_BUDGET // per_col
    block = max(128, min(DEFAULT_BLOCK_COLS * 4, block))
    return 1 << (block.bit_length() - 1)


def bucket_cols(length: int, block: int) -> int:
    """Pad a column count up to a power-of-two shape bucket.

    Remote/tunnel XLA compiles can take minutes; bucketing makes every
    genome of similar scale share one compiled executable (the padding
    columns are INVALID and contribute nothing to the counts).
    Quarter-octave granularity: at most ~4 shapes per factor of two and
    <= 25% padding waste.  Always a multiple of ``block`` (a power of
    two), and capped at 4M-column granularity for very long pileups.
    """
    n = max(length, block)
    msb = (n - 1).bit_length()
    q = min(1 << max(msb - 2, 7), _MAX_COLS_PER_CALL >> 1)
    q = max(q, block)
    return -(-n // q) * q


def _pad_rows(n: int) -> int:
    # sublane-friendly row count: the uint8 input's min tile is (32, 128)
    return max(32, -(-n // 32) * 32)


def packed_call_shape(n: int, length: int) -> tuple[int, int, int]:
    """(n_pad, block, first_chunk_cols) for the packed counting path.

    Single source of truth shared by pair_counts_pallas and the compile
    prewarm (core/pipeline.prewarm_counts) — if these derivations ever
    drifted apart the prewarm would silently compile a useless shape.
    """
    n_pad = _pad_rows(n)
    block = max(128, default_block_cols(n_pad) // 2)
    cap = _MAX_COLS_PER_CALL // 2
    l2 = -(-max(length, 1) // 2)
    cols = bucket_cols(min(l2, cap), block)
    return n_pad, block, cols


def blocked_call_shape(
    n: int, length: int, row_block: int = 512
) -> tuple[int, int, int]:
    """(rb_pad, block, first_chunk_cols) for the packed row-blocked path.

    Single source of truth shared by pair_counts_pallas_blocked and the
    compile prewarm, like :func:`packed_call_shape` for the flat path.
    """
    rb_pad = _pad_rows(row_block)
    block = max(128, default_block_cols(2 * rb_pad) // 2)
    cap = _MAX_COLS_PER_CALL // 2
    l2 = -(-max(length, 1) // 2)
    cols = bucket_cols(min(l2, cap), block)
    return rb_pad, block, cols


def pack_states(
    states: np.ndarray, n_pad: int, width: int | None = None
) -> np.ndarray:
    """Split-layout nibble packing: byte [g, j] = state[g, j] |
    state[g, j + L2] << 4 with L2 = ceil(L/2) (odd tails pad INVALID).
    Halves transfer + HBM bytes; states are 0..10 so they fit 4 bits.
    ``width`` right-pads with packed-INVALID columns (padding on host
    saves a device pad program per run).

    One native pass when available (the numpy formulation's temporaries
    cost ~13 s at 1000 x 1 Mbp scale; the C++ pass is ~1 s).
    """
    n, length = states.shape
    l2 = -(-max(length, 1) // 2)
    width = max(width or l2, l2)
    try:
        from phylonium_tpu.native import pack_states_native

        return pack_states_native(states, n_pad, width)
    except Exception:
        pass
    lo = np.full((n, l2), INVALID, dtype=np.uint8)
    hi = np.full((n, l2), INVALID, dtype=np.uint8)
    lo[:, : min(l2, length)] = states[:, :l2]
    hi[:, : length - l2] = states[:, l2:]
    out = np.full((n_pad, width), _PACKED_PAD, dtype=np.uint8)
    out[:n, :l2] = lo | (hi << 4)
    return out
