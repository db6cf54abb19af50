"""Fused Pallas pair-counting kernel — the flagship device kernel.

The XLA einsum path (ops/match_matrix.py) materializes one-hot planes in
HBM (~40x the pileup's byte volume).  This kernel streams pileup column
blocks through VMEM once and does everything on-chip:

    per grid step (one [N_pad, B] uint8 block):
      valid   = blk != INVALID                  (VPU)
      homs   += valid @ valid.T                 (MXU)
      for each state s (static 10-iteration loop):
        pa    = (blk == s)                      (VPU)
        qb    = OR_t in partners(s) (blk == t)  (VPU; <=3 compares)
        macc += pa @ qb.T                       (MXU)

``partners(s)`` enumerates the states matching s per the match table
(ops/match_table.py) — at most 3, so the whole decode stays in registers
/ VMEM and HBM traffic is exactly the N*L pileup bytes.

Accumulation is f32 (exact for integer counts < 2^24); the wrapper chunks
longer pileups and accumulates int64 on host, so results stay bit-exact
for any genome length.  Equality with the XLA path and the numpy oracle
is asserted in tests/test_pallas_match.py.

This kernel is the TPU replacement for the reference's AVX/SSE mismatch
loops (libs/seqcmp*.c, libs/revseqcmp*.c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylonium_tpu.core.pileup import INVALID, N_STATES
from phylonium_tpu.ops.match_table import MATCH_TABLE

# shape math (jax-free, shared with the device-server/low-mem paths):
# re-exported here so kernel-side callers keep one import surface
from phylonium_tpu.ops.shapes import (  # noqa: F401
    DEFAULT_BLOCK_COLS,
    _MAX_COLS_PER_CALL,
    _PACKED_PAD,
    _VMEM_BUDGET,
    _pad_rows,
    blocked_call_shape,
    bucket_cols,
    default_block_cols,
    pack_states,
    packed_call_shape,
)

# partners(s) = states t with MATCH_TABLE[s, t] == 1 (static)
_PARTNERS: tuple[tuple[int, ...], ...] = tuple(
    tuple(int(t) for t in np.flatnonzero(MATCH_TABLE[s, :N_STATES]))
    for s in range(N_STATES)
)


def _accumulate(blk, matches_ref, homs_ref):
    """Shared count body over one widened-i32 [N_pad, B] column block.

    Computes the 10 one-hot state planes once; each state's partner
    plane is then a bf16 SUM of base planes (partner states are
    distinct, so sum == OR exactly) — ~11 VPU compares per element
    instead of ~35.
    """

    def outer(x, y):
        return jax.lax.dot_general(
            x,
            y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    valid = (blk != INVALID).astype(jnp.bfloat16)
    homs_ref[:] += outer(valid, valid)

    planes = [
        (blk == s).astype(jnp.bfloat16) for s in range(N_STATES)
    ]
    macc = jnp.zeros_like(matches_ref)
    for s in range(N_STATES):
        partners = _PARTNERS[s]
        qb = planes[partners[0]]
        for t in partners[1:]:
            qb = qb + planes[t]
        macc = macc + outer(planes[s], qb)
    matches_ref[:] += macc


def _count_kernel(states_ref, matches_ref, homs_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        matches_ref[:] = jnp.zeros_like(matches_ref)
        homs_ref[:] = jnp.zeros_like(homs_ref)

    # widen to i32 for the VPU compares (Mosaic has no i8 compare on v5e)
    _accumulate(states_ref[:].astype(jnp.int32), matches_ref, homs_ref)


def _count_kernel_packed(states_ref, matches_ref, homs_ref):
    """Packed variant: each byte carries two pileup states (split
    layout — low nibble = logical column j, high nibble = column
    j + L/2), halving both the host->device transfer and the kernel's
    HBM traffic.  Column sums are order-invariant, so processing the
    two halves concatenated is exact."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        matches_ref[:] = jnp.zeros_like(matches_ref)
        homs_ref[:] = jnp.zeros_like(homs_ref)

    raw = states_ref[:].astype(jnp.int32)
    blk = jnp.concatenate([raw & 15, raw >> 4], axis=1)
    _accumulate(blk, matches_ref, homs_ref)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "packed")
)
def _pallas_counts(
    states: jnp.ndarray,
    block: int,
    interpret: bool = False,
    packed: bool = False,
):
    n_pad, length = states.shape
    # bucket_cols only yields block multiples for power-of-two blocks; a
    # non-multiple width would silently drop trailing columns from grid
    assert block & (block - 1) == 0 and length % block == 0, (
        block,
        length,
    )
    grid = (length // block,)

    matches, homs = pl.pallas_call(
        _count_kernel_packed if packed else _count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(states)
    # stacked [2, n, n] so callers fetch one array (every extra device
    # op / fetch is a separately compiled+loaded program on a tunnel)
    return jnp.stack((matches, homs))


def _cross_accumulate(mine, everyone, matches_ref, homs_ref):
    def outer(x, y):
        return jax.lax.dot_general(
            x,
            y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    valid_a = (mine != INVALID).astype(jnp.bfloat16)
    valid_b = (everyone != INVALID).astype(jnp.bfloat16)
    homs_ref[:] += outer(valid_a, valid_b)

    # one-hot planes once; partner planes by exact bf16 sums (see
    # _accumulate)
    planes_b = [
        (everyone == s).astype(jnp.bfloat16) for s in range(N_STATES)
    ]
    macc = jnp.zeros_like(matches_ref)
    for s in range(N_STATES):
        pa = (mine == s).astype(jnp.bfloat16)
        partners = _PARTNERS[s]
        qb = planes_b[partners[0]]
        for t in partners[1:]:
            qb = qb + planes_b[t]
        macc = macc + outer(pa, qb)
    matches_ref[:] += macc


def _cross_kernel(mine_ref, everyone_ref, matches_ref, homs_ref):
    """Rectangular variant: my row block vs all rows (sharded path)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        matches_ref[:] = jnp.zeros_like(matches_ref)
        homs_ref[:] = jnp.zeros_like(homs_ref)

    _cross_accumulate(
        mine_ref[:].astype(jnp.int32),
        everyone_ref[:].astype(jnp.int32),
        matches_ref,
        homs_ref,
    )


def _cross_kernel_packed(mine_ref, everyone_ref, matches_ref, homs_ref):
    """Packed rectangular variant (split-nibble layout, see
    _count_kernel_packed)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        matches_ref[:] = jnp.zeros_like(matches_ref)
        homs_ref[:] = jnp.zeros_like(homs_ref)

    mine = mine_ref[:].astype(jnp.int32)
    everyone = everyone_ref[:].astype(jnp.int32)
    _cross_accumulate(
        jnp.concatenate([mine & 15, mine >> 4], axis=1),
        jnp.concatenate([everyone & 15, everyone >> 4], axis=1),
        matches_ref,
        homs_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "packed")
)
def cross_counts_pallas(
    mine: jnp.ndarray,
    everyone: jnp.ndarray,
    block: int,
    interpret: bool = False,
    packed: bool = False,
):
    """[Na, L] x [Nb, L] -> (matches, homs) [Na, Nb] int32.

    Both inputs must be row-padded (multiples of 32 rows) and share a
    column count that is a multiple of ``block``, holding at most
    ``_MAX_COLS_PER_CALL`` logical columns (f32 exactness; a packed
    column carries two).  jit/shard_map-composable: runs entirely on
    device and returns device arrays.
    """
    na, length = mine.shape
    nb, _ = everyone.shape
    assert block & (block - 1) == 0 and length % block == 0, (
        block,
        length,
    )
    grid = (length // block,)

    matches, homs = pl.pallas_call(
        _cross_kernel_packed if packed else _cross_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (na, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nb, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((na, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((na, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na, nb), jnp.float32),
            jax.ShapeDtypeStruct((na, nb), jnp.float32),
        ],
        interpret=interpret,
    )(mine, everyone)
    return matches.astype(jnp.int32), homs.astype(jnp.int32)


# INVALID in both nibbles — the packed padding byte
# (_PACKED_PAD, packed_call_shape, blocked_call_shape and pack_states
# live in ops/shapes.py — jax-free — and are re-exported above)


def pair_counts_pallas(
    states,
    block: int | None = None,
    interpret: bool = False,
    packed: bool | None = None,
    n_rows: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs (substitutions, homologs) via the fused kernel.

    ``states``: [N, L] uint8 pileup.  Host numpy input takes the packed
    path (4-bit split-layout, half the transfer and HBM traffic); device
    input streams unpacked.  Exact int64 results for any L (host-side
    chunking keeps f32 accumulators exact).

    ``packed=True`` with a device-array input marks it as ALREADY in the
    split-nibble layout (row-padded, width bucketed — the streaming
    feeder ships rows this way while mapping still runs); ``n_rows``
    then gives the logical genome count.
    """
    n, length = states.shape
    pre_packed = packed is True and not isinstance(states, np.ndarray)
    if pre_packed:
        n = n_rows if n_rows is not None else n
        n_pad = states.shape[0]
        if block is None:
            block = max(128, default_block_cols(n_pad) // 2)
    else:
        n_pad = _pad_rows(n)

    packed = True if pre_packed else isinstance(states, np.ndarray)
    if pre_packed:
        cap = _MAX_COLS_PER_CALL // 2
    elif packed:
        cap = _MAX_COLS_PER_CALL // 2
        l2 = -(-max(states.shape[1], 1) // 2)
        if block is None:
            _, block, width = packed_call_shape(n, states.shape[1])
            if l2 > cap:
                width = l2
        else:
            width = bucket_cols(l2, block) if l2 <= cap else l2
        states = jnp.asarray(pack_states(states, n_pad, width))
    else:
        if block is None:
            block = default_block_cols(n_pad)
        cap = _MAX_COLS_PER_CALL
        if n_pad != n:
            states = jnp.pad(
                states, ((0, n_pad - n), (0, 0)), constant_values=INVALID
            )

    matches = np.zeros((n_pad, n_pad), dtype=np.int64)
    homs = np.zeros((n_pad, n_pad), dtype=np.int64)

    width = states.shape[1]
    fill = _PACKED_PAD if packed else INVALID
    results = []  # dispatch all chunks, fetch once (async pipelining)
    for start in range(0, max(width, 1), cap):
        chunk = states[:, start : start + cap]
        clen = chunk.shape[1]
        pad = bucket_cols(clen, block) - clen
        if pad:
            chunk = jnp.pad(
                chunk, ((0, 0), (0, pad)), constant_values=fill
            )
        results.append(_pallas_counts(chunk, block, interpret, packed))
    # one stacked fetch: each host<->device round trip has a large fixed
    # latency on tunnelled deployments, so never fetch arrays one by one
    if len(results) == 1:
        stacked = np.asarray(results[0]).astype(np.int64)[None]
    else:
        stacked = np.asarray(jnp.stack(results)).astype(np.int64)
    matches += stacked[:, 0].sum(axis=0)
    homs += stacked[:, 1].sum(axis=0)

    matches = matches[:n, :n]
    homs = homs[:n, :n]
    subs = homs - matches
    np.fill_diagonal(subs, 0)
    np.fill_diagonal(homs, 0)
    return subs, homs


def pair_counts_pallas_blocked(
    states,
    row_block: int = 512,
    block: int | None = None,
    interpret: bool = False,
    progress=None,
    packed: bool | None = None,
    n_rows: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Row-blocked variant for very large N on a single chip.

    Tiles the output matrix into ``row_block x row_block`` panels and
    computes only the upper triangle with the rectangular kernel, keeping
    VMEM pressure independent of N.  Bit-identical to the flat path.
    ``progress`` receives the dispatched panel fraction.

    ``packed=True`` with a device-array input marks it as already in the
    split-nibble layout (see :func:`pair_counts_pallas`); ``n_rows``
    then gives the logical genome count (the array may carry padding
    rows beyond it).
    """
    pre_packed = packed is True and not isinstance(states, np.ndarray)
    n = (
        n_rows
        if pre_packed and n_rows is not None
        else states.shape[0]
    )
    length = states.shape[1]
    if n <= row_block:
        return pair_counts_pallas(
            states, block=block, interpret=interpret,
            packed=True if pre_packed else None, n_rows=n,
        )

    rb_pad = _pad_rows(row_block)
    if pre_packed:
        if block is None:
            block = max(128, default_block_cols(2 * rb_pad) // 2)
        cap = _MAX_COLS_PER_CALL // 2
        fill = _PACKED_PAD
        packed = True
    elif isinstance(states, np.ndarray):
        if block is None:
            _, block, _ = blocked_call_shape(n, length, row_block)
        cap = _MAX_COLS_PER_CALL // 2
        l2 = -(-max(length, 1) // 2)
        # bucket the width on the host: the device-side composition
        # then needs zero per-panel padding ops
        width = bucket_cols(l2, block) if l2 <= cap else l2
        states = jnp.asarray(pack_states(states, n, width))
        fill = _PACKED_PAD
        packed = True
    else:
        if block is None:
            block = default_block_cols(2 * rb_pad)
        cap = _MAX_COLS_PER_CALL
        fill = INVALID
        packed = False
    return blocked_counts_device(
        (states,), n,
        row_block=row_block, block=block, cap=cap, fill=fill,
        packed=packed, interpret=interpret, progress=progress,
    )


# Dispatch-lean device composition.
#
# Two measured facts about tunnelled deployments shape this code:
#  1. any NEW program that contains a pallas call costs minutes through
#     the remote compile service, and large multi-kernel programs
#     re-finalize expensively in EVERY process (25-183 s observed) even
#     on a persistent-cache hit;
#  2. a lone, already-compiled kernel program loads and first-executes
#     in <1 s, and eager dispatches are async — only fetches block.
#
# So: compose from the SAME single-kernel jitted programs the rest of
# the package uses (maximizing compile-cache reuse), glue them with a
# few tiny pallas-free jitted programs (cheap to compile, cheap to
# finalize), dispatch everything asynchronously, and fetch ONCE.


@jax.jit
def _concat_rows(chunks):
    """Row-concatenate shipped chunks (pallas-free; trivial compile)."""
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)


@functools.partial(
    jax.jit, static_argnames=("row_block", "rb_pad", "n", "fill")
)
def _panel_rows(states, row_block, rb_pad, n, fill):
    """Split [n, width] into per-block [rb_pad, width] padded row panels
    (returned as a tuple, so downstream kernel calls need no further
    slicing ops).  Pallas-free; trivial compile."""
    out = []
    for i in range(-(-n // row_block)):
        lo = i * row_block
        hi = min(lo + row_block, n)
        blk = states[lo:hi]
        if hi - lo < rb_pad:
            blk = jnp.pad(
                blk, ((0, rb_pad - (hi - lo)), (0, 0)),
                constant_values=fill,
            )
        out.append(blk)
    return tuple(out)


@jax.jit
def _stack_pairs(results):
    """Stack per-panel (matches, homs) pairs into one fetchable array
    (pallas-free; trivial compile)."""
    return jnp.stack([jnp.stack(mh) for mh in results])


def _col_chunks(dev, block, cap, fill):
    """Column-chunk a packed device array at the f32-exactness cap,
    bucket-padding each chunk.  Only genomes beyond ~2x the cap (> 16.8
    Mbp) take more than one chunk; the feeder buckets the width on the
    host, so the common case is exactly one chunk and zero device ops."""
    width = dev.shape[1]
    out = []
    for start in range(0, max(width, 1), cap):
        chunk = dev[:, start : start + cap]
        pad = bucket_cols(chunk.shape[1], block) - chunk.shape[1]
        if pad:
            chunk = jnp.pad(
                chunk, ((0, 0), (0, pad)), constant_values=fill
            )
        out.append(chunk)
    return out


def flat_counts_device(
    chunks,
    n: int,
    *,
    block: int,
    packed: bool = True,
    interpret: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs counting over device-resident packed row chunks whose
    rows concatenate to the flat kernel's [n_pad, width] input (the
    streaming feeder's n <= 512 path).  Reuses the exact
    ``_pallas_counts`` program the one-shot packed path compiles, so the
    shipped compile-cache store covers it."""
    cap = _MAX_COLS_PER_CALL // (2 if packed else 1)
    fill = _PACKED_PAD if packed else INVALID
    chunks = tuple(chunks)
    dev = chunks[0] if len(chunks) == 1 else _concat_rows(chunks)
    results = [
        _pallas_counts(chunk, block, interpret, packed)
        for chunk in _col_chunks(dev, block, cap, fill)
    ]
    if len(results) == 1:
        stacked = np.asarray(results[0]).astype(np.int64)[None]
    else:
        stacked = np.asarray(jnp.stack(results)).astype(np.int64)
    matches = stacked[:, 0].sum(axis=0)[:n, :n]
    homs = stacked[:, 1].sum(axis=0)[:n, :n]
    subs = homs - matches
    np.fill_diagonal(subs, 0)
    np.fill_diagonal(homs, 0)
    return subs, homs


def blocked_counts_device(
    chunks,
    n: int,
    *,
    row_block: int = 512,
    block: int | None = None,
    cap: int | None = None,
    fill: int | None = None,
    packed: bool = True,
    interpret: bool = False,
    progress=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Row-blocked all-pairs counting over device-resident row chunks
    (packed split-nibble layout unless ``packed=False``).

    ``chunks`` is a tuple of [rows_i, width] device arrays whose rows
    concatenate to the full panel; the streaming feeder passes the
    groups it shipped during mapping, the one-shot path passes a single
    array.  Every pallas dispatch goes through the one shared
    ``cross_counts_pallas`` program; all dispatches are async and the
    results land in a single stacked fetch.  int32 device accumulation
    is exact: per-cell counts are bounded by the genome length (< 2^31).
    """
    rb_pad = _pad_rows(row_block)
    if block is None:
        block = (
            max(128, default_block_cols(2 * rb_pad) // 2)
            if packed
            else default_block_cols(2 * rb_pad)
        )
    if cap is None:
        cap = _MAX_COLS_PER_CALL // (2 if packed else 1)
    if fill is None:
        fill = _PACKED_PAD if packed else INVALID

    n_blocks = -(-n // row_block)
    all_panels = tuple(
        (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
    )

    chunks = tuple(chunks)
    dev = chunks[0] if len(chunks) == 1 else _concat_rows(chunks)
    panels = _panel_rows(dev, row_block, rb_pad, n, fill)
    panel_cols = [_col_chunks(p, block, cap, fill) for p in panels]

    results = []
    for k, (i, j) in enumerate(all_panels):
        if progress is not None:
            # dispatches are async; completion lands at the stacked
            # fetch, so cap the dispatch fraction below 100%
            progress(0.9 * k / len(all_panels))
        m_acc = None
        h_acc = None
        for ca, cb in zip(panel_cols[i], panel_cols[j]):
            mm, hh = cross_counts_pallas(ca, cb, block, interpret, packed)
            m_acc = mm if m_acc is None else m_acc + mm
            h_acc = hh if h_acc is None else h_acc + hh
        results.append((m_acc, h_acc))

    # single stacked fetch — per-array round trips cost seconds each on
    # tunnelled deployments (measured: 6 x [512,512] fetches = 17s)
    stacked = np.asarray(_stack_pairs(tuple(results))).astype(np.int64)

    matches = np.zeros((n, n), dtype=np.int64)
    homs = np.zeros((n, n), dtype=np.int64)
    for idx, (i, j) in enumerate(all_panels):
        alo, ahi = i * row_block, min((i + 1) * row_block, n)
        blo, bhi = j * row_block, min((j + 1) * row_block, n)
        matches[alo:ahi, blo:bhi] = stacked[idx, 0, : ahi - alo, : bhi - blo]
        homs[alo:ahi, blo:bhi] = stacked[idx, 1, : ahi - alo, : bhi - blo]
        if j > i:
            matches[blo:bhi, alo:ahi] = matches[alo:ahi, blo:bhi].T
            homs[blo:bhi, alo:ahi] = homs[alo:ahi, blo:bhi].T

    subs = homs - matches
    np.fill_diagonal(subs, 0)
    np.fill_diagonal(homs, 0)
    return subs, homs
