"""Device-side pileup construction from packed queries + intervals.

The host pileup (core/pileup.py) materializes the [N, ref_len] uint8
state matrix on host and ships it to the device — N*L bytes over the
host<->device link.  This op ships ~N*L/4 bytes instead (2-bit-packed
query bases + a sparse separator list + one interval record per
homology) and rebuilds the identical state matrix on device:

1. unpack 2-bit codes (pure reshape/shift math, no gather);
2. per genome, rasterize its disjoint homology intervals onto reference
   columns: coverage via scatter(+1/-1) + cumsum; per-column query base
   index and strand via scatter-at-starts + carry-forward
   ``associative_scan`` (intervals are start-sorted, as the overlap
   filter guarantees);
3. one gather from the concatenated query codes, then
   ``state = code + 5*strand`` or INVALID — byte-identical to
   core/pileup.build_pileup (asserted in tests/test_pileup_device.py).

The result stays on device and feeds the counting kernels directly, so
the full compare phase does one small upload and one [N, N] download.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phylonium_tpu.config import ConfigError
from phylonium_tpu.core.homology import REVERSE, Homology
from phylonium_tpu.core.pileup import INVALID, N_BASE

# byte codes: A=0 C=1 G=2 T=3, '!' separators carried sparsely as code 4
_SEP_BYTE = ord("!")


def pack_queries(queries: list[np.ndarray]):
    """Concatenate and 2-bit-pack query byte arrays.

    Returns (packed uint8 [ceil(T/4)], sep_idx int64 [S], bases int64
    [N+1]) where T = total bases and sep_idx are global positions of
    '!' contig separators (code 4, unrepresentable in 2 bits).
    """
    try:
        from phylonium_tpu.native import pack2_native

        return pack2_native(queries)
    except Exception:
        return _pack_queries_numpy(queries)


def _pack_queries_numpy(queries: list[np.ndarray]):
    """Numpy oracle for :func:`pack_queries` (bit-parity asserted in
    tests/test_pileup_device.py; ~2 s per 128-genome group vs ~0.15 s
    for the native pass on this 1-core host)."""
    bases = np.zeros(len(queries) + 1, np.int64)
    for k, q in enumerate(queries):
        bases[k + 1] = bases[k] + len(q)
    cat = (
        np.concatenate(queries) if queries else np.zeros(0, np.uint8)
    )
    codes = np.zeros(len(cat), np.uint8)
    codes[cat == 67] = 1
    codes[cat == 71] = 2
    codes[cat == 84] = 3
    sep_idx = np.flatnonzero(cat == _SEP_BYTE).astype(np.int64)
    pad = (-len(codes)) % 4
    if pad:
        codes = np.pad(codes, (0, pad))
    quads = codes.reshape(-1, 4)
    packed = (
        quads[:, 0]
        | (quads[:, 1] << 2)
        | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    return packed, sep_idx, bases


def intervals_from_homologies(
    homologies: list[list[Homology]], bases: np.ndarray, ref_len: int
) -> np.ndarray:
    """[N, Hmax, 4] int64 (start, end, B, dir) interval records.

    ``B`` encodes the per-column query index: for a forward interval the
    query position of reference column r is ``B + r``; for a reverse
    interval it is ``B - r`` (global coordinates into the concatenated
    query array).  Padding rows scatter into the out-of-range slot
    ``ref_len`` and are sliced away on device.
    """
    n = len(homologies)
    hmax = max((len(h) for h in homologies), default=0)
    hmax = max(hmax, 1)
    out = np.full((n, hmax, 4), ref_len, dtype=np.int64)
    out[:, :, 3] = 0
    for g, hv in enumerate(homologies):
        if isinstance(hv, np.ndarray):
            # raw [H, 5] int64 rows (direction, ir, irp, iq, length) —
            # the low-memory pipeline's representation; vectorized
            if not len(hv):
                continue
            d, irp, iq, ln = hv[:, 0], hv[:, 2], hv[:, 3], hv[:, 4]
            keep = ln > 0
            d, irp, iq, ln = d[keep], irp[keep], iq[keep], ln[keep]
            order = np.argsort(irp, kind="stable")
            d, irp, iq, ln = d[order], irp[order], iq[order], ln[order]
            giq = bases[g] + iq
            b = np.where(d == REVERSE, giq + ln - 1 + irp, giq - irp)
            out[g, : len(irp), 0] = irp
            out[g, : len(irp), 1] = irp + ln
            out[g, : len(irp), 2] = b
            out[g, : len(irp), 3] = d
            continue
        # drop zero-length entries BEFORE filling: a skipped slot mid-list
        # would leave a fill row (start == end == ref_len) inside the
        # delta chain, corrupting the telescoped B/dir fills of every
        # later interval of this genome (host build_pileup skips them
        # too, core/pileup.py)
        hv = sorted(
            (h for h in hv if h.length > 0), key=lambda h: h.start()
        )
        for k, h in enumerate(hv):
            start, end = h.start(), h.end()
            iq = bases[g] + h.index_query
            if h.direction == REVERSE:
                b = iq + h.length - 1 + start  # query idx of col r: b - r
            else:
                b = iq - start  # query idx of col r: b + r
            out[g, k] = (start, end, b, h.direction)
    return out


def _build_core(packed, sep_idx, intervals, ref_len: int):
    # 1. 2-bit codes stay PACKED — the per-column fetch gathers the
    # byte and shifts out the code in place.  (Materializing the
    # unpacked [T/4, 4] quad array looks harmless but its TPU tiled
    # layout pads the minor dim 4 -> 128: a 32x, tens-of-GB HBM
    # allocation at genome scale that OOMs the compile.)  Separator
    # ('!') positions — unrepresentable in 2 bits — live in an
    # on-device bitmap built from the sparse index list.
    # Covered columns always index real query bases, so trailing pack
    # padding is never read through a covered column.
    p = packed.astype(jnp.uint8)
    total = p.shape[0] * 4
    sep32 = sep_idx.astype(jnp.int32)
    bitmap = jnp.zeros((total + 7) // 8, jnp.uint8)
    bitmap = bitmap.at[sep32 >> 3].add(
        (1 << (sep32 & 7)).astype(jnp.uint8), mode="drop"
    )

    def fetch_codes(qidx):
        byte = p[qidx >> 2]
        code2 = (byte >> (2 * (qidx & 3)).astype(jnp.uint8)) & 3
        sep = (bitmap[qidx >> 3] >> (qidx & 7).astype(jnp.uint8)) & 1
        return jnp.where(sep == 1, jnp.uint8(4), code2)

    intervals = intervals.astype(jnp.int32)
    starts = intervals[:, :, 0]
    ends = intervals[:, :, 1]
    bvals = intervals[:, :, 2]
    dirs = intervals[:, :, 3]

    def one_genome(starts_g, ends_g, b_g, dir_g):
        # coverage raster (disjoint intervals -> 0/1)
        delta = jnp.zeros(ref_len + 1, jnp.int32)
        delta = delta.at[starts_g].add(1, mode="drop")
        delta = delta.at[ends_g].add(-1, mode="drop")
        cov = jnp.cumsum(delta[:-1]) > 0

        # piecewise-constant (B, dir) fill by delta-cumsum: intervals are
        # start-sorted, so scattering successive differences at the
        # starts and cumsumming yields B_k/dir_k on [start_k, start_k+1)
        # — including the gaps, where stale values are masked by cov.
        # (A carry-forward associative_scan is equivalent but its vmapped
        # HLO OOM-killed the XLA compile service at genome scale.)
        db = jnp.concatenate([b_g[:1], b_g[1:] - b_g[:-1]])
        dd = dir_g.astype(jnp.int32)
        dd = jnp.concatenate([dd[:1], dd[1:] - dd[:-1]])
        bcol = jnp.zeros(ref_len + 1, jnp.int32)
        dcol = jnp.zeros(ref_len + 1, jnp.int32)
        bcol = bcol.at[starts_g].add(db, mode="drop")
        dcol = dcol.at[starts_g].add(dd, mode="drop")
        bfill = jnp.cumsum(bcol[:-1])
        dfill = jnp.cumsum(dcol[:-1])

        # int32 query indices: callers split query batches so one
        # build's concatenated total stays below 2^31 bases
        r = jnp.arange(ref_len, dtype=jnp.int32)
        qidx = jnp.where(dfill == 1, bfill - r, bfill + r)
        qidx = jnp.clip(qidx, 0, max(total - 1, 0))
        vals = fetch_codes(qidx).astype(jnp.int32)
        state = jnp.where(
            cov, vals + N_BASE * dfill, jnp.int32(INVALID)
        )
        return state.astype(jnp.uint8)

    return jax.vmap(one_genome)(starts, ends, bvals, dirs)


@functools.partial(jax.jit, static_argnames=("ref_len",))
def _build(packed, sep_idx, intervals, ref_len: int):
    return _build_core(packed, sep_idx, intervals, ref_len)


def _build_core_nosep(packed32, intervals, ref_len: int):
    """[N, ref_len] states from u32-packed codes + intervals, with NO
    per-column gather: columns are fetched 16 at a time through TWO u32
    window gathers per group (the 2-bit codes are LSB-first across the
    little-endian word, so a code's bit offset is linear in its index).
    Measured on v5e the gather IS the build cost (2.72 s full / 1.39 s
    bitmap-free / 0.065 s gather-free per 128 x 1 Mbp group): 8x fewer
    gathered elements put the build under the per-group mapping time,
    which is what lets the device compare hide behind the map phase.

    A 16-column group is fetched correctly only when it lies inside one
    interval (qidx affine, slope +-1).  Partial/boundary groups — and
    '!' separator columns, whose 2-bit slot packs as code 0 — are
    overwritten afterwards by the exact host-computed sparse overlay
    (:func:`build_overlay`), which knows the query bytes."""
    p32 = packed32.astype(jnp.uint32)
    nwords = p32.shape[0]
    total = nwords * 16  # 2-bit codes

    intervals = intervals.astype(jnp.int32)
    starts = intervals[:, :, 0]
    ends = intervals[:, :, 1]
    bvals = intervals[:, :, 2]
    dirs = intervals[:, :, 3]

    def one_genome(starts_g, ends_g, b_g, dir_g):
        delta = jnp.zeros(ref_len + 1, jnp.int32)
        delta = delta.at[starts_g].add(1, mode="drop")
        delta = delta.at[ends_g].add(-1, mode="drop")
        cov = jnp.cumsum(delta[:-1]) > 0

        db = jnp.concatenate([b_g[:1], b_g[1:] - b_g[:-1]])
        dd = dir_g.astype(jnp.int32)
        dd = jnp.concatenate([dd[:1], dd[1:] - dd[:-1]])
        bcol = jnp.zeros(ref_len + 1, jnp.int32)
        dcol = jnp.zeros(ref_len + 1, jnp.int32)
        bcol = bcol.at[starts_g].add(db, mode="drop")
        dcol = dcol.at[starts_g].add(dd, mode="drop")
        bfill = jnp.cumsum(bcol[:-1])
        dfill = jnp.cumsum(dcol[:-1])

        r = jnp.arange(ref_len, dtype=jnp.int32)
        qidx = jnp.where(dfill == 1, bfill - r, bfill + r)
        qidx = jnp.clip(qidx, 0, max(total - 1, 0))

        # window base per 16-column group: the lowest code index the
        # group touches (reverse runs descend), clamped so clean groups
        # never clip (their codes are real query positions)
        q0 = qidx[::16]
        d0 = dfill[::16]
        qmin = jnp.where(d0 == 1, q0 - 15, q0)
        qmin = jnp.clip(qmin, 0, max(total - 16, 0))
        w0i = qmin >> 4
        w0 = p32[w0i]
        w1 = p32[jnp.minimum(w0i + 1, nwords - 1)]
        wbase = jnp.repeat(w0i << 4, 16, total_repeat_length=ref_len)
        w0r = jnp.repeat(w0, 16, total_repeat_length=ref_len)
        w1r = jnp.repeat(w1, 16, total_repeat_length=ref_len)
        bit = (2 * (qidx - wbase)).astype(jnp.uint32)
        sel = bit < 32
        lo = w0r >> jnp.where(sel, bit, jnp.uint32(0))
        hi = w1r >> jnp.where(sel, jnp.uint32(0), bit - 32)
        code2 = (jnp.where(sel, lo, hi) & 3).astype(jnp.int32)
        state = jnp.where(
            cov, code2 + N_BASE * dfill, jnp.int32(INVALID)
        )
        return state.astype(jnp.uint8)

    return jax.vmap(one_genome)(starts, ends, bvals, dirs)


@functools.partial(
    jax.jit, static_argnames=("ref_len", "l2", "out_width")
)
def _build_packed(packed, intervals, orow, ocol, oval,
                  ref_len: int, l2: int, out_width: int):
    """Build pileup rows AND emit them in the counting kernels' split-
    nibble layout (ops/pallas_match.pack_states) in one program: byte j
    = state[j] | state[j + l2] << 4 for j < l2, INVALID-packed beyond.
    The streaming feeder ships 2-bit queries + interval records + the
    sparse separator overlay (a fraction of the nibble-states volume —
    the tunnel's real h2d bandwidth is the wall for device counting at
    scale) and gets chunk arrays that feed the exact same cached kernel
    programs as host packing."""
    s = _build_core_nosep(packed, intervals, ref_len)
    # sparse separator overlay (host-computed, ops order irrelevant:
    # (row, col) pairs are unique — ref intervals are disjoint); padded
    # entries carry out-of-range rows and drop
    s = s.at[orow, ocol].set(oval, mode="drop")
    if s.shape[1] < 2 * l2:
        s = jnp.pad(
            s, ((0, 0), (0, 2 * l2 - s.shape[1])),
            constant_values=INVALID,
        )
    core = s[:, :l2] | (s[:, l2 : 2 * l2] << 4)
    if out_width > l2:
        core = jnp.pad(
            core, ((0, 0), (0, out_width - l2)),
            constant_values=INVALID | (INVALID << 4),
        )
    return core[:, :out_width].astype(jnp.uint8)


def _bucket(n: int, lo: int = 128) -> int:
    """Quarter-octave size bucket (shared compiled shapes across runs)."""
    n = max(n, lo)
    q = 1 << max((n - 1).bit_length() - 2, 4)
    return -(-n // q) * q


# one build's concatenated query bases must fit int32 indexing.  The
# largest device index is a reverse interval's base b = iq + len - 1 +
# start <= group_bases + 2 * ref_len (intervals_from_homologies), so the
# group bound reserves that headroom in build_pileup_device.
_MAX_GROUP_BASES = 1 << 31


def group_payload(queries: list[np.ndarray]):
    """Host prep of one group's shippable query payload.

    Returns (packed32 uint32 — bucketed-padded 2-bit codes viewed as
    little-endian words, the windowed build's gather unit, bases int64
    [N+1], seps int64 — RAW global '!' positions in the concatenated
    group).  Separator positions stay host-side: they become part of
    the sparse overlay of :func:`build_overlay`, never a per-column
    device gather.
    """
    packed, sep_idx, bases = pack_queries(queries)
    packed = np.pad(packed, (0, _bucket(len(packed)) - len(packed)))
    return packed.view(np.uint32), bases, sep_idx


# byte -> 2-bit-code-or-separator, the host mirror of the device
# fetch semantics (A/other=0, C=1, G=2, T=3, '!'=4)
_CODE_LUT = np.zeros(256, np.uint8)
_CODE_LUT[ord("C")] = 1
_CODE_LUT[ord("G")] = 2
_CODE_LUT[ord("T")] = 3
_CODE_LUT[_SEP_BYTE] = 4


def _expand_ranges(lo: np.ndarray, hi: np.ndarray):
    """(values, owners) for the concatenation of [lo_k, hi_k) ranges."""
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if not total:
        return (
            np.zeros(0, dtype=lo.dtype),
            np.zeros(0, dtype=np.int64),
        )
    k = np.repeat(np.arange(len(lo)), counts)
    off = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return lo[k] + off, k


def build_overlay(
    intervals: np.ndarray,
    queries: list[np.ndarray],
    bases: np.ndarray,
    seps: np.ndarray,
    ref_len: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparse (row, col, state) fix-up records for one group build.

    The windowed device fetch (`_build_core_nosep`) is exact only for
    16-column groups lying wholly inside one interval.  This computes,
    from the HOST's query bytes, the exact states for

    1. every covered column of a partial group — the head
       ``[start, min(end, ceil16(start)))`` and tail
       ``[max(head_end, floor16(end)), end)`` of each interval record
       (start, end, B, dir): query position of column r is ``B + r``
       forward / ``B - r`` reverse, state = code(byte) + N_BASE*dir;
    2. every '!' separator column inside full groups (the 2-bit slot
       packs as code 0): same formula, code('!') = 4 — matching the
       reference's contig-border semantics (`src/sequence.cxx:171-199`).

    At most ~30 columns per interval plus the (rare) separators, so the
    scatter stays sparse.  (row, col) pairs repeat only with equal
    values (ref intervals are disjoint), keeping the unordered scatter
    deterministic.  Outputs are padded to a shape bucket with
    out-of-range rows (scatter mode='drop').
    """
    rows_parts, cols_parts, vals_parts = [], [], []
    n_real = min(intervals.shape[0], len(queries), len(bases) - 1)
    seps = np.asarray(seps, dtype=np.int64)
    for g in range(n_real):
        iv = intervals[g]
        st, en, b, d = iv[:, 0], iv[:, 1], iv[:, 2], iv[:, 3]
        # boundary (partial-group) columns per interval
        head_hi = np.minimum(en, (st + 15) & ~np.int64(15))
        tail_lo = np.maximum(head_hi, en & ~np.int64(15))
        c1, k1 = _expand_ranges(st, head_hi)
        c2, k2 = _expand_ranges(tail_lo, en)
        cols = np.concatenate([c1, c2])
        k = np.concatenate([k1, k2])
        # separator columns anywhere inside intervals (the boundary
        # set re-emits some — same value, harmless)
        i0, i1 = np.searchsorted(seps, [bases[g], bases[g + 1]])
        if i1 > i0:
            sp = seps[i0:i1]
            qlo = np.where(d == 0, b + st, b - en + 1)
            qhi = np.where(d == 0, b + en, b - st + 1)
            valid = st < en  # fill rows: start == end == ref_len
            j0 = np.where(valid, np.searchsorted(sp, qlo), 0)
            j1 = np.where(valid, np.searchsorted(sp, qhi), 0)
            sidx, sk = _expand_ranges(j0, j1)
            p = sp[sidx]
            scols = np.where(d[sk] == 0, p - b[sk], b[sk] - p)
            cols = np.concatenate([cols, scols])
            k = np.concatenate([k, sk])
        if not len(cols):
            continue
        qpos = np.where(d[k] == 0, b[k] + cols, b[k] - cols)
        local = (qpos - bases[g]).astype(np.int64)
        vals = (
            _CODE_LUT[queries[g][local]] + N_BASE * d[k]
        ).astype(np.uint8)
        rows_parts.append(np.full(len(cols), g, dtype=np.int64))
        cols_parts.append(cols)
        vals_parts.append(vals)
    if rows_parts:
        orow = np.concatenate(rows_parts).astype(np.int32)
        ocol = np.concatenate(cols_parts).astype(np.int32)
        oval = np.concatenate(vals_parts)
    else:
        orow = np.zeros(0, np.int32)
        ocol = np.zeros(0, np.int32)
        oval = np.zeros(0, np.uint8)
    pad = _bucket(len(orow), lo=16) - len(orow)
    # padded entries: out-of-range row -> dropped by the scatter
    orow = np.pad(orow, (0, pad), constant_values=1 << 30)
    ocol = np.pad(ocol, (0, pad))
    oval = np.pad(oval, (0, pad))
    return orow, ocol, oval


def padded_pack(queries: list[np.ndarray]):
    """2-bit-pack a query group at the device call's bucketed shapes.

    Returns (packed uint8, sep_idx int64, bases int64) with packed and
    sep_idx padded exactly as ``_build_packed``/``_build`` consume them
    — the single definition both the streamed feeder and the early
    query shipper (core/query_ship.py) use, so a group shipped during
    the read phase is bit-identical to one packed at feed time.
    """
    packed, sep_idx, bases = pack_queries(queries)
    packed = np.pad(packed, (0, _bucket(len(packed)) - len(packed)))
    # pad separators with an out-of-range index (scatter mode='drop')
    s_pad = _bucket(len(sep_idx)) - len(sep_idx)
    sep_idx = np.pad(
        sep_idx, (0, s_pad), constant_values=4 * len(packed)
    )
    return packed, sep_idx, bases


def build_packed_rows_device(
    queries: list[np.ndarray],
    homologies: list[list[Homology]],
    ref_len: int,
    l2: int,
    out_width: int,
    pad_rows: int = 0,
    resident=None,
):
    """One streamed row group: ship 2-bit-packed queries + interval
    records (~L/4 bytes per genome — half the nibble-states volume) and
    build + nibble-pack the pileup rows on device in a single program.

    Returns the [len(queries) + pad_rows, out_width] uint8 device chunk
    (dispatch is async); ``pad_rows`` appends INVALID-packed rows (the
    flat kernel's row padding).  Bit-identical to
    ``pack_states(host_rows, n + pad_rows, out_width)`` — asserted in
    tests/test_stream.py.

    ``resident`` (optional) is a (packed_dev, bases, seps) triple for
    THIS group, already on device (shipped during the read/index phases
    by core/query_ship.QueryShipper): only the interval records + the
    sparse separator overlay ship here, and the same cached program
    runs on the resident array.
    """
    limit = _MAX_GROUP_BASES - 2 * ref_len - 1
    if queries and sum(len(q) for q in queries) > limit:
        raise ConfigError(
            "device pileup group exceeds int32 indexing; use smaller "
            "row groups"
        )
    if resident is not None:
        packed, bases, seps = resident
    else:
        packed, bases, seps = group_payload(queries)
    intervals = prep_intervals(homologies, bases, ref_len, pad_rows)
    overlay = build_overlay(intervals, queries, bases, seps, ref_len)
    return dispatch_build_packed(
        packed, intervals, overlay, ref_len, l2, out_width
    )


def prep_intervals(
    homologies: list[list[Homology]],
    bases: np.ndarray,
    ref_len: int,
    pad_rows: int = 0,
) -> np.ndarray:
    """Host half of one group build: padded interval records exactly as
    ``_build_packed`` consumes them.  Split out so the device-server
    client (serve/client.py) can prep on the CLI side and ship the
    arrays to the daemon, which runs :func:`dispatch_build_packed` on
    the identical inputs — bit-identity by construction."""
    intervals = intervals_from_homologies(homologies, bases, ref_len)
    hmax = intervals.shape[1]
    h_pad = _bucket(hmax, lo=16) - hmax
    rows = intervals.shape[0] + pad_rows
    if h_pad or pad_rows:
        out = np.full((rows, hmax + h_pad, 4), ref_len, dtype=np.int64)
        out[:, :, 3] = 0
        out[: intervals.shape[0], :hmax] = intervals
        intervals = out
    return intervals


def dispatch_build_packed(
    packed, intervals, overlay, ref_len: int, l2: int, out_width: int
):
    """Device half of one group build (see :func:`prep_intervals`)."""
    ref_pad = _bucket(ref_len)
    orow, ocol, oval = overlay
    return _build_packed(
        jnp.asarray(packed),
        jnp.asarray(intervals),
        jnp.asarray(orow),
        jnp.asarray(ocol),
        jnp.asarray(oval),
        ref_pad,
        l2,
        out_width,
    )


def build_pileup_device(
    queries: list[np.ndarray],
    homologies: list[list[Homology]],
    ref_len: int,
):
    """[N, >=ref_len] uint8 device state matrix (== core/pileup result,
    right-padded with INVALID to a shape bucket).

    All device shapes are padded to quarter-octave buckets so repeat
    runs at similar scales reuse compiled executables; padding entries
    scatter out of range (dropped) or read never-used positions.
    Query batches whose concatenated size exceeds int32 indexing are
    built in row groups and concatenated on device.
    """
    # reverse intervals address up to group_bases + 2*ref_len (see
    # _MAX_GROUP_BASES note); reserve that headroom
    limit = _MAX_GROUP_BASES - 2 * ref_len - 1
    total_all = sum(len(q) for q in queries)
    if queries and max(len(q) for q in queries) > limit:
        raise ConfigError(
            "device pileup builder addresses queries with int32 "
            f"indices; a {max(len(q) for q in queries)}-base query "
            "needs the host builder"
        )
    if total_all >= limit and len(queries) > 1:
        groups = []
        row = 0
        while row < len(queries):
            end = row + 1
            acc = len(queries[row])
            while (
                end < len(queries)
                and acc + len(queries[end]) < limit
            ):
                acc += len(queries[end])
                end += 1
            groups.append(
                build_pileup_device(
                    queries[row:end], homologies[row:end], ref_len
                )
            )
            row = end
        width = max(g.shape[1] for g in groups)
        groups = [
            jnp.pad(
                g,
                ((0, 0), (0, width - g.shape[1])),
                constant_values=INVALID,
            )
            for g in groups
        ]
        return jnp.concatenate(groups, axis=0)

    packed, sep_idx, bases = padded_pack(queries)
    intervals = intervals_from_homologies(homologies, bases, ref_len)

    hmax = intervals.shape[1]
    h_pad = _bucket(hmax, lo=16) - hmax
    if h_pad:
        fill = np.full(
            (intervals.shape[0], h_pad, 4), ref_len, dtype=np.int64
        )
        fill[:, :, 3] = 0
        intervals = np.concatenate([intervals, fill], axis=1)

    # build at bucketed width: columns >= ref_len have no intervals and
    # come out INVALID, which the counting kernels ignore — so the
    # padded matrix can feed pair counting directly, and slicing
    # [:, :ref_len] recovers the exact host pileup
    ref_pad = _bucket(ref_len)
    return _build(
        jnp.asarray(packed),
        jnp.asarray(sep_idx),
        jnp.asarray(intervals),
        ref_pad,
    )
