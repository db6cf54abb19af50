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


@functools.partial(
    jax.jit, static_argnames=("ref_len", "l2", "out_width")
)
def _build_packed(packed, sep_idx, intervals, ref_len: int, l2: int,
                  out_width: int):
    """Build pileup rows AND emit them in the counting kernels' split-
    nibble layout (ops/pallas_match.pack_states) in one program: byte j
    = state[j] | state[j + l2] << 4 for j < l2, INVALID-packed beyond.
    The streaming feeder ships 2-bit queries + intervals (half the
    nibble-states volume — the tunnel's real h2d bandwidth is the wall
    for device counting at scale) and gets chunk arrays that feed the
    exact same cached kernel programs as host packing."""
    s = _build_core(packed, sep_idx, intervals, ref_len)
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

    ``resident`` (optional) is a (packed_dev, sep_dev, bases) triple for
    THIS group, already on device (shipped during the read/index phases
    by core/query_ship.QueryShipper): only the interval records ship
    here, and the same cached program runs on the resident arrays.
    """
    limit = _MAX_GROUP_BASES - 2 * ref_len - 1
    if queries and sum(len(q) for q in queries) > limit:
        raise ConfigError(
            "device pileup group exceeds int32 indexing; use smaller "
            "row groups"
        )
    if resident is not None:
        packed, sep_idx, bases = resident
    else:
        packed, sep_idx, bases = padded_pack(queries)
    intervals = intervals_from_homologies(homologies, bases, ref_len)

    hmax = intervals.shape[1]
    h_pad = _bucket(hmax, lo=16) - hmax
    rows = intervals.shape[0] + pad_rows
    if h_pad or pad_rows:
        out = np.full((rows, hmax + h_pad, 4), ref_len, dtype=np.int64)
        out[:, :, 3] = 0
        out[: intervals.shape[0], :hmax] = intervals
        intervals = out

    ref_pad = _bucket(ref_len)
    return _build_packed(
        jnp.asarray(packed),
        jnp.asarray(sep_idx),
        jnp.asarray(intervals),
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
