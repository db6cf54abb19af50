"""Streamed map → pileup → device-transfer pipeline.

The reference runs its phases strictly serially: map every query, then
compare every pair (`src/process.cxx:433-458` then `:524-549`).  On a
TPU deployment the compare phase needs the pileup ON the device, and the
host→device shipment of hundreds of MB used to sit on the critical path
after mapping finished.  This module overlaps them: as each row group of
queries finishes mapping, its pileup rows are built (native pass),
nibble-packed, and shipped to the device on a background worker while
the host maps the next group.  By compare time the panel is already
resident and the device path costs only kernel execution plus one fetch.

Bit-exactness: the packed row groups concatenate on device to exactly
the array the one-shot path would have shipped, and the same kernels run
on it (tests/test_stream.py asserts equality against the serial path for
every chunking).

A transient backend abort inside the feeder surfaces at ``finish()`` —
the caller races it against the host counting path, so a flaky tunnel
degrades to the host result instead of failing the run.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from phylonium_tpu.config import RunConfig
from phylonium_tpu.core.homology import Homology
from phylonium_tpu.index.esa import ESAIndex

# rows per mapping/feeding group: large enough that per-device_put fixed
# costs (~0.2 s each on the tunnel) stay negligible, small enough to
# start shipping early in the mapping phase
DEFAULT_GROUP_ROWS = 128


class DeviceRowFeeder:
    """Ships packed pileup row groups to the device as they are built.

    ``feed(rows)`` enqueues a group (a contiguous uint8 view that must
    stay valid until ``finish``); a single worker thread packs it
    (native nibble pass) and starts the host→device transfer, so a
    degraded tunnel window stalls the worker, never the mapping loop.
    ``finish()`` concatenates the groups on device and runs the packed
    counting kernels; it raises whatever the worker hit, which the
    caller absorbs via the host race.
    """

    def __init__(self, n: int, ref_len: int, interpret: bool = False):
        from phylonium_tpu.ops.pallas_match import (
            _MAX_COLS_PER_CALL,
            blocked_call_shape,
            bucket_cols,
            packed_call_shape,
        )

        self.n = n
        self.ref_len = ref_len
        self.interpret = interpret
        self.flat = n <= 512
        if self.flat:
            self.n_pad, self.block, _ = packed_call_shape(n, ref_len)
        else:
            self.n_pad = n
            _, self.block, _ = blocked_call_shape(n, ref_len)
        cap = _MAX_COLS_PER_CALL // 2
        l2 = -(-max(ref_len, 1) // 2)
        # width bucketed up front on the host: one kernel call per
        # column chunk with zero device-side padding ops
        self.width = bucket_cols(l2, self.block) if l2 <= cap else l2
        self._rows_done = 0
        self._chunks: list = []
        self._error: BaseException | None = None
        # unbounded: groups are views into the host states matrix (no
        # copies), and a degraded tunnel window must stall the worker
        # only — never the mapping loop behind a full queue
        self._q: queue.Queue = queue.Queue()
        self._worker = threading.Thread(
            target=self._drain, daemon=True, name="row-feeder"
        )
        self._worker.start()

    def _drain(self) -> None:
        import jax

        from phylonium_tpu.ops.pallas_match import pack_states

        while True:
            item = self._q.get()
            if item is None:
                return
            rows, out_rows = item
            try:
                if self._error is None:
                    packed = pack_states(rows, out_rows, self.width)
                    self._chunks.append(jax.device_put(packed))
            except BaseException as e:  # noqa: BLE001 — raised in finish()
                self._error = e
            finally:
                self._q.task_done()

    def feed(self, rows: np.ndarray) -> None:
        """Enqueue a contiguous row group (next ``rows.shape[0]``
        genomes, in order)."""
        out_rows = rows.shape[0]
        self._rows_done += out_rows
        if self.flat and self._rows_done >= self.n:
            # last group: pad straight to the kernel's row shape so the
            # device concat is exactly the one-shot packed array
            out_rows += self.n_pad - self._rows_done
        self._q.put((rows, out_rows))

    def finish(self, progress=None) -> tuple[np.ndarray, np.ndarray]:
        """Block until every group is shipped, then count on device —
        concat + panels + kernels fused into single dispatches (eager
        op composition costs a remote program + round trip PER OP on a
        tunnelled deployment)."""
        from phylonium_tpu.ops.pallas_match import (
            blocked_counts_device,
            flat_counts_device,
        )

        self._q.join()
        self._q.put(None)
        self._worker.join()
        if self._error is not None:
            raise self._error
        if self._rows_done != self.n:
            raise RuntimeError(
                f"feeder got {self._rows_done} rows for {self.n} genomes"
            )
        chunks = tuple(self._chunks)
        if self.flat:
            return flat_counts_device(
                chunks, self.n, block=self.block,
                interpret=self.interpret,
            )
        return blocked_counts_device(
            chunks, self.n, block=self.block,
            interpret=self.interpret, progress=progress,
        )

    def abort(self) -> None:
        """Stop the worker without counting (host path won the race)."""
        try:
            self._q.put(None)
        except Exception:
            pass


def map_pileup_streamed(
    ref: ESAIndex,
    threshold: int,
    queries: list,
    cfg: RunConfig,
    feeder: DeviceRowFeeder,
    group_rows: int | None = None,
) -> tuple[list[list[Homology]], np.ndarray]:
    """Map queries in row groups, building + feeding pileup rows as each
    group completes.  Returns (homologies, full host states matrix) —
    the host matrix backs the compare race and the coverage statistics.
    """
    import os

    from phylonium_tpu.native import build_pileup_native
    from phylonium_tpu.utils.bigalloc import empty as big_empty
    from phylonium_tpu.utils.progress import ProgressBar

    if group_rows is None:
        group_rows = int(
            os.environ.get("PHYLONIUM_TPU_STREAM_GROUP")
            or DEFAULT_GROUP_ROWS
        )
    n = len(queries)
    ref_len = len(ref.subject)
    states = big_empty((n, ref_len), np.uint8)
    homologies: list[list[Homology]] = [None] * n  # type: ignore

    bar = ProgressBar(
        f"Mapping {n} sequences", n, enabled=cfg.progress_enabled
    )
    counter = np.zeros(1, dtype=np.int64)
    stop = threading.Event()
    base = 0

    def relay():
        while not stop.wait(0.1):
            bar.update(base + int(counter[0]))

    poller = None
    if bar.enabled:
        poller = threading.Thread(
            target=relay, daemon=True, name="map-progress"
        )
        poller.start()
    try:
        for lo in range(0, n, group_rows):
            hi = min(lo + group_rows, n)
            batch = [queries[j].as_array() for j in range(lo, hi)]
            counter[0] = 0
            base = lo
            out = ref._native.map_queries(
                batch, threshold, progress_out=counter
            )
            homologies[lo:hi] = out
            build_pileup_native(batch, out, ref_len, out=states[lo:hi])
            feeder.feed(states[lo:hi])
            bar.update(hi)
    finally:
        stop.set()
        if poller is not None:
            poller.join()
    bar.finish()
    return homologies, states
