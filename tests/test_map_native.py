"""Unit guard for the shared native-mapper progress relay
(core/map_native.map_batch_native), used by both the serial mapping
phase and the streamed map→feed loop."""

import threading

import numpy as np

from phylonium_tpu.core.map_native import map_batch_native


class FakeBar:
    def __init__(self, enabled=True, watch_above=None):
        self.enabled = enabled
        self.updates = []
        # set once a mid-call value (> watch_above) has been relayed —
        # lets the fake mapper block until the poller HAS run instead of
        # hoping it gets a timeslice inside a wall-clock window (the
        # 1-core host swings ~10x in scheduling latency)
        self.saw_midcall = threading.Event()
        self._watch_above = watch_above

    def update(self, done):
        self.updates.append(done)
        if self._watch_above is not None and done > self._watch_above:
            self.saw_midcall.set()


class FakeNative:
    """Mapper stand-in: bumps the atomic counter mid-call, then waits
    (bounded) for the poll thread to relay it before returning."""

    def __init__(self, bar=None):
        self._bar = bar

    def map_queries(self, batch, threshold, progress_out=None, raw=False):
        assert threshold == 7
        assert raw is False
        for k in range(len(batch)):
            if progress_out is not None:
                progress_out[0] = k + 1
            if self._bar is not None:
                # deterministic: block until the relay observed a
                # mid-call value (10 s bound only guards a broken relay)
                assert self._bar.saw_midcall.wait(10.0), (
                    "poller never relayed a mid-call counter value"
                )
        return [("mapped", k) for k in range(len(batch))]


def test_relays_counter_with_base_offset():
    bar = FakeBar(enabled=True, watch_above=10)
    out = map_batch_native(FakeNative(bar), [b"a", b"b"], 7, bar, base=10)
    assert out == [("mapped", 0), ("mapped", 1)]
    # the poll must have seen at least one mid-call counter value,
    # offset by the completed-queries base
    assert any(u in (11, 12) for u in bar.updates), bar.updates
    assert all(10 <= u <= 12 for u in bar.updates), bar.updates


def test_disabled_bar_spawns_no_poller_and_still_returns():
    bar = FakeBar(enabled=False)
    out = map_batch_native(FakeNative(), [b"a"], 7, bar, base=0)
    assert out == [("mapped", 0)]
    assert bar.updates == []


def test_counter_is_int64_shape_1():
    seen = {}

    class Probe:
        def map_queries(self, batch, threshold, progress_out=None, raw=False):
            seen["dtype"] = progress_out.dtype
            seen["shape"] = progress_out.shape
            seen["raw"] = raw
            return []

    map_batch_native(Probe(), [], 7, FakeBar(enabled=False), base=0)
    assert seen == {
        "dtype": np.dtype(np.int64),
        "shape": (1,),
        "raw": False,
    }


def test_raw_kwarg_forwarded():
    seen = {}

    class Probe:
        def map_queries(self, batch, threshold, progress_out=None, raw=False):
            seen["raw"] = raw
            return []

    map_batch_native(Probe(), [], 7, FakeBar(enabled=False), base=0, raw=True)
    assert seen == {"raw": True}
