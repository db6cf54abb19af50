"""Unit guard for the shared native-mapper progress relay
(core/map_native.map_batch_native), used by both the serial mapping
phase and the streamed map→feed loop."""

import time

import numpy as np

from phylonium_tpu.core.map_native import map_batch_native


class FakeBar:
    def __init__(self, enabled=True):
        self.enabled = enabled
        self.updates = []

    def update(self, done):
        self.updates.append(done)


class FakeNative:
    """Mapper stand-in: bumps the atomic counter mid-call so the poll
    thread has something to relay, then returns a sentinel per query."""

    def map_queries(self, batch, threshold, progress_out=None):
        assert threshold == 7
        for k in range(len(batch)):
            if progress_out is not None:
                progress_out[0] = k + 1
            time.sleep(0.25)
        return [("mapped", k) for k in range(len(batch))]


def test_relays_counter_with_base_offset():
    bar = FakeBar(enabled=True)
    out = map_batch_native(FakeNative(), [b"a", b"b"], 7, bar, base=10)
    assert out == [("mapped", 0), ("mapped", 1)]
    # the 0.1 s poll must have seen at least one mid-call counter value,
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
        def map_queries(self, batch, threshold, progress_out=None):
            seen["dtype"] = progress_out.dtype
            seen["shape"] = progress_out.shape
            return []

    map_batch_native(Probe(), [], 7, FakeBar(enabled=False), base=0)
    assert seen == {"dtype": np.dtype(np.int64), "shape": (1,)}
