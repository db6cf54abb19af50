"""Regenerate the shipped compiled-executable store.

Compiles the counting kernels at every standard panel shape bucket into
phylonium_tpu/data/compile_cache/ (the "fatbin" store seeded into the
local cache by utils/cache.enable_compile_cache).  Run on the target TPU
generation after ANY change to ops/pallas_match.py or a jax upgrade —
stale entries are harmless (they just miss) but waste repo bytes.

    python tools/seed_compile_cache.py          # kernels only (~1 min)
    python tools/seed_compile_cache.py --bench  # + bench's chained/extend
                                                #   programs (runs bench)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(REPO, "phylonium_tpu", "data", "compile_cache")

os.environ["PHYLONIUM_TPU_CACHE_DIR"] = STORE
sys.path.insert(0, REPO)


def seed_kernels() -> None:
    import jax
    import jax.numpy as jnp

    from phylonium_tpu.ops.pallas_match import (
        _PACKED_PAD,
        _pallas_counts,
        blocked_call_shape,
        cross_counts_pallas,
        packed_call_shape,
    )
    from phylonium_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    assert jax.devices()[0].platform == "tpu", "seed on the real TPU"

    seen: set[tuple] = set()
    # flat packed kernel: row tiers x genome-length tiers (values are
    # bucketed, so each (n_pad, block, cols) triple compiles once)
    for n in (29, 64, 116, 256, 512):
        for length in (500_000, 1_000_000, 2_000_000, 5_000_000):
            n_pad, block, cols = packed_call_shape(n, length)
            key = ("flat", n_pad, block, cols)
            if key in seen:
                continue
            seen.add(key)
            dummy = jnp.full((n_pad, cols), _PACKED_PAD, jnp.uint8)
            jax.block_until_ready(_pallas_counts(dummy, block, packed=True))
            print(f"flat   n_pad={n_pad:4d} block={block:5d} cols={cols}")
    # blocked path's rectangular panel kernel (N > 512 genomes)
    for length in (500_000, 1_000_000, 2_000_000, 5_000_000):
        rb_pad, block, cols = blocked_call_shape(1000, length)
        key = ("cross", rb_pad, block, cols)
        if key in seen:
            continue
        seen.add(key)
        dummy = jnp.full((rb_pad, cols), _PACKED_PAD, jnp.uint8)
        jax.block_until_ready(
            cross_counts_pallas(dummy, dummy, block, packed=True)
        )
        print(f"cross  rb_pad={rb_pad:4d} block={block:5d} cols={cols}")


def seed_stream() -> None:
    """Streamed-pipeline program family (fused build-and-pack, chunk
    concat, panel/stack glue, sync slice) for the standard panel tiers
    — all pallas-free or kernel-reusing, so entries are small."""
    from phylonium_tpu.core.stream import prewarm_stream

    for n, length in (
        (29, 5_000_000),
        (116, 5_000_000),
        (232, 5_000_000),
        (600, 1_000_000),
        (1000, 1_000_000),
        (1000, 500_000),
    ):
        prewarm_stream(n, length)
        print(f"stream n={n:5d} length={length}")


def seed_bench_micros(length: int = 5_000_000, n: int = 29) -> None:
    """bench.py's chained microbench programs (steady-state counting and
    anchor extension) at the default tier-1 shapes.  The programs'
    HLO depends only on shapes, so synthetic inputs seed the exact
    executables a driver bench run needs — a degraded tunnel window
    plus a fresh multi-minute remote compile is what null-fielded the
    anchor-extend metric in a validated round-3 run."""
    import tempfile

    import numpy as np

    import bench

    with tempfile.TemporaryDirectory() as tmp:
        npy = os.path.join(tmp, "states.npy")
        np.save(npy, np.zeros((n, length), dtype=np.uint8))
        r = bench.micro_steady({"npy": npy, "k": 1})
        print(f"steady chained n={n} length={length}: {r}")
        g = os.path.join(tmp, "g.bin")
        with open(g, "wb") as f:
            f.write(b"ACGT" * (length // 4) + b"ACGT"[: length % 4])
        r = bench.micro_anchor_extend({"genome": g, "length": length})
        print(f"anchor-extend chained length={length}: {r}")


def main() -> None:
    os.makedirs(STORE, exist_ok=True)
    seed_kernels()
    seed_stream()
    if "--bench" in sys.argv:
        # bench's chained steady-state + anchor-extend programs at the
        # default bench shapes compile under the same cache dir
        seed_bench_micros()
    total = sum(
        os.path.getsize(os.path.join(STORE, f)) for f in os.listdir(STORE)
    )
    print(f"store: {len(os.listdir(STORE))} entries, {total / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
