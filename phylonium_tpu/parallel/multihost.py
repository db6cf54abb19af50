"""Multi-host initialization and the pod-slice counting entry point.

On a multi-host v5e slice, run one process per host under
``jax.distributed`` (coordinator address via env or args); the global
mesh spans all hosts.  Recommended layout: ``rows`` on DCN (one
all_gather of genome-block states + one int32 psum per run — tiny),
``cols`` on ICI (the bandwidth axis).

Counts are exact integer sums (see ops/pallas_match.py), so any
host/chip topology returns bit-identical matrices; >0.9 linear pairs/s
scaling follows from the compare phase being embarrassingly parallel
over columns with a single [N, N] int32 reduction at the end.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def make_pod_mesh(rows: int | None = None) -> jax.sharding.Mesh:
    """('rows','cols') mesh over all global devices; rows defaults to the
    host count so the rows axis maps to DCN."""
    from phylonium_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n = len(devices)
    if rows is None:
        rows = max(1, jax.process_count())
    while n % rows:
        rows -= 1
    return make_mesh((rows, n // rows), devices=devices)


def pair_counts_pod(states: np.ndarray, rows: int | None = None):
    """All-pairs counts over every device of the (multi-host) runtime."""
    from phylonium_tpu.parallel.distributed import pair_counts_sharded

    mesh = make_pod_mesh(rows)
    return pair_counts_sharded(states, mesh)
