"""Sharded-text anchor extension: the beyond-HBM index story.

The extension kernels in ops/anchor_extend.py hold the doubled index
text on ONE device — fine up to ~8 Gbp of reference (16 GB HBM), i.e.
every real genome.  This module provides the capability SURVEY §7's
config 5 asks for anyway: the text sharded across the mesh, so a
reference bounded only by *aggregate* HBM.

Layout: the sentinel-padded text splits into one contiguous shard per
device along a 1-D ``'x'`` mesh axis, each shard carrying a ``tile``-byte
halo copied from its right neighbour (the last shard's halo is
sentinel).  A diagonal-mismatch request touches at most the shards its
byte range intersects; every shard computes raw byte inequality for the
positions it OWNS (halo bytes are readable but never owned, so no
position is contributed twice) and an exact integer ``psum`` merges the
per-shard contributions.  Query-side bytes are replicated — the query
batch is chunk-bounded by the hybrid mapper, the reference text is the
thing that grows.

Bit-equality with the single-device ``diagonal_neq`` for every mesh
size and boundary-crossing offset is asserted in
tests/test_anchor_extend_sharded.py on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from phylonium_tpu.ops.anchor_extend import DEFAULT_TILE, _SENT_A


def shard_text(
    text: np.ndarray, n_shards: int, tile: int = DEFAULT_TILE
) -> np.ndarray:
    """[S, L + tile] host array: contiguous shards + right-neighbour halo.

    ``text`` must already be sentinel-padded (ops/anchor_extend.pad_text);
    the shard width L is padded up so S * L covers it.
    """
    n = text.shape[0]
    width = -(-n // n_shards)
    padded = np.full(n_shards * width + tile, _SENT_A, dtype=np.uint8)
    padded[:n] = text
    out = np.empty((n_shards, width + tile), dtype=np.uint8)
    for s in range(n_shards):
        out[s] = padded[s * width : s * width + width + tile]
    return out


@functools.partial(
    jax.jit, static_argnames=("length", "tile", "mesh", "width")
)
def _diag_neq_sharded(
    shards, b, off_a, off_b, lim_a, lim_b, length: int, tile: int,
    mesh, width: int,
):
    nrounds = -(-length // tile)

    def per_shard(local):
        local = local[0]  # [width + tile]
        sidx = jax.lax.axis_index("x")
        base = sidx.astype(jnp.int32) * width

        def one_round(r):
            ga = off_a + r * tile  # global start of this round's bytes
            gb = off_b + r * tile
            # a round belongs to the shard containing its START; the
            # tile-byte halo covers its overhang into the next shard, so
            # every round has exactly one owner and no position is
            # contributed twice
            owned = (ga >= base) & (ga < base + width)
            # clamp keeps dynamic_slice in bounds for foreign rounds
            # (fully masked by `owned`)
            la = jnp.clip(ga - base, 0, width)
            ta = jax.vmap(
                lambda o: jax.lax.dynamic_slice(local, (o,), (tile,))
            )(la)
            tb = jax.vmap(
                lambda o: jax.lax.dynamic_slice(b, (o,), (tile,))
            )(gb)
            return ((ta != tb) & owned[:, None]).astype(jnp.int32)

        rounds = jax.vmap(one_round)(
            jnp.arange(nrounds, dtype=jnp.int32)
        )
        flat = rounds.transpose(1, 0, 2).reshape(off_a.shape[0], -1)[
            :, :length
        ]
        return jax.lax.psum(flat, "x")

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=P("x", None),
        out_specs=P(),
    )
    contrib = fn(shards)
    # limit semantics applied replicated: positions at/past either text's
    # true end always mismatch (ops/anchor_extend.diagonal_neq contract)
    idx = jnp.arange(length, dtype=jnp.int32)
    pos_a = off_a[:, None] + idx
    pos_b = off_b[:, None] + idx
    return (contrib > 0) | (pos_a >= lim_a[:, None]) | (
        pos_b >= lim_b[:, None]
    )


def diagonal_neq_sharded(
    shards: np.ndarray,
    b,
    off_a,
    off_b,
    lim_a,
    lim_b,
    length: int,
    mesh: jax.sharding.Mesh,
    tile: int = DEFAULT_TILE,
) -> np.ndarray:
    """Sharded-text counterpart of ops/anchor_extend.diagonal_neq.

    ``shards``: host array from :func:`shard_text` (one row per device
    of ``mesh``, which must be 1-D over axis ``'x'``).  ``b``: the
    sentinel-padded replicated query-side text (device or host).
    Returns bool [B, length] on host, bit-identical to the single-device
    op.
    """
    n_shards, w = shards.shape
    width = w - tile
    sharding = NamedSharding(mesh, P("x", None))
    shards_dev = jax.device_put(shards, sharding)
    b_dev = jax.device_put(
        np.asarray(b), NamedSharding(mesh, P())
    )
    off_a = jnp.asarray(off_a, jnp.int32)
    off_b = jnp.asarray(off_b, jnp.int32)
    lim_a = jnp.broadcast_to(jnp.asarray(lim_a, jnp.int32), off_a.shape)
    lim_b = jnp.broadcast_to(jnp.asarray(lim_b, jnp.int32), off_b.shape)
    return np.asarray(
        _diag_neq_sharded(
            shards_dev, b_dev, off_a, off_b, lim_a, lim_b, length,
            tile, mesh, width,
        )
    )
