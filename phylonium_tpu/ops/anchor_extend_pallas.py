"""Pallas diagonal-mismatch kernel — anchor extension at DMA speed.

The XLA formulation in ops/anchor_extend.py pays gather overhead per
tile; this kernel instead streams lane-aligned text windows HBM->VMEM
via Pallas block specs with scalar-prefetched job offsets and realigns
in-register with a dynamic roll:

    grid (job, round):
      load a[0][align(off_a + r*T)], a[1][next tile]   (block specs)
      load b[0][align(off_b + r*T)], b[1][next tile]
      va = roll(a0 ++ a1, -(off_a % T))[:T]            (VPU)
      vb = roll(b0 ++ b1, -(off_b % T))[:T]
      out[job, r*T:(r+1)*T] = (va != vb) | past-limit masks

Semantics are identical to anchor_extend.diagonal_neq (positions at or
past a per-job limit report mismatch); texts must be padded with TWO
tiles of sentinel bytes (:func:`pad_text2`) so the +1 window load stays
in bounds — when the clamp in the index map engages, every lane of that
round is past its limit and masked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phylonium_tpu.ops.anchor_extend import _SENT_A, _SENT_B

DEFAULT_TILE = 2048

# jobs per output block (sublane tile); job batches pad to a multiple
_GROUP = 8


def pad_text2(text: np.ndarray, which: str, tile: int = DEFAULT_TILE):
    """[1, len + 2*tile] sentinel-padded text for the Pallas kernel."""
    sent = _SENT_A if which == "a" else _SENT_B
    return np.pad(text, (0, 2 * tile), constant_values=sent)[None, :]


def _kernel(offa_ref, offb_ref, lima_ref, limb_ref,
            a0, a1, b0, b1, out_ref, acc_ref, *, tile: int):
    r = pl.program_id(0)
    j = pl.program_id(1)

    sa = offa_ref[j] % tile
    sb = offb_ref[j] % tile

    # i32 widening: Mosaic v5e has no i8 vector arithmetic, and
    # tpu.dynamic_rotate (pltpu.roll) only supports 32-bit data, so i16
    # cannot be used here either
    wa = jnp.concatenate([a0[:], a1[:]], axis=1).astype(jnp.int32)
    wb = jnp.concatenate([b0[:], b1[:]], axis=1).astype(jnp.int32)
    va = pltpu.roll(wa, -sa, 1)[:, :tile]
    vb = pltpu.roll(wb, -sb, 1)[:, :tile]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    ga = offa_ref[j] + r * tile + lane
    gb = offb_ref[j] + r * tile + lane
    neq = (va != vb) | (ga >= lima_ref[j]) | (gb >= limb_ref[j])

    # one job row per step, accumulated through a one-hot row select in
    # an i32 scratch (Mosaic v5e has neither dynamic-sublane i8 stores
    # nor i8 vector arithmetic).  Jobs are processed in groups of
    # _GROUP rows so the scratch write amplification stays O(_GROUP),
    # not O(B); j is the fastest grid dimension, so each (group, round)
    # output block is revisited consecutively and flushes on the
    # group's last job.
    @pl.when(j % _GROUP == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = (
        jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0) == j % _GROUP
    ).astype(jnp.int32)
    acc_ref[:] += row * neq.astype(jnp.int32)

    @pl.when(j % _GROUP == _GROUP - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("length", "tile", "interpret")
)
def _diagonal_neq_pallas(
    a, b, off_a, off_b, lim_a, lim_b, length: int, tile: int,
    interpret: bool = False,
):
    nb = off_a.shape[0]
    nrounds = length // tile
    amax = a.shape[1] // tile - 1
    bmax = b.shape[1] // tile - 1

    def tile_idx(off, r, cap, plus):
        return jnp.minimum(off // tile + r + plus, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nrounds, nb),
        in_specs=[
            pl.BlockSpec(
                (1, tile),
                lambda r, j, oa, ob, la, lb: (
                    0, tile_idx(oa[j], r, amax, 0),
                ),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda r, j, oa, ob, la, lb: (
                    0, tile_idx(oa[j], r, amax, 1),
                ),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda r, j, oa, ob, la, lb: (
                    0, tile_idx(ob[j], r, bmax, 0),
                ),
            ),
            pl.BlockSpec(
                (1, tile),
                lambda r, j, oa, ob, la, lb: (
                    0, tile_idx(ob[j], r, bmax, 1),
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (_GROUP, tile), lambda r, j, *_: (j // _GROUP, r)
        ),
        scratch_shapes=[pltpu.VMEM((_GROUP, tile), jnp.int32)],
    )

    return pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid_spec=grid_spec,
        # i32 output: Mosaic v5e cannot truncate vectors to 8 bits; the
        # wrapper converts to bool on host
        out_shape=jax.ShapeDtypeStruct((nb, length), jnp.int32),
        interpret=interpret,
    )(off_a, off_b, lim_a, lim_b, a, a, b, b)


def diagonal_neq_pallas(
    a,
    b,
    off_a,
    off_b,
    lim_a,
    lim_b,
    length: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> np.ndarray:
    """Drop-in Pallas variant of anchor_extend.diagonal_neq.

    ``a``/``b`` must come from :func:`pad_text2` (two-tile sentinel
    padding, 2-D [1, len]).  Returns bool [B, length] on host.
    """
    off_a = np.asarray(off_a, np.int32)
    off_b = np.asarray(off_b, np.int32)
    nb = off_a.shape[0]
    pad_jobs = (-nb) % _GROUP
    if pad_jobs:
        off_a = np.pad(off_a, (0, pad_jobs))
        off_b = np.pad(off_b, (0, pad_jobs))
    shape = off_a.shape
    lim_a = np.broadcast_to(np.asarray(lim_a, np.int32), (nb,))
    lim_b = np.broadcast_to(np.asarray(lim_b, np.int32), (nb,))
    if pad_jobs:  # dummy jobs: limit 0 -> all mismatch, rows sliced off
        lim_a = np.pad(lim_a, (0, pad_jobs))
        lim_b = np.pad(lim_b, (0, pad_jobs))
    pad_len = -(-length // tile) * tile
    out = _diagonal_neq_pallas(
        a,
        b,
        jnp.asarray(off_a),
        jnp.asarray(off_b),
        jnp.asarray(lim_a),
        jnp.asarray(lim_b),
        pad_len,
        tile,
        interpret,
    )
    return np.asarray(out[:nb, :length]).astype(bool)
