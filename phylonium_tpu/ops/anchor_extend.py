"""Batched anchor extension on device (build-plan stage 4).

The reference extends anchors with scalar byte loops over the text
(`src/esa.cxx:446-513` direct text extension, `src/process.cxx:171-184`
``lcp()`` for lucky anchors).  Here the same primitive — "how far do two
suffixes of device-resident texts match?" — is a batched, tiled device
op so the per-byte work rides the VPU while the (cheap, irregular)
chaining state machine stays on host:

``lce_batch(a, b, off_a, off_b, cap)``
    longest common extension: number of leading equal bytes of
    ``a[off_a:]`` vs ``b[off_b:]`` per job, capped.  All jobs advance in
    lockstep over fixed-size tiles inside one ``lax.while_loop`` — no
    data-dependent shapes, XLA-friendly by construction.

``diagonal_neq(a, b, off_a, off_b, length)``
    the full mismatch bitmap of one diagonal — ``a[off_a+i] !=
    b[off_b+i]`` for ``i < length``.  One device call yields every
    lucky-anchor LCP the chaining loop will ever need along that
    diagonal (the mismatch *positions* determine all subsequent run
    lengths), so the host↔device round-trip count is ~#homologies, not
    ~#anchors.  Used by the hybrid mapping backend
    (phylonium_tpu/core/hybrid_map.py).

Boundary semantics match the host oracle: the wrapper clamps caps at the
text ends and pads texts with *distinct* sentinel bytes so tile gathers
never read out of bounds and never match across the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# bytes per lockstep round; lane-friendly
DEFAULT_TILE = 2048

# sentinels (never equal to each other or to any nucleotide byte)
_SENT_A = 0xFD
_SENT_B = 0xFE


def pad_text(text: np.ndarray, which: str, tile: int = DEFAULT_TILE):
    """Pad a uint8 text with ``tile`` sentinel bytes for safe tile loads.

    ``which`` selects the sentinel ('a' or 'b') so a-vs-b comparisons
    stop at whichever text ends first even when caps are loose.
    """
    sent = _SENT_A if which == "a" else _SENT_B
    return np.pad(text, (0, tile), constant_values=sent)


@functools.partial(jax.jit, static_argnames=("tile",))
def _lce_batch(a, b, off_a, off_b, cap, tile: int):
    nb_jobs = off_a.shape[0]

    def slice_rows(text, offs):
        return jax.vmap(
            lambda o: jax.lax.dynamic_slice(text, (o,), (tile,))
        )(offs)

    def cond(state):
        _, running, _ = state
        return running.any()

    def body(state):
        t, running, res = state
        # finished jobs park at offset 0 (result already latched)
        oa = jnp.where(running, off_a + t, 0)
        ob = jnp.where(running, off_b + t, 0)
        ta = slice_rows(a, oa)
        tb = slice_rows(b, ob)
        neq = ta != tb
        any_neq = neq.any(axis=1)
        first = jnp.argmax(neq, axis=1).astype(jnp.int32)
        cand = t + jnp.where(any_neq, first, tile)
        done_now = running & (any_neq | (cand >= cap))
        res = jnp.where(done_now, jnp.minimum(cand, cap), res)
        return t + tile, running & ~done_now, res

    t0 = jnp.int32(0)
    running0 = cap > 0
    res0 = jnp.zeros((nb_jobs,), jnp.int32)
    _, _, res = jax.lax.while_loop(cond, body, (t0, running0, res0))
    return res


def lce_batch(
    a: jnp.ndarray,
    b: jnp.ndarray,
    off_a,
    off_b,
    cap,
    tile: int = DEFAULT_TILE,
) -> np.ndarray:
    """Batched longest-common-extension (device).

    ``a``/``b``: sentinel-padded device texts (see :func:`pad_text`).
    ``off_a``/``off_b``/``cap``: int32 arrays [B].  Caps must already be
    clamped to the unpadded text ends (as the host oracle does,
    phylonium_native.cpp ``lcp``); the sentinels only guard tile reads.
    Returns int32 [B] match lengths.
    """
    off_a = jnp.asarray(off_a, jnp.int32)
    off_b = jnp.asarray(off_b, jnp.int32)
    cap = jnp.asarray(cap, jnp.int32)
    return np.asarray(_lce_batch(a, b, off_a, off_b, cap, tile))


@functools.partial(jax.jit, static_argnames=("length", "tile"))
def _diagonal_neq(a, b, off_a, off_b, lim_a, lim_b, length: int, tile: int):
    nrounds = -(-length // tile)
    lanes = jnp.arange(tile, dtype=jnp.int32)

    def one_round(r):
        oa = off_a + r * tile
        ob = off_b + r * tile
        # dynamic_slice clamps starts near the array end; whenever that
        # happens *every* lane of the job is past its true limit (texts
        # carry exactly one tile of sentinel padding), so the clamped
        # values are never consumed — validity masks below force
        # "mismatch" there.
        ta = jax.vmap(
            lambda o: jax.lax.dynamic_slice(a, (o,), (tile,))
        )(oa)
        tb = jax.vmap(
            lambda o: jax.lax.dynamic_slice(b, (o,), (tile,))
        )(ob)
        in_a = (oa[:, None] + lanes) < lim_a[:, None]
        in_b = (ob[:, None] + lanes) < lim_b[:, None]
        return (ta != tb) | ~in_a | ~in_b

    rounds = jax.vmap(one_round)(jnp.arange(nrounds, dtype=jnp.int32))
    # [rounds, B, tile] -> [B, rounds*tile]
    return rounds.transpose(1, 0, 2).reshape(off_a.shape[0], -1)[
        :, :length
    ]


def diagonal_neq(
    a: jnp.ndarray,
    b: jnp.ndarray,
    off_a,
    off_b,
    lim_a,
    lim_b,
    length: int,
    tile: int = DEFAULT_TILE,
) -> np.ndarray:
    """Mismatch bitmaps ``a[off_a+i] != b[off_b+i]`` for ``i < length``.

    ``lim_a``/``lim_b`` are the *true* (unpadded) text lengths per job;
    positions at or past a limit always report a mismatch — exactly the
    "extension stops at the text end" semantics the chain loop needs.
    Texts must be sentinel-padded with :func:`pad_text` (same ``tile``).
    Returns bool [B, length] on host.
    """
    off_a = jnp.asarray(off_a, jnp.int32)
    off_b = jnp.asarray(off_b, jnp.int32)
    lim_a = jnp.broadcast_to(jnp.asarray(lim_a, jnp.int32), off_a.shape)
    lim_b = jnp.broadcast_to(jnp.asarray(lim_b, jnp.int32), off_b.shape)
    return np.asarray(
        _diagonal_neq(a, b, off_a, off_b, lim_a, lim_b, length, tile)
    )
