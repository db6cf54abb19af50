"""Non-blocking platform introspection.

``jax.devices()`` blocks on the backend handshake (seconds on a
tunnelled deployment), so hot paths decide from the config pin instead.
``jax_platforms`` is a PRIORITY LIST — the axon deployment sets
``'axon,cpu'`` (TPU with CPU fallback), so only the first entry decides
where computation lands; a naive substring test misreads it as CPU.
"""

from __future__ import annotations


def cpu_pinned() -> bool:
    """True when jax is pinned to the CPU backend (tests, forced runs)."""
    import jax

    platforms = getattr(jax.config, "jax_platforms", None)
    if not platforms:
        return False
    return str(platforms).split(",")[0].strip().lower() == "cpu"
