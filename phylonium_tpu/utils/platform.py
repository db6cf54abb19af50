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


def backends_initialized() -> bool:
    """True once the jax backend handshake has completed in-process."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        return False


def devices_or_none(timeout_s: float = 120.0):
    """``jax.devices()`` with a hang bound.

    A wedged tunnel hangs the backend handshake without raising
    (observed live: even a trivial device op blocked for >1 h), so the
    handshake runs on a daemon thread and this gives up after
    ``timeout_s``.  Returns the device list, or None when the handshake
    did not complete (hung or failed) — callers treat the device
    runtime as unreachable.  Instant when the backend is already up or
    the process is CPU-pinned.
    """
    import jax

    if cpu_pinned() or backends_initialized():
        try:
            return jax.devices()
        except Exception:
            return None

    import threading

    box: dict = {}

    def work():
        try:
            box["devices"] = jax.devices()
        except Exception:
            pass

    t = threading.Thread(
        target=work, daemon=True, name="backend-handshake"
    )
    t.start()
    t.join(timeout_s)
    return box.get("devices")
