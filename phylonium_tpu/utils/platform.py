"""Non-blocking platform introspection.

``jax.devices()`` blocks on the backend handshake (seconds on a
tunnelled deployment), so hot paths decide from the config pin instead.
``jax_platforms`` is a PRIORITY LIST — the axon deployment sets
``'axon,cpu'`` (TPU with CPU fallback), so only the first entry decides
where computation lands; a naive substring test misreads it as CPU.

None of these helpers import jax on their own: ``import jax`` costs
~1.8 s on this host, and the host-only dispatch path (panels below the
work threshold) must never pay it.  When jax was never imported, the
process cannot be in a jax.distributed run and the pin is whatever the
environment will hand jax at import time.
"""

from __future__ import annotations

import os
import sys
import threading


def cpu_pinned() -> bool:
    """True when jax is pinned to the CPU backend (tests, forced runs)."""
    # the product's own override wins unconditionally: every
    # jax-touching chokepoint applies it via ensure_device_plugin()
    # before the first backend init, so it IS the effective platform
    # even before jax loads
    override = os.environ.get("PHYLONIUM_TPU_PLATFORM")
    if override:
        return override.split(",")[0].strip().lower() == "cpu"
    if "jax" not in sys.modules:
        # nobody can have called jax.config.update yet; the env var is
        # the only pin source a future import would see
        platforms = os.environ.get("JAX_PLATFORMS", "")
        return platforms.split(",")[0].strip().lower() == "cpu"
    import jax

    platforms = getattr(jax.config, "jax_platforms", None)
    if not platforms:
        return False
    return str(platforms).split(",")[0].strip().lower() == "cpu"


def backends_initialized() -> bool:
    """True once the jax backend handshake has completed in-process.

    Genuinely non-blocking: ``xla_bridge.backends_are_initialized()``
    takes jax's global ``_backend_lock`` — the same lock a backend init
    holds for its whole handshake.  Against a wedged tunnel that init
    can hang for MINUTES (observed live: the prewarm thread sat in
    ``make_c_api_client`` holding the lock while the pipeline's
    ``_should_stream`` blocked here behind it).  A failed try-acquire
    means an init is still in flight, i.e. the handshake has NOT
    completed — exactly this function's False."""
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge

        lock = getattr(xla_bridge, "_backend_lock", None)
        if lock is not None and hasattr(lock, "acquire"):
            if not lock.acquire(blocking=False):
                return False
            try:
                return bool(getattr(xla_bridge, "_backends", None))
            finally:
                lock.release()
        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        return False


_plugin_armed = False
_plugin_lock = threading.Lock()


def ensure_device_plugin() -> None:
    """Re-arm the deployment's TPU plugin when the launcher deferred it.

    The axon deployment preloads jax + the PJRT plugin into EVERY
    python process via sitecustomize (~2 s of interpreter startup),
    gated on ``PALLAS_AXON_POOL_IPS``.  A launcher that moves that
    value into ``PHYLONIUM_TPU_DEFER_AXON`` (and unsets the gate) makes
    host-dispatched runs skip the cost entirely — the CLI is then
    jax-import-free below the work threshold.  Device-bound paths call
    this before their first backend handshake: it restores the gate
    variable and re-executes the deployment's own boot module, so no
    registration logic is duplicated here.  No-op when the gate was set
    at startup (normal boot already registered) or nothing was
    deferred."""
    global _plugin_armed
    if _plugin_armed:
        return
    # concurrent device-bound threads (cli backend-init, prewarm
    # worker, the compare race) must BLOCK until the registration
    # completes — an early-returning second caller could initialize the
    # backend before the plugin lands, silently pinning a healthy TPU
    # run to CPU (the flag is set only after the work is done)
    with _plugin_lock:
        if _plugin_armed:
            return
        # the CLI's platform override is applied here — lazily, at the
        # first jax-touching chokepoint — rather than at CLI startup,
        # so a host-dispatched run under PHYLONIUM_TPU_PLATFORM never
        # pays the jax import just to configure a backend it won't use
        override = os.environ.get("PHYLONIUM_TPU_PLATFORM")
        if override:
            try:
                import jax

                jax.config.update("jax_platforms", override)
            except Exception:
                pass
        stashed = os.environ.get("PHYLONIUM_TPU_DEFER_AXON")
        if (
            stashed
            and not os.environ.get("PALLAS_AXON_POOL_IPS")
            and not backends_initialized()
        ):
            os.environ["PALLAS_AXON_POOL_IPS"] = stashed
            try:
                import importlib
                import sitecustomize

                importlib.reload(sitecustomize)
            except Exception:
                pass  # best-effort; host paths stay bit-identical
        _plugin_armed = True


# one shared handshake attempt per process: concurrent/later callers
# join the same thread instead of stacking new ones onto a wedged
# backend, and once a caller has given up every later call returns
# None instantly (unless the handshake completed in the meantime)
_handshake: dict = {}
_handshake_lock = threading.Lock()


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
    ensure_device_plugin()
    import jax

    if cpu_pinned() or backends_initialized():
        try:
            return jax.devices()
        except Exception:
            return None

    with _handshake_lock:
        t = _handshake.get("thread")
        if t is None:

            def work():
                try:
                    _handshake["devices"] = jax.devices()
                except Exception:
                    _handshake["devices"] = None

            t = threading.Thread(
                target=work, daemon=True, name="backend-handshake"
            )
            _handshake["thread"] = t
            t.start()
    t.join(0.0 if _handshake.get("gave_up") else timeout_s)
    if "devices" in _handshake:
        return _handshake["devices"]
    _handshake["gave_up"] = True
    return None
