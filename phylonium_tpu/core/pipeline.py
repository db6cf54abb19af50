"""The core pipeline: index -> map -> pileup -> all-pairs counts.

Equivalent of the reference's ``process()`` (`src/process.cxx:408-556`)
with the comparison phase redesigned for TPU:

1. build the ESA over subject + '#' + revcomp (index backend: C++ or
   numpy);
2. compute the minimum anchor length from the subject's GC content
   (src/process.cxx:416-417);
3. map every query: anchor chaining -> sort by projected start ->
   max-chain overlap filter (src/process.cxx:433-458);
4. optional complete deletion (core genome) and ``-p`` segsite output;
5. **pileup**: project every genome onto reference columns
   (core/pileup.py) and compute all-pairs substitution/homolog counts
   with MXU matmuls (ops/match_matrix.py) — or the numpy oracle for
   tiny inputs / --count-backend numpy.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from phylonium_tpu.config import ConfigError, RunConfig
from phylonium_tpu.core.anchor_stats import min_anchor_length
from phylonium_tpu.core.anchors import anchor_homologies
from phylonium_tpu.core.complete_deletion import complete_delete
from phylonium_tpu.core.filter import filter_overlaps_max
from phylonium_tpu.core.homology import Homology
from phylonium_tpu.core.pileup import build_pileup
from phylonium_tpu.core.segsites import write_refpos
from phylonium_tpu.data.sequence import Sequence, gc_content
from phylonium_tpu.index.esa import ESAIndex
from phylonium_tpu.model.evo import EvoCounts

# Which leg actually produced the pair counts in the most recent
# process() run: "host" | "device" | "mesh" | "numpy".  Results are
# bit-identical across carriers by construction — this is
# observability so callers (bench, -v -v, PHYLONIUM_TPU_RUN_REPORT)
# can report the dispatch that REALLY happened, not the one that was
# planned (a wedged tunnel turns a planned device run into a host
# fallback; claiming "device" for it would be dishonest).
LAST_RUN_INFO: dict = {}


def _set_carrier(kind: str) -> None:
    LAST_RUN_INFO["compare_carrier"] = kind


def map_queries(
    ref: ESAIndex,
    threshold: int,
    queries: list[Sequence],
    cfg: RunConfig,
) -> list[list[Homology]]:
    """Anchor-map every query against the index ("Mapping" phase).

    Progress is live (per completed query) on every backend — the native
    batch mapper exposes an atomic counter a poll thread watches while
    the C++/OpenMP call runs (the reference updates in-loop the same
    way, src/process.cxx:445-456).
    """
    from phylonium_tpu.utils.progress import ProgressBar

    n = len(queries)
    homologies: list[list[Homology]] = [None] * n  # type: ignore

    bar = ProgressBar(
        f"Mapping {n} sequences", n, enabled=cfg.progress_enabled
    )

    # Checkpoint: reuse previously mapped queries (content-addressed).
    ckpt = None
    keys = [None] * n
    todo = list(range(n))
    if cfg.checkpoint_dir:
        from phylonium_tpu.utils.checkpoint import (
            MappingCheckpoint,
            query_key,
            subject_key,
        )

        ckpt = MappingCheckpoint(cfg.checkpoint_dir)
        skey = subject_key(ref.subject.nucl, threshold)
        todo = []
        for j in range(n):
            keys[j] = query_key(skey, queries[j].name, queries[j].nucl)
            cached = ckpt.load(keys[j])
            if cached is None:
                todo.append(j)
            else:
                homologies[j] = cached
    # multi-host: map only this process's queries (round-robin split of
    # the reference's data-parallel-over-queries axis), exchange after.
    # Import-free when jax was never loaded (host runs must not pay the
    # ~1.8 s import; jax.distributed requires importing jax first).
    nproc, pid = 1, 0
    if "jax" in sys.modules:
        try:
            from jax._src import distributed

            if (distributed.global_state.num_processes or 1) > 1:
                nproc = distributed.global_state.num_processes
                pid = distributed.global_state.process_id
        except Exception:
            pass
    if nproc > 1:
        todo = [j for j in todo if j % nproc == pid]

    done_base = n - len(todo)
    bar.update(done_base)

    map_backend = cfg.map_backend
    if map_backend == "auto":
        map_backend = "native" if ref.backend_name == "native" else "python"
    elif map_backend == "native" and ref.backend_name != "native":
        raise ConfigError(
            "--map-backend=native requires the native suffix index, but "
            f"the '{ref.backend_name}' ESA backend is in use (pick "
            "--esa-backend=native or another map backend)"
        )

    if map_backend == "hybrid":
        # host chain state machine + device anchor extension (stage 4);
        # a transient backend abort falls back to the bit-identical
        # pure-host mapper instead of failing the run
        from phylonium_tpu.core.hybrid_map import hybrid_map_queries

        try:
            raw = hybrid_map_queries(
                ref,
                threshold,
                [queries[j].as_array() for j in todo],
                progress=lambda d: bar.update(done_base + d),
            )
        except Exception as e:
            if not _is_transient_device_error(e):
                raise
            cfg.warn(
                "transient TPU backend error in hybrid mapping "
                f"({str(e).splitlines()[0]}); mapping on the host path "
                "instead"
            )
            raw = None
        if raw is None:
            if ref.backend_name == "native":
                native_out = ref._native.map_queries(
                    [queries[j].as_array() for j in todo], threshold
                )
                for k, j in enumerate(todo):
                    homologies[j] = native_out[k]
            else:
                for k, j in enumerate(todo):
                    hv = anchor_homologies(ref, threshold, queries[j])
                    hv.sort(key=lambda h: h.start())
                    homologies[j] = filter_overlaps_max(hv)
                    bar.update(done_base + k + 1)
        else:
            for k, j in enumerate(todo):
                hv = raw[k]
                hv.sort(key=lambda h: h.start())
                homologies[j] = filter_overlaps_max(hv)
    elif map_backend == "native":
        # Native backend maps entire batches in C++/OpenMP; the shared
        # helper relays its atomic per-query counter to the bar.
        from phylonium_tpu.core.map_native import map_batch_native

        native_out = map_batch_native(
            ref._native,
            [queries[j].as_array() for j in todo],
            threshold,
            bar,
            done_base,
        )
        for k, j in enumerate(todo):
            homologies[j] = native_out[k]
    else:
        for k, j in enumerate(todo):
            hv = anchor_homologies(ref, threshold, queries[j])
            hv.sort(key=lambda h: h.start())
            homologies[j] = filter_overlaps_max(hv)
            bar.update(done_base + k + 1)

    if ckpt is not None:
        for j in todo:
            ckpt.save(keys[j], homologies[j])

    if nproc > 1:
        from phylonium_tpu.parallel.map_shard import exchange_homologies

        owned = [j for j in range(n) if j % nproc == pid]
        homologies = exchange_homologies(homologies, owned)
        if cfg.verbose >= 2:
            print(
                f"mapping sharded: process {pid}/{nproc} mapped "
                f"{len(todo)} of {n} queries locally",
                file=sys.stderr,
            )

    bar.finish()
    return homologies


# above this many genomes the Pallas path tiles the output matrix into
# row-block panels (VMEM pressure independent of N)
ROW_BLOCK_THRESHOLD = 512

# transient XLA/runtime status markers: a tunnelled TPU backend can
# abort mid-run and succeed on the very next attempt (observed live:
# "ABORTED: TPU backend error" killed a parity run that passed clean on
# rerun).  Anything not matching re-raises: genuine defects keep their
# tracebacks.
_TRANSIENT_MARKERS = (
    "ABORTED",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
    "backend error",
    "Socket closed",
    "Connection reset",
    # NOT bare "INTERNAL": Mosaic/XLA compiler defects surface as
    # INTERNAL RuntimeErrors and must keep their tracebacks; only the
    # tunnelled compile service's transport faults are transient
    "INTERNAL: http",
)

# fault injection for tests/bench: "N" makes the next N device counting
# calls raise a simulated transient abort (decremented per call)
_INJECT_ENV = "PHYLONIUM_TPU_INJECT_ABORT"
_inject_remaining: int | None = None


def _maybe_inject_abort() -> None:
    global _inject_remaining
    if _inject_remaining is None:
        raw = os.environ.get(_INJECT_ENV)
        _inject_remaining = int(raw) if raw and raw.isdigit() else 0
    if _inject_remaining > 0:
        _inject_remaining -= 1
        raise RuntimeError("ABORTED: TPU backend error (injected fault)")


def _is_transient_device_error(e: BaseException) -> bool:
    if not isinstance(e, (RuntimeError, OSError, ConnectionError)):
        return False
    msg = str(e)
    return any(tag in msg for tag in _TRANSIENT_MARKERS)


# "no usable device runtime at all" — e.g. the TPU plugin isn't
# registered in this process, or backend init failed outright.  Not
# transient (a reinit retry cannot help), but the bit-identical host
# path is still the right answer: fall back immediately.
_NO_BACKEND_MARKERS = (
    "not in the list of known backends",
    "Unable to initialize backend",
    "No visible",  # "No visible TPU devices" family
)


def _is_no_backend_error(e: BaseException) -> bool:
    if not isinstance(e, (RuntimeError, ValueError)):
        return False
    msg = str(e)
    return any(tag in msg for tag in _NO_BACKEND_MARKERS)


# fault injection: "N" makes the next N device counting calls HANG (the
# wedged-tunnel failure mode: no exception, no progress) — tests pair it
# with a small PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT
_HANG_ENV = "PHYLONIUM_TPU_INJECT_HANG"
_hang_remaining: int | None = None


def _maybe_inject_hang() -> None:
    global _hang_remaining
    if _hang_remaining is None:
        raw = os.environ.get(_HANG_ENV)
        _hang_remaining = int(raw) if raw and raw.isdigit() else 0
    if _hang_remaining > 0:
        _hang_remaining -= 1
        import time

        time.sleep(3600.0)


def _is_multiprocess() -> bool:
    """True in a multi-process (jax.distributed) run — read WITHOUT
    jax.process_count(), which may start the backend.  Import-free when
    jax was never loaded: ``import jax`` costs ~1.8 s on this host and
    a host-dispatched run must never pay it (jax.distributed cannot be
    initialized without importing jax first)."""
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import distributed

        return (distributed.global_state.num_processes or 1) > 1
    except Exception:
        return False


def _call_with_hang_bound(fn, timeout_s: float, label: str):
    """Run ``fn`` on a daemon thread and give up after ``timeout_s``.

    A wedged backend hangs device calls without raising (observed live
    for >1 h); the bound converts that into a TimeoutError the caller
    treats like a transient abort.  The abandoned thread is a daemon —
    the CLI exits via os._exit, so a leaked hung thread cannot block
    shutdown."""
    import threading

    box: dict = {}
    done = threading.Event()

    def work():
        try:
            box["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — relayed to caller
            box["error"] = e
        finally:
            done.set()

    t = threading.Thread(target=work, daemon=True, name=f"count-{label}")
    t.start()
    if not done.wait(timeout_s):
        raise TimeoutError(
            f"device counting ({label}) made no progress in "
            f"{timeout_s:.0f}s (wedged backend?)"
        )
    if "error" in box:
        raise box["error"]
    return box["result"]


def _reset_device_runtime() -> None:
    """Best-effort teardown of the jax runtime so a retry starts on a
    fresh backend connection (compiled programs reload from the
    persistent cache, so this costs seconds, not a recompile)."""
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass


def _attempt_timeout_s(states) -> float:
    """Hang bound for one device counting attempt (0 disables).

    The default scales with panel size so a legitimate cold run is
    never cut off: remote compiles take minutes and the tunnel has
    shipped as slowly as ~1 MB/s, so allow 900 s base + 1 s per MB of
    pileup (the device paths ship at most half that after packing).
    PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT overrides with an absolute
    number of seconds."""
    raw = os.environ.get("PHYLONIUM_TPU_DEVICE_ATTEMPT_TIMEOUT")
    if raw:
        try:
            return float(raw)
        except ValueError:
            pass
    return 900.0 + getattr(states, "nbytes", 0) / 1e6


def _resilient_device_counts(device_fn, states, cfg, progress, label):
    """Run a device counting path with transient-fault protection:
    on an abort, retry once on a reinitialized backend; on a WEDGE
    (the backend hangs without raising — observed live for >1 h), the
    per-attempt bound fires and the run goes STRAIGHT to the
    bit-identical host path (wedges last minutes, so an immediate
    retry would only stall through another timeout).  Exit code and
    stdout are unaffected by a flaky backend; only stderr warns.
    (The reference binary has no failure mode here — neither may we.)"""
    timeout_s = _attempt_timeout_s(states)

    carrier = "mesh" if label == "mesh" else "device"

    def attempt():
        if timeout_s > 0:
            result = _call_with_hang_bound(device_fn, timeout_s, label)
        else:
            result = device_fn()
        _set_carrier(carrier)
        return result

    try:
        return attempt()
    except TimeoutError as e:
        cfg.warn(f"{e}; counting on the bit-identical host path instead")
    except Exception as e:
        if _is_no_backend_error(e):
            cfg.warn(
                f"no usable device runtime ({str(e).splitlines()[0]}); "
                "counting on the bit-identical host path instead"
            )
        elif not _is_transient_device_error(e):
            raise
        else:
            cfg.warn(
                f"transient TPU backend error in the {label} counting "
                f"path ({str(e).splitlines()[0]}); reinitializing and "
                "retrying"
            )
            _reset_device_runtime()
            try:
                return attempt()
            except TimeoutError as e2:
                cfg.warn(
                    f"{e2}; counting on the bit-identical host path "
                    "instead"
                )
            except Exception as e2:
                if not _is_transient_device_error(e2) and not (
                    _is_no_backend_error(e2)
                ):
                    raise
                cfg.warn(
                    "device retry failed; counting on the bit-identical "
                    "host path instead"
                )
    from phylonium_tpu.ops.bitplane_host import pair_counts_host

    _set_carrier("host")
    return pair_counts_host(states, progress=progress)


# fixed tail of a resident device compare: result fetch + the dispatch
# round trips that remain even when the whole panel is already on the
# device (measured 0.5-1.5 s on the tunnelled deployment)
_DEVICE_TAIL_S = 1.5


def _auto_prefers_host(n: int, ref_len: int, cfg: RunConfig) -> bool:
    """Small-panel fast path: with 'auto' counting, panels whose host
    compare is predicted to beat the device path never touch the device
    runtime at all (no backend handshake, no kernel trace, no transfer
    — each of which costs seconds and, on few-core hosts, steals CPU
    from the mapping phase).

    The prediction is MEASURED when possible: once a verified link
    bandwidth exists (utils/calibration.py, recorded by earlier runs'
    sync-probed transfers), the decision compares predicted host
    compare time against predicted serial ship+kernel time — the
    decisive ratio is N/(2b)*bandwidth and the bandwidth swings 1-38
    MB/s, so no static Gbp constant can be right across windows.
    Before the first measurement (or under an explicit
    PHYLONIUM_TPU_AUTO_DEVICE_GBP) the static work threshold decides.
    Explicit backends, --mesh, and multi-process runs always take their
    requested path."""
    if cfg.count_backend != "auto" or cfg.mesh:
        return False
    if _is_multiprocess():
        return False
    work_gbp = n * (n - 1) / 2 * ref_len / 1e9
    if not os.environ.get("PHYLONIUM_TPU_AUTO_DEVICE_GBP"):
        from phylonium_tpu.utils import calibration

        link = calibration.link_mb_s()
        if link is not None:
            t_host = work_gbp / calibration.host_compare_gbps()
            # serial path ships the nibble-packed panel (N*L/2 bytes)
            # unhidden at compare time
            t_dev = n * ref_len / 2 / 1e6 / link + _DEVICE_TAIL_S
            LAST_RUN_INFO["dispatch_model"] = {
                "link_mb_s": round(link, 2),
                "t_host_s": round(t_host, 3),
                "t_device_s": round(t_dev, 3),
            }
            return t_host < t_dev
    return work_gbp < cfg.auto_device_min_gbp


def _stream_predicts_win(n: int, ref_len: int, cfg: RunConfig):
    """Measured-link prediction whether a STREAMED device compare beats
    the host compare: the 2-bit query panel (N*L/4 bytes) ships hidden
    under the mapping window, so the device pays only the unhidden ship
    remainder plus the fixed tail.  Returns None when no link
    measurement exists (caller falls back to the static threshold) or
    an explicit PHYLONIUM_TPU_AUTO_DEVICE_GBP pins the static rule."""
    if os.environ.get("PHYLONIUM_TPU_AUTO_DEVICE_GBP"):
        return None
    from phylonium_tpu.utils import calibration

    link = calibration.link_mb_s()
    if link is None:
        return None
    work_gbp = n * (n - 1) / 2 * ref_len / 1e9
    t_host = work_gbp / calibration.host_compare_gbps()

    from phylonium_tpu.serve.client import devd_enabled

    if devd_enabled():
        # the device server's content cache makes shipping an
        # AMORTIZED-zero cost: groups already parked there ship 0
        # bytes, and misses shipped now are the next run's hits — and
        # the devd race leg is socket waits, so engaging costs the
        # host leg ~nothing.  The gate therefore only excludes panels
        # the device CANNOT win: measured warm daemon counts are
        # ~0.25-0.5 s (devd_count_s in run reports), so any host
        # compare above the fixed tail is worth racing — the race
        # settles each individual window, bit-identically.
        win = t_host > _DEVICE_TAIL_S
        LAST_RUN_INFO["stream_model"] = {
            "link_mb_s": round(link, 2),
            "t_host_s": round(t_host, 3),
            "devd": True,
        }
        return win
    total_bp = n * ref_len
    ship_s = total_bp / 4 / (link * 1e6)
    overlap_s = total_bp / (calibration.map_gbps() * 1e9)
    unhidden = max(0.0, ship_s - overlap_s)
    LAST_RUN_INFO["stream_model"] = {
        "link_mb_s": round(link, 2),
        "t_host_s": round(t_host, 3),
        "unhidden_ship_s": round(unhidden, 3),
    }
    return unhidden + _DEVICE_TAIL_S < t_host


def _dispatch_devices():
    """Device list for dispatch decisions, hang-bounded.

    A wedged tunnel hangs the backend handshake without raising;
    dispatch then proceeds as if no usable device existed — the
    hang-bounded counting attempt or the host race keeps the run
    correct.  Multi-process runs block instead: every process must see
    the same topology or the collective desyncs."""
    if _is_multiprocess():
        import jax

        return jax.devices()
    from phylonium_tpu.utils.platform import devices_or_none

    return devices_or_none()


def _use_pallas(cfg: RunConfig) -> bool:
    if cfg.count_backend == "pallas":
        return True
    if cfg.count_backend not in ("auto", "device"):
        return False
    devs = _dispatch_devices()
    return bool(devs) and devs[0].platform == "tpu"


def _mesh_device_count(cfg: RunConfig) -> int:
    """Devices the counting mesh would span (0 = single-device path)."""
    if cfg.count_backend in ("numpy", "host"):
        return 0
    if cfg.mesh:
        rows, _, cols = cfg.mesh.partition(",")
        return int(rows) * int(cols or "1")
    devs = _dispatch_devices()
    n = len(devs) if devs else 0
    return n if n > 1 else 0


def _pair_counts_device(states: np.ndarray, cfg: RunConfig, progress=None):
    """Single-device counting: fused Pallas kernel on TPU, XLA einsum
    elsewhere."""
    from phylonium_tpu.utils.cache import enable_compile_cache
    from phylonium_tpu.utils.platform import cpu_pinned, ensure_device_plugin

    ensure_device_plugin()  # device chokepoint (idempotent)
    enable_compile_cache()
    _maybe_inject_abort()
    _maybe_inject_hang()
    # CPU-pinned runs need no backend handshake; everything else must
    # actually reach a device — an unreachable (wedged/absent) backend
    # raises here as UNAVAILABLE so the resilience wrapper falls back
    # after one bounded handshake instead of stalling a full attempt
    # bound inside the first kernel launch
    if not cpu_pinned() and _dispatch_devices() is None:
        raise RuntimeError(
            "UNAVAILABLE: backend handshake timed out or failed"
        )
    if _use_pallas(cfg):
        from phylonium_tpu.ops.pallas_match import (
            pair_counts_pallas,
            pair_counts_pallas_blocked,
        )

        # Mosaic kernels only exist on TPU; an explicit
        # --count-backend=pallas on a CPU-pinned run gets the interpret
        # kernel (bit-identical, slow) instead of a crash
        interpret = cpu_pinned()
        if states.shape[0] > ROW_BLOCK_THRESHOLD:
            return pair_counts_pallas_blocked(
                states, progress=progress, interpret=interpret
            )
        return pair_counts_pallas(states, interpret=interpret)
    from phylonium_tpu.ops.match_matrix import pair_counts_device

    return pair_counts_device(states)


def _pair_counts_mesh(states: np.ndarray, cfg: RunConfig):
    """Production multi-chip counting over a ('rows','cols') mesh.

    The TPU analogue of the reference's omp-parallel compare loop
    (src/process.cxx:524): pair blocks are data-parallel across every
    chip; exact int32 partials merge with a psum, so the matrix is
    bit-identical to the single-device path for any mesh shape.
    """
    import jax

    from phylonium_tpu.parallel.distributed import pair_counts_sharded
    from phylonium_tpu.parallel.mesh import make_mesh
    from phylonium_tpu.utils.cache import enable_compile_cache
    from phylonium_tpu.utils.platform import ensure_device_plugin

    ensure_device_plugin()  # device chokepoint (idempotent)
    enable_compile_cache()
    _maybe_inject_abort()
    _maybe_inject_hang()

    if cfg.mesh:
        rows, _, cols = cfg.mesh.partition(",")
        shape = (int(rows), int(cols or "1"))
        devices = jax.devices()
        if shape[0] * shape[1] > len(devices):
            raise ConfigError(
                f"--mesh {cfg.mesh} needs {shape[0] * shape[1]} devices; "
                f"the runtime has {len(devices)}"
            )
        mesh = make_mesh(shape, devices=devices[: shape[0] * shape[1]])
    else:
        from phylonium_tpu.parallel.multihost import make_pod_mesh

        mesh = make_pod_mesh()
    return pair_counts_sharded(states, mesh)


def _race_host(states, device_fn, progress=None):
    """Run ``device_fn`` on a thread while counting on the host; return
    whichever finishes first (results are bit-identical by construction).

    This is what makes a cold start fast: the first-ever run on a fresh
    machine pays a remote XLA compile that can take minutes, and the
    host path (native AVX2 kernel, ops/bitplane_host.py fallback)
    finishes long before that.  Once the persistent compile cache is
    seeded the device wins the race and the host thread aborts after at
    most one column chunk.
    """
    import threading

    from phylonium_tpu.ops.bitplane_host import pair_counts_host

    import os
    import time

    debug = os.environ.get("PHYLONIUM_TPU_DEBUG")
    outcome: dict = {}
    done = threading.Event()
    t0 = time.time()

    def device_work():
        try:
            outcome["result"] = device_fn()
        except Exception as e:
            outcome["error"] = e
        finally:
            done.set()

    t = threading.Thread(
        target=device_work, daemon=True, name="compare-device"
    )
    t.start()
    host_result = pair_counts_host(
        states, poll=done.is_set, progress=progress
    )

    def trace(msg):
        if debug:
            import sys

            print(
                f"compare race: {msg} after {time.time() - t0:.2f}s"
                + (
                    f" (device error: {outcome['error']!r})"
                    if "error" in outcome
                    else ""
                ),
                file=sys.stderr,
            )

    if host_result is not None and "result" not in outcome:
        trace("host won")
        _set_carrier("host")
        return host_result
    done.wait()
    if "result" in outcome:
        trace("device won")
        _set_carrier("device")
        return outcome["result"]
    # device path failed and the host run was aborted: redo on host
    trace("device failed, redoing on host")
    _set_carrier("host")
    return pair_counts_host(states, progress=progress)


def pair_counts(
    states: np.ndarray, cfg: RunConfig, progress=None
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs (substitutions, homologs) — the production dispatch.

    numpy    scalar oracle (tiny inputs, tests)
    host     native AVX2 / bitplane popcount on the host
    mesh     every available chip via shard_map + psum (auto whenever
             the runtime exposes more than one device, or --mesh R,C)
    device   single-chip Pallas (TPU) or XLA einsum, raced against the
             host so a cold compile cache never blocks a run

    ``progress`` (optional) receives a completed fraction in [0, 1];
    paths with internal chunking report it live.
    """
    backend = cfg.count_backend
    if backend == "numpy":
        from phylonium_tpu.ops.match_table import pair_counts_numpy

        _set_carrier("numpy")
        return pair_counts_numpy(states)
    if backend == "host" or _auto_prefers_host(
        states.shape[0], states.shape[1], cfg
    ):
        from phylonium_tpu.ops.bitplane_host import pair_counts_host

        _set_carrier("host")
        return pair_counts_host(states, progress=progress)

    # an explicit --mesh names the collective path (its device count is
    # the mesh shape — no backend handshake needed to decide); an
    # explicit 'pallas'/'device' names the single-device path and must
    # actually run it (reproducibility/debugging)
    if cfg.mesh and _mesh_device_count(cfg) > 1:
        # multi-PROCESS runs must not retry/fall back per process: a
        # lone process abandoning the collective would desync or hang
        # its peers mid-psum.  Single-process meshes get the full
        # retry-then-host resilience (hang-bounded attempts included).
        if _is_multiprocess():
            result = _pair_counts_mesh(states, cfg)
            _set_carrier("mesh")
        else:
            result = _resilient_device_counts(
                lambda: _pair_counts_mesh(states, cfg),
                states, cfg, progress, "mesh",
            )
        if progress is not None:
            # the sharded compare is one collective program; nothing
            # incremental to report, but complete the bar honestly
            progress(1.0)
        return result

    if backend == "auto" and _is_multiprocess():
        # pod runs: every process joins the collective, no race/fallback
        result = _pair_counts_mesh(states, cfg)
        _set_carrier("mesh")
        if progress is not None:
            progress(1.0)
        return result

    if backend == "auto":
        from phylonium_tpu.utils.platform import cpu_pinned

        if cpu_pinned():
            # the "device" IS this CPU: racing it against the host
            # kernel would split the one core and leave the loser
            # thread inside XLA at interpreter exit — fatal for
            # in-process callers (dryrun_multichip, tests), pointless
            # for perf.  The host kernel is the fastest CPU path.
            from phylonium_tpu.ops.bitplane_host import pair_counts_host

            _set_carrier("host")
            return pair_counts_host(states, progress=progress)

        # Single-process auto: EVERY device decision — the backend
        # handshake, the device count (mesh vs single chip), the kernel
        # choice — happens on the race thread.  A wedged tunnel that
        # hangs the handshake therefore costs nothing: the host leg
        # starts immediately and wins (device failures lose the race,
        # they never propagate).
        def device_leg():
            devs = _dispatch_devices()
            if not devs:
                raise RuntimeError(
                    "UNAVAILABLE: backend handshake timed out or failed"
                )
            if len(devs) > 1:
                return _pair_counts_mesh(states, cfg)
            return _pair_counts_device(states, cfg, progress)

        result = _race_host(states, device_leg, progress)
        if progress is not None:
            progress(1.0)
        return result
    return _resilient_device_counts(
        lambda: _pair_counts_device(states, cfg, progress),
        states, cfg, progress, backend,
    )


def prewarm_counts(n: int, ref_len: int, cfg: RunConfig):
    """Start compiling the counting kernel in the background.

    Remote (tunnelled) XLA compiles can take from seconds to minutes;
    the kernel shapes are fully determined by (n, ref_len) thanks to
    shape bucketing, so compilation overlaps the host-side index build
    and mapping phases.  Everything jax-related (including backend
    discovery, which blocks on the tunnel handshake) happens on the
    worker thread.  Returns the thread (daemon; safe to ignore).
    """
    import threading

    # 'device' routes to the Pallas kernel on TPU too (_use_pallas), so
    # it gets the prewarm as well
    if cfg.count_backend not in ("auto", "pallas", "device"):
        return None
    if _auto_prefers_host(n, ref_len, cfg) and not (
        getattr(cfg, "_query_shipper", None) is not None
        or _stream_predicts_win(n, ref_len, cfg)
    ):
        return None  # panel stays on the host; don't spin up the device

    def work():
        try:
            from phylonium_tpu.serve.client import devd_enabled

            if devd_enabled() and (
                getattr(cfg, "_query_shipper", None) is not None
                or _stream_predicts_win(n, ref_len, cfg)
            ):
                # streamed run through the device server: the programs
                # live in the DAEMON's warm session and compile on
                # demand into the shared persistent cache.  No prewarm
                # request: a background compile thread in the daemon
                # measurably starves the foreground group/finish ops
                # (1-core host + serialized remote compile service),
                # costing the race more than a first-shape compile does
                # — which the host race absorbs exactly once per shape.
                return
            from phylonium_tpu.utils.cache import enable_compile_cache
            from phylonium_tpu.utils.platform import ensure_device_plugin

            ensure_device_plugin()
            enable_compile_cache()  # before the first compile
            if not _use_pallas(cfg):
                return  # CPU/XLA compiles are local and fast
            import jax
            import jax.numpy as jnp

            from phylonium_tpu.ops.pallas_match import (
                _PACKED_PAD,
                _pallas_counts,
                blocked_call_shape,
                cross_counts_pallas,
                packed_call_shape,
            )

            if n > ROW_BLOCK_THRESHOLD:
                # blocked path: warm the rectangular panel kernel at the
                # exact first-call shape
                rb_pad, block, cols = blocked_call_shape(n, ref_len)
                dummy = jnp.full((rb_pad, cols), _PACKED_PAD, jnp.uint8)
                out = cross_counts_pallas(dummy, dummy, block, packed=True)
            else:
                n_pad, block, cols = packed_call_shape(n, ref_len)
                dummy = jnp.full((n_pad, cols), _PACKED_PAD, jnp.uint8)
                out = _pallas_counts(dummy, block, packed=True)
            jax.block_until_ready(out)
            if (
                not cfg.mesh
                and not cfg.complete_deletion
                and not cfg.print_positions
                and not cfg.checkpoint_dir
                and cfg.count_backend == "auto"
            ):
                from phylonium_tpu.core.stream import prewarm_stream

                prewarm_stream(n, ref_len)
        except Exception:
            pass  # prewarm is best-effort; the real call will compile

    t = threading.Thread(target=work, daemon=True, name="prewarm-counts")
    t.start()
    return t


def _late_mesh_available(cfg: RunConfig) -> bool:
    """True when the backend handshake completed (possibly after
    streaming already started) and exposes a multi-device runtime the
    mesh path should own.  Non-blocking: a still-wedged handshake reads
    as 'no mesh' and the streamed/raced single-device plan stands."""
    from phylonium_tpu.utils.platform import backends_initialized

    if not backends_initialized():
        return False
    try:
        return _mesh_device_count(cfg) > 1
    except Exception:
        return False


def _should_stream(n: int, ref_len: int, cfg: RunConfig, ref) -> bool:
    """Streamed map→pileup→transfer overlap (core/stream.py) applies to
    the plain 'auto' single-device production path on panels the
    work-based dispatch sends to the device.  Paths that need the whole
    homology set before the pileup (complete deletion, '-p'), explicit
    backends (which name exact code paths), checkpointing, meshes, and
    multi-process runs keep the serial phases.

    PHYLONIUM_TPU_STREAM=0 disables; =force enables regardless of
    platform/threshold (tests run the full streamed pipeline on CPU in
    kernel-interpret mode this way).
    """
    env = os.environ.get("PHYLONIUM_TPU_STREAM", "")
    if env == "0":
        return False
    if cfg.count_backend != "auto" or cfg.mesh:
        return False
    from phylonium_tpu.core.stream import effective_group_rows

    group = effective_group_rows(n)
    if n <= group and env != "force":
        # a single feed group only finishes mapping when mapping is
        # over — nothing can overlap, shipped_fraction is 0 by
        # construction, and the serial path's host race handles this
        # panel class strictly better
        return False
    if cfg.complete_deletion or cfg.print_positions or cfg.checkpoint_dir:
        return False
    if cfg.map_backend not in ("auto", "native"):
        return False
    if ref.backend_name != "native":
        return False
    if _is_multiprocess():
        return False
    if env == "force":
        return True
    shipper = getattr(cfg, "_query_shipper", None)
    if shipper is not None and not shipper._cancelled:
        # the CLI's early-ship gate already decided (with measured link
        # bandwidth and actual file sizes) that this panel's device
        # compare is worth the link+CPU spend — and the 2-bit codes are
        # already shipping; bailing out here would waste them
        pass
    else:
        win = _stream_predicts_win(n, ref_len, cfg)
        if win is None:
            if _auto_prefers_host(n, ref_len, cfg):
                return False
        elif not win:
            return False
    # every remaining check avoids jax.devices(): the backend handshake
    # can block for seconds and belongs on the prewarm thread, not in
    # the pipeline's critical path.  Device count only matters once the
    # backend is up (a multi-chip runtime routes to the mesh instead).
    from phylonium_tpu.utils.platform import backends_initialized

    if backends_initialized() and _mesh_device_count(cfg) > 1:
        return False
    # a CPU-pinned run sets jax_platforms (conftest,
    # PHYLONIUM_TPU_PLATFORM); otherwise this deployment's default
    # backend is the TPU
    from phylonium_tpu.utils.platform import cpu_pinned

    return not cpu_pinned()


def _should_stream_mp(n: int, ref_len: int, cfg: RunConfig, ref) -> bool:
    """Streamed resident-shard pipeline for multi-process pod runs
    (parallel/stream_mp.py): each process maps its contiguous genome
    block and feeds its own device's shard during mapping; the compare
    is the usual collective on resident data.  Applies to the plain
    'auto' path with ONE local device per process (the v5e pod
    topology); every process evaluates the same deterministic inputs,
    so the engage decision is collective-consistent."""
    if not _is_multiprocess():
        return False
    env = os.environ.get("PHYLONIUM_TPU_STREAM", "")
    if env == "0":
        return False
    if cfg.count_backend != "auto" or cfg.mesh:
        return False
    if cfg.complete_deletion or cfg.print_positions or cfg.checkpoint_dir:
        return False
    if cfg.map_backend not in ("auto", "native"):
        return False
    if ref.backend_name != "native":
        return False
    import jax

    if jax.local_device_count() != 1:
        return False
    from phylonium_tpu.core.stream import effective_group_rows

    if env == "force":
        return True
    if n <= effective_group_rows(n):
        return False
    from phylonium_tpu.utils.platform import cpu_pinned

    return not cpu_pinned()


def process(
    subject: Sequence, queries: list[Sequence], cfg: RunConfig
) -> EvoCounts:
    import time

    LAST_RUN_INFO.clear()
    timings: dict[str, float] = {}
    n = len(queries)

    if cfg.count_backend == "auto" and not cfg.mesh:
        # the estimates this run's dispatch decisions act on (None
        # before the first measured transfer) — run-report observability
        try:
            from phylonium_tpu.utils import calibration

            LAST_RUN_INFO["calibration"] = calibration.snapshot()
        except Exception:
            pass

    # start compiling the counting kernel while the host builds the index
    # and maps queries (shapes are fixed by (n, |subject|) via bucketing)
    prewarm_counts(n, len(subject), cfg)

    t0 = time.time()
    ref = ESAIndex(subject, backend=cfg.esa_backend)
    timings["index"] = time.time() - t0
    gc = gc_content(subject.nucl)
    threshold = min_anchor_length(cfg.anchor_p_value, gc, ref.size)

    if cfg.verbose:
        print(f"ref: {subject.name}", file=sys.stderr)

    if _should_stream_mp(n, len(subject), cfg, ref):
        from phylonium_tpu.parallel.stream_mp import (
            map_pileup_count_streamed_mp,
        )

        t0 = time.time()
        subs, homs = map_pileup_count_streamed_mp(
            ref, threshold, queries, cfg
        )
        timings["map+feed+compare"] = time.time() - t0
        _set_carrier("mesh")
        LAST_RUN_INFO["timings"] = {
            k: round(v, 3) for k, v in timings.items()
        }
        if cfg.verbose >= 2:
            phases = "  ".join(
                f"{k}={v:.3f}s" for k, v in timings.items()
            )
            print(
                f"phase timings ({ref.backend_name} index, "
                f"{cfg.count_backend} counts, mesh carried, pod "
                f"streamed): {phases}",
                file=sys.stderr,
            )
        return EvoCounts(subs, homs)

    from phylonium_tpu.core.lowmem import should_lowmem

    if should_lowmem(n, sum(len(q) for q in queries), cfg, ref):
        from phylonium_tpu.core.lowmem import map_count_lowmem
        from phylonium_tpu.utils import calibration

        subs, homs, lm_timings = map_count_lowmem(
            ref, threshold, queries, cfg
        )
        timings.update(lm_timings)
        calibration.record_map(
            sum(len(q) for q in queries) / 1e9,
            lm_timings.get("map+feed", 0.0),
        )
        if LAST_RUN_INFO.get("compare_carrier") == "host":
            calibration.record_host_compare(
                n * (n - 1) / 2 * len(subject) / 1e9,
                lm_timings.get("compare", 0.0),
            )
        LAST_RUN_INFO["timings"] = {
            k: round(v, 3) for k, v in timings.items()
        }
        if cfg.verbose >= 2:
            phases = "  ".join(
                f"{k}={v:.3f}s" for k, v in timings.items()
            )
            carrier = LAST_RUN_INFO.get("compare_carrier", "?")
            print(
                f"phase timings ({ref.backend_name} index, "
                f"{cfg.count_backend} counts, {carrier} carried, "
                f"low-mem): {phases}",
                file=sys.stderr,
            )
        return EvoCounts(subs, homs)

    shipper = getattr(cfg, "_query_shipper", None)
    feeder = None
    if _should_stream(n, len(subject), cfg, ref):
        from phylonium_tpu.core.stream import (
            DeviceRowFeeder,
            map_pileup_streamed,
        )

        try:
            # interpret mode only for CPU-pinned (test/forced) runs —
            # derived from the config pin, NOT jax.devices(), whose
            # backend handshake would block the pipeline here
            from phylonium_tpu.utils.platform import cpu_pinned

            feeder = DeviceRowFeeder(
                n, len(subject), interpret=cpu_pinned(), shipper=shipper
            )
        except Exception:
            feeder = None  # feeder construction is best-effort

    if feeder is None and shipper is not None:
        # the run went elsewhere (host dispatch, mesh, a non-streamable
        # late condition): stop spending link bandwidth on query codes
        # nobody will count on
        shipper.cancel()

    if feeder is not None:
        from phylonium_tpu.utils import calibration

        t0 = time.time()
        homologies, states = map_pileup_streamed(
            ref, threshold, queries, cfg, feeder
        )
        t_map = time.time() - t0
        timings["map+pileup+feed"] = t_map
        # the measured overlap window (mapping with the feed's CPU
        # steal folded in) — exactly what the early-ship gate predicts
        calibration.record_map(
            sum(len(q) for q in queries) / 1e9, t_map
        )
        return _compare_and_finish(
            subject, queries, cfg, ref, states, homologies, timings,
            feeder,
        )

    t0 = time.time()
    homologies = map_queries(ref, threshold, queries, cfg)
    timings["map"] = time.time() - t0
    if (
        cfg.map_backend in ("auto", "native")
        and ref.backend_name == "native"
        and not cfg.checkpoint_dir  # partial mapping skews the rate
        and not _is_multiprocess()  # each process maps only its shard
    ):
        from phylonium_tpu.utils import calibration

        calibration.record_map(
            sum(len(q) for q in queries) / 1e9, timings["map"]
        )

    if cfg.complete_deletion:
        homologies = complete_delete(homologies)

    t0 = time.time()
    query_arrays = [q.as_array() for q in queries]
    # The device pileup builder (ops/pileup_device.py) ships 4x fewer
    # bytes but pays a per-column gather that measures slower than host
    # build + one bulk transfer at every scale on v5e; it stays opt-in
    # for transfer-starved deployments.  '-p' needs the host matrix.
    if (
        os.environ.get("PHYLONIUM_TPU_DEVICE_PILEUP") == "1"
        and _use_pallas(cfg)
        and not cfg.print_positions
    ):
        from phylonium_tpu.ops.pileup_device import build_pileup_device
        from phylonium_tpu.utils.cache import enable_compile_cache
        from phylonium_tpu.utils.platform import ensure_device_plugin

        ensure_device_plugin()  # device chokepoint (idempotent)
        enable_compile_cache()
        states = build_pileup_device(
            query_arrays, homologies, len(subject)
        )
    else:
        states = build_pileup(query_arrays, homologies, len(subject))
    timings["pileup"] = time.time() - t0

    if cfg.print_positions:
        write_refpos(
            cfg.refpos_file_name, subject.nucl, states, homologies[0]
        )

    return _compare_and_finish(
        subject, queries, cfg, ref, states, homologies, timings, None
    )


def finish_ship_accounting(feeder, n: int, ref_len: int) -> None:
    """Cold-run seeding + early-ship observability, shared by the
    standard and low-memory pipelines.

    Under ``PHYLONIUM_TPU_SHIP_DRAIN`` (the bench's cold-run hook) the
    run stays alive until the whole panel is parked in the device
    server's content cache — and, when the device never carried a count
    at this shape, until the daemon's program family is compiled
    (synchronous ``prewarm``), so the NEXT run of the same panel races
    hot with zero bytes shipped.  Always records the early-ship stats
    (groups / MB / MB/s / cache hits) into LAST_RUN_INFO."""
    import time

    if feeder is None or feeder._shipper is None:
        return
    drain_env = os.environ.get("PHYLONIUM_TPU_SHIP_DRAIN")
    if (
        drain_env
        and feeder._shipper.transport == "devd"
        and not feeder._shipper._cancelled
    ):
        t_dr = time.time()
        budget = float(drain_env)
        complete = feeder._shipper.drain(budget)
        drain_info = {
            "complete": complete,
            "s": round(time.time() - t_dr, 2),
        }
        left = budget - (time.time() - t_dr)
        if (
            complete
            and left > 30.0
            and LAST_RUN_INFO.get("compare_carrier") != "device"
        ):
            # content is parked but the daemon never finished a count
            # at this shape (the race's abandoned device leg may still
            # be compiling): block until its jit cache is hot, so the
            # NEXT run's device leg starts with zero compiles instead
            # of losing the race to them
            try:
                from phylonium_tpu.serve.client import get_client

                reply, _ = get_client().request(
                    {
                        "op": "prewarm",
                        "n": n,
                        "ref_len": int(ref_len),
                        # the run's actual feeding-group layout (the
                        # lowmem pipeline sizes groups from its RSS
                        # budget; the build programs are per-layout)
                        "group_rows": feeder._shipper.group_rows,
                        "sync": True,
                    },
                    timeout=left,
                )
                drain_info["prewarm_s"] = reply.get("seconds")
            except Exception as e:  # noqa: BLE001 — best-effort
                drain_info["prewarm_error"] = repr(e)[:120]
        LAST_RUN_INFO["ship_drain"] = drain_info
    mb_s = feeder._shipper.achieved_mb_s()
    LAST_RUN_INFO["early_ship"] = {
        "groups": feeder._shipper.shipped_groups(),
        "mb": round(feeder._shipper.shipped_bytes() / 1e6, 1),
        "mb_s": round(mb_s, 2) if mb_s else None,
        "cache_hits": feeder._shipper._hits,
    }


def race_grace_if_warm(feeder) -> None:
    """On fully cache-warm device-server runs (every group was a daemon
    content hit), wait briefly for the feeder to dispatch the tail
    group BEFORE the host race leg claims the core: the ~0.1-0.4 s of
    host-side prep left in the queue otherwise stretches 3-4x under
    single-core contention, inflating the device leg's observed tail."""
    import time

    shipper = feeder._shipper
    if not (
        feeder._devd
        and shipper is not None
        and shipper._enqueued > 0
        and shipper._hits == shipper._enqueued
    ):
        return
    _g0 = time.time()
    ok = feeder.wait_dispatched(
        float(os.environ.get("PHYLONIUM_TPU_RACE_GRACE_S", "3.0"))
    )
    if os.environ.get("PHYLONIUM_TPU_DEBUG"):
        print(
            f"race grace: waited {time.time() - _g0:.2f}s drained={ok}",
            file=sys.stderr,
        )


def _compare_and_finish(
    subject, queries, cfg, ref, states, homologies, timings, feeder
) -> EvoCounts:
    """Shared compare phase: the production dispatch, or — when the
    streamed pipeline already shipped the panel — the resident-device
    count raced against the host (so a degraded tunnel still finishes
    at host speed, bit-identically)."""
    import time

    from phylonium_tpu.utils.progress import ProgressBar

    n = len(queries)
    num_comparisons = (n * n - n) // 2
    bar = ProgressBar(
        "Comparing the sequences",
        num_comparisons,
        enabled=cfg.progress_enabled,
    )
    progress = lambda frac: bar.update(int(frac * num_comparisons))  # noqa: E731

    t0 = time.time()
    if (
        feeder is not None
        and os.environ.get("PHYLONIUM_TPU_STREAM") != "force"
        and _late_mesh_available(cfg)
    ):
        # the backend handshake completed AFTER _should_stream decided
        # (docs/ROUND3.md "known limitations"): this runtime exposes a
        # multi-chip mesh, which beats the single-device resident count
        # the feeder was shipping toward.  Hand the compare to the
        # normal production dispatch (mesh, raced/resilient) and stop
        # the feeder — bit-identical either way.
        feeder.cancel()
        LAST_RUN_INFO["stream_handoff"] = "mesh"
        if cfg.verbose >= 2 or os.environ.get("PHYLONIUM_TPU_DEBUG"):
            print(
                "stream: multi-device runtime appeared after streaming "
                "started; handing the compare to the mesh path",
                file=sys.stderr,
            )
        feeder = None

    if feeder is not None:
        # the feeder knows how much of the panel verifiably reached the
        # device during mapping.  If shipping lagged badly, the device
        # leg cannot win the race — and on a few-core host its tracing/
        # transfer work would slow the host leg 25-55% (measured), so
        # skip straight to the host path.  Device-server feeders are
        # exempt: their client-side leg is socket waits (no tracing,
        # no packing), so racing always is safe and the race itself
        # settles whether the daemon's remaining builds beat the host.
        frac = 1.0 if feeder._devd else feeder.shipped_fraction()
        if frac < 0.5:
            if os.environ.get("PHYLONIUM_TPU_DEBUG"):
                print(
                    f"compare: streaming shipped {frac:.0%} during "
                    "mapping; counting on host without a device race",
                    file=sys.stderr,
                )
            feeder.cancel()  # stop shipping what nobody will count
            from phylonium_tpu.ops.bitplane_host import pair_counts_host

            _set_carrier("host")
            subs, homs = pair_counts_host(states, progress=progress)
        else:
            race_grace_if_warm(feeder)
            subs, homs = _race_host(
                states, lambda: feeder.finish(progress), progress
            )
            if feeder.devd_count_s is not None:
                # daemon-side count time of a COMPLETED device finish —
                # the measured warm tail the dispatch gates care about
                LAST_RUN_INFO["devd_count_s"] = feeder.devd_count_s
    else:
        subs, homs = pair_counts(states, cfg, progress=progress)
    timings["compare"] = time.time() - t0
    bar.finish()

    finish_ship_accounting(feeder, n, states.shape[1])

    if LAST_RUN_INFO.get("compare_carrier") == "host":
        from phylonium_tpu.utils import calibration

        calibration.record_host_compare(
            n * (n - 1) / 2 * states.shape[1] / 1e9, timings["compare"]
        )

    LAST_RUN_INFO["timings"] = {k: round(v, 3) for k, v in timings.items()}
    if cfg.verbose >= 2:
        phases = "  ".join(f"{k}={v:.3f}s" for k, v in timings.items())
        carrier = LAST_RUN_INFO.get("compare_carrier", "?")
        print(
            f"phase timings ({ref.backend_name} index, "
            f"{cfg.count_backend} counts, {carrier} carried): {phases}",
            file=sys.stderr,
        )

    counts = EvoCounts(subs, homs)
    return counts
