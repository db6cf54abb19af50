"""Benchmark: eco29-scale all-pairs comparison throughput on one chip.

Simulates an eco29-like panel (29 genomes, 5 Mbp, 1-6% divergence, one
draft assembly with contig splits and an inversion), runs the full
pipeline, and measures the comparison phase (the reference's dominant
O(N^2 * L) cost, src/process.cxx:524-549) on the device.

Prints ONE JSON line:
  metric       eco29_sim_compare_pairs_per_s
  value        genome pairs per second through the device counting path
  unit         pairs/s
  vs_baseline  speedup vs the host byte-compare oracle (the reference's
               SIMD-loop equivalent measured on this machine, numpy
               vectorized) on the same pileup
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ORACLE = os.path.join(REPO, "tests", "oracle", "bin", "phylonium")


def prewarm_shape(n: int, length: int) -> None:
    """Compile (and persist) the counting-kernel executable for an
    (n, length) panel so a subsequent fresh process hits the cache."""
    try:
        from phylonium_tpu.config import RunConfig
        from phylonium_tpu.core.pipeline import prewarm_counts

        t = prewarm_counts(n, length, RunConfig(progress="never"))
        if t is not None:
            t.join(timeout=300)
    except Exception:
        pass


def end_to_end_vs_reference(genomes, timeout_s: int = 300) -> dict:
    """Wall-clock both CLIs on identical FASTA files; byte-compare output.

    Best-effort: returns {} when the reference oracle binary is missing
    and cannot be built (it needs /root/reference mounted).
    """
    import shutil
    import subprocess
    import tempfile

    if not os.path.exists(ORACLE):
        script = os.path.join(REPO, "tests", "oracle", "build_oracle.sh")
        try:
            subprocess.run(
                ["sh", script], capture_output=True, timeout=180,
                check=True,
            )
        except Exception:
            return {}
    tmp = tempfile.mkdtemp(prefix="phylonium_bench_")
    try:
        files = []
        for k, g in enumerate(genomes):
            path = os.path.join(tmp, f"S{k:03d}.fasta")
            with open(path, "wb") as f:
                for ci, contig in enumerate(g.split(b"!")):
                    f.write(b">S%03d_c%d\n" % (k, ci))
                    for i in range(0, len(contig), 80):
                        f.write(contig[i : i + 80] + b"\n")
            files.append(path)

        def run(cmd):
            t0 = time.time()
            r = subprocess.run(
                cmd, capture_output=True, timeout=timeout_s, cwd=tmp
            )
            return time.time() - t0, r

        try:
            t_ref, r_ref = run([ORACLE, *files])
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
            t0 = time.time()
            r_tpu = subprocess.run(
                [sys.executable, "-m", "phylonium_tpu", *files],
                capture_output=True, timeout=timeout_s, cwd=tmp, env=env,
            )
            t_tpu = time.time() - t0
        except subprocess.TimeoutExpired:
            return {}
        if r_ref.returncode or r_tpu.returncode:
            sys.stderr.write(
                f"e2e failed: ref rc={r_ref.returncode} "
                f"tpu rc={r_tpu.returncode} "
                f"stderr={r_tpu.stderr[-500:]!r}\n"
            )
            return {}

        return {
            "e2e_ref_s": round(t_ref, 2),
            "e2e_tpu_s": round(t_tpu, 2),
            "e2e_speedup": round(t_ref / t_tpu, 3),
            # byte equality — the same invariant the test suite holds
            "e2e_identical": r_ref.stdout == r_tpu.stdout,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def simulate_panel(n=29, length=5_000_000, seed=29):
    rng = np.random.default_rng(seed)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    lut = np.zeros(256, np.uint8)
    for c, b in enumerate(b"ACGT"):
        lut[b] = c

    ref = rng.choice(acgt, length).tobytes()

    def mutate(s, p):
        arr = np.frombuffer(s, np.uint8).copy()
        idx = np.flatnonzero(rng.random(arr.size) < p)
        arr[idx] = acgt[(lut[arr[idx]] + rng.integers(1, 4, idx.size)) % 4]
        return arr.tobytes()

    genomes = [ref]
    for k in range(1, n):
        g = mutate(ref, 0.01 + 0.05 * (k - 1) / max(n - 2, 1))
        genomes.append(g)

    # make one a draft assembly: 5 contigs + a 500kb inversion
    from phylonium_tpu.data.sequence import revcomp

    g = bytearray(genomes[-1])
    third = length // 3
    inv = min(500_000, length // 6)
    g[third : third + inv] = revcomp(bytes(g[third : third + inv]))
    contig_len = length // 5
    genomes[-1] = b"!".join(
        bytes(g[i * contig_len : (i + 1) * contig_len]) for i in range(5)
    )
    return genomes


def measure_cross_512(length: int) -> float:
    """Tbp/s of pair work through the rectangular kernel at 512-row
    panels — the row-blocked path's unit of work, where one-hot-plane
    reuse is quadratic (~74% of peak MXU measured; ARCHITECTURE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from phylonium_tpu.ops.pallas_match import (
        blocked_call_shape,
        cross_counts_pallas,
        pack_states,
    )

    rng = np.random.default_rng(0)
    n = 512
    states = rng.integers(0, 11, size=(n, length), dtype=np.uint8)
    rb_pad, block, cols = blocked_call_shape(1000, length)
    packed = jnp.asarray(pack_states(states, rb_pad, cols))
    reps = 8

    def chained(a):
        def body(i, carry):
            acc, s = carry
            s = lax.dynamic_update_slice(
                s, (acc[:1, :1] % 11).astype(jnp.uint8), (0, 0)
            )
            m, h = cross_counts_pallas(s, s, block, packed=True)
            return (acc + m, s)

        z = jnp.zeros((rb_pad, rb_pad), jnp.int32)
        return lax.fori_loop(0, reps, body, (z, a))[0]

    cj = jax.jit(chained)
    np.asarray(cj(packed))  # warm/compile
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        np.asarray(cj(packed))
        best = min(best, time.time() - t0)
    return n * n * length / (best / reps) / 1e12


def measure_anchor_extend(genome: bytes, length: int) -> float:
    """Chained on-device throughput of the Pallas extension kernel."""
    import jax
    import jax.numpy as jnp

    from phylonium_tpu.data.sequence import revcomp
    from phylonium_tpu.ops.anchor_extend_pallas import (
        _diagonal_neq_pallas,
        pad_text2,
    )

    ext_tile = 8192
    s_text = np.frombuffer(
        genome + b"#" + revcomp(genome), dtype=np.uint8
    )
    s_dev = jnp.asarray(pad_text2(s_text, "a", ext_tile))
    s_dev2 = jnp.asarray(pad_text2(s_text, "b", ext_tile))
    n_jobs = 128
    ext_len = int(min(max(length // 2, ext_tile), 1 << 19))
    ext_off = np.linspace(
        0, len(s_text) - ext_len - 1, n_jobs
    ).astype(np.int32)
    lims = jnp.full((n_jobs,), len(s_text), jnp.int32)
    ext_reps = 16

    def chained_ext(off):
        def body(i, carry):
            total, o = carry
            bits = _diagonal_neq_pallas(
                s_dev, s_dev2, o, o, lims, lims, ext_len, ext_tile
            )
            s = bits.sum(dtype=jnp.int32)
            return total + s, (o + s % 1).astype(jnp.int32)

        return jax.lax.fori_loop(
            0, ext_reps, body, (jnp.int32(0), off)
        )[0]

    ext_jit = jax.jit(chained_ext)
    int(ext_jit(jnp.asarray(ext_off)))  # warm/compile
    t0 = time.time()
    int(ext_jit(jnp.asarray(ext_off)))
    t_ext = time.time() - t0
    return ext_reps * n_jobs * ext_len / t_ext / 1e9


def main():
    from phylonium_tpu.config import RunConfig
    from phylonium_tpu.core.anchor_stats import min_anchor_length
    from phylonium_tpu.core.pileup import build_pileup
    from phylonium_tpu.core.pipeline import map_queries
    from phylonium_tpu.data.sequence import Sequence, gc_content
    from phylonium_tpu.index.esa import ESAIndex
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000

    t0 = time.time()
    genomes = simulate_panel(n, length)
    queries = [Sequence(f"S{k}", g) for k, g in enumerate(genomes)]
    t_sim = time.time() - t0

    cfg = RunConfig(progress="never")

    t0 = time.time()
    ref = ESAIndex(queries[0])
    t_index = time.time() - t0

    threshold = min_anchor_length(0.025, gc_content(queries[0].nucl), ref.size)

    t0 = time.time()
    homologies = map_queries(ref, threshold, queries, cfg)
    t_map = time.time() - t0

    t0 = time.time()
    arrays = [q.as_array() for q in queries]
    states = build_pileup(arrays, homologies, len(queries[0]))
    t_pileup = time.time() - t0

    # transfer once (as the real pipeline does), then time pure device work
    import jax
    import jax.numpy as jnp

    from phylonium_tpu.core.pipeline import pair_counts, prewarm_counts
    from phylonium_tpu.ops.pallas_match import _pad_rows, _pallas_counts
    from phylonium_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    # backend/tunnel init is a once-per-process constant — time it apart
    # from the data transfer so neither is misattributed
    t0 = time.time()
    jax.devices()
    t_backend_init = time.time() - t0

    t0 = time.time()
    states_dev = jax.device_put(states)
    jax.block_until_ready(states_dev)
    t_transfer = time.time() - t0

    use_pallas = jax.devices()[0].platform == "tpu"

    # First compare through the PRODUCTION dispatch, exactly what the
    # CLI runs: small panels count on the host AVX2 path outright (the
    # device's fixed costs exceed its savings below the work threshold);
    # large panels race the packed Pallas kernel against the host, so a
    # cold compile cache never blocks either way.
    from phylonium_tpu.core.pipeline import _auto_prefers_host

    compare_dispatch = (
        "host" if _auto_prefers_host(n, length, cfg) else "device"
    )
    prewarm_counts(n, length, cfg)
    t0 = time.time()
    subs, homs = pair_counts(states, cfg)
    t_compare_first = time.time() - t0

    # Steady-state kernel timing: a serialized fori_loop chain (each
    # iteration's input depends on the previous result) inside one jit.
    # Naive re-dispatch timing over the remote-device tunnel reports
    # impossible numbers (async dispatch); a dependency chain cannot lie.
    from phylonium_tpu.ops.pallas_match import default_block_cols
    from jax import lax

    n_pad = _pad_rows(n)
    block = default_block_cols(n_pad)
    lpad = (-length) % block
    padded = jnp.pad(
        states_dev,
        ((0, n_pad - n), (0, lpad)),
        constant_values=10,
    )
    jax.block_until_ready(padded)
    reps = 10

    def chained(states):
        def body(i, carry):
            acc, s = carry
            s = lax.dynamic_update_slice(
                s, (acc[:1, :1] % 11).astype(jnp.uint8), (0, 0)
            )
            if use_pallas:
                m = _pallas_counts(s, block)[0].astype(jnp.int32)
            else:
                from phylonium_tpu.ops.match_matrix import (
                    _pair_counts_scanned,
                )

                m, h = _pair_counts_scanned(s, block)
            return (acc + m, s)

        acc0 = jnp.zeros((states.shape[0], states.shape[0]), jnp.int32)
        out, _ = lax.fori_loop(0, reps, body, (acc0, states))
        return out

    chained_jit = jax.jit(chained)
    np.asarray(chained_jit(padded))  # warm/compile

    # host + tunnel swing ~10x and degraded windows last minutes, so a
    # single burst of samples can land entirely inside one; sample now
    # AND again at the very end of the bench (after the minutes-long
    # e2e runs) and take the overall min — each sample is a 10-deep
    # on-device dependency chain that async dispatch cannot fake
    def sample_steady(k=3):
        out = []
        for _ in range(k):
            t0 = time.time()
            np.asarray(chained_jit(padded))
            out.append((time.time() - t0) / reps)
        return out

    steady_samples = sample_steady()
    pairs = n * (n - 1) // 2

    # anchor-extend device throughput (north-star metric): the Pallas
    # diagonal-mismatch kernel over the index text — the TPU
    # replacement for the reference's scalar extension loops
    # (src/esa.cxx:457-469, src/process.cxx:171-184)
    anchor_extend_gbp_s = (
        measure_anchor_extend(genomes[0], length) if use_pallas else 0.0
    )

    cross512_tbp_s = 0.0
    if use_pallas:
        try:
            cross512_tbp_s = measure_cross_512(length)
        except Exception:
            pass  # best-effort secondary metric


    # host oracle baseline: the reference-style byte loop on a sample of
    # column range, extrapolated (numpy-vectorized stand-in for seqcmp)
    from phylonium_tpu.ops.match_table import MATCH_TABLE

    sample_pairs = min(8, pairs)
    sample_cols = min(length, 2_000_000)
    t0 = time.time()
    done = 0
    for i in range(n):
        for j in range(i + 1, n):
            if done >= sample_pairs:
                break
            a = states[i, :sample_cols]
            b = states[j, :sample_cols]
            int(MATCH_TABLE[a, b].sum())
            int(np.count_nonzero((a != 10) & (b != 10)))
            done += 1
        if done >= sample_pairs:
            break
    t_host_sample = time.time() - t0
    host_pairs_per_s = done / (t_host_sample * (length / sample_cols))

    # optional end-to-end comparison vs the reference binary on the
    # same panel (same machine, same files, byte-compared matrices);
    # a second, larger panel shows the O(N^2) comparison-phase scaling
    e2e = {}
    if os.environ.get("PHYLONIUM_TPU_BENCH_E2E", "1") != "0":
        # host CPU and tunnel swing ~10x between runs on this
        # environment; min-of-3 sheds degraded phases
        runs = [end_to_end_vs_reference(genomes) for _ in range(3)]
        runs = [r for r in runs if r]
        if runs:
            e2e = min(runs, key=lambda r: r["e2e_tpu_s"])
            e2e["e2e_ref_s"] = min(r["e2e_ref_s"] for r in runs)
            e2e["e2e_speedup"] = round(
                e2e["e2e_ref_s"] / e2e["e2e_tpu_s"], 3
            )
            e2e["e2e_identical"] = all(r["e2e_identical"] for r in runs)
            # run 1 is the deployed cold start (local compile cache may
            # be empty; the adaptive backend keeps it fast regardless)
            e2e["e2e_tpu_runs"] = [r["e2e_tpu_s"] for r in runs]
        # 4x panel: the reference's comparison phase is O(N^2 * L) on
        # host; this is where the device path's scaling shows
        large_n = 4 * n
        prewarm_shape(large_n, length)  # subprocess then hits the cache
        large = end_to_end_vs_reference(
            simulate_panel(large_n, length, seed=61), timeout_s=560
        )
        e2e.update(
            {k.replace("e2e", f"e2e_n{large_n}"): v for k, v in large.items()}
        )

    # second steady-state burst, minutes after the first (see above)
    steady_samples += sample_steady()
    t_compare = min(steady_samples)
    pairs_per_s = pairs / t_compare
    vs_baseline = (
        pairs_per_s / host_pairs_per_s if host_pairs_per_s else 0.0
    )

    gbp = pairs * length / 1e9
    map_gbp_per_s = n * length / t_map / 1e9  # anchor-extend throughput
    detail = {
        "n_genomes": n,
        "genome_length": length,
        "t_simulate": round(t_sim, 3),
        "t_index": round(t_index, 3),
        "t_map": round(t_map, 3),
        "map_gbp_per_s": round(map_gbp_per_s, 3),
        "t_pileup": round(t_pileup, 3),
        "t_backend_init": round(t_backend_init, 3),
        "t_transfer": round(t_transfer, 4),
        "t_compare_first_incl_conv": round(t_compare_first, 4),
        "compare_dispatch": compare_dispatch,
        "t_compare_device": round(t_compare, 4),
        "kernel": "pallas" if use_pallas else "xla",
        "compare_gbp_per_s": round(gbp / t_compare, 2),
        "cross512_tbp_s": round(cross512_tbp_s, 2),
        "anchor_extend_gbp_s": round(anchor_extend_gbp_s, 2),
        "host_oracle_pairs_per_s": round(host_pairs_per_s, 3),
        "platform": jax.devices()[0].platform,
        "mean_offdiag_coverage": round(
            float(homs[np.triu_indices(n, 1)].mean()) / length, 4
        ),
        **e2e,
    }
    print(
        json.dumps(
            {
                "metric": "eco29_sim_compare_pairs_per_s",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
