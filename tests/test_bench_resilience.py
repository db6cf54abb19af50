"""bench.py must print its one JSON line even when every fragile device
microbenchmark dies (round 2's official record was erased by a single
transient 'ABORTED: TPU backend error' in an unguarded microbench)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_survives_injected_micro_aborts():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["PHYLONIUM_TPU_PLATFORM"] = "cpu"
    env["PHYLONIUM_TPU_BENCH_E2E"] = "0"
    env["PHYLONIUM_TPU_BENCH_INJECT"] = "steady,anchor_extend,cross512"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "6", "8192"],
        capture_output=True, timeout=300, env=env, text=True,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [
        ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, r.stdout
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "eco29_sim_compare_pairs_per_s"
    assert parsed["unit"] == "pairs/s"
    # primary metric survives via the production-dispatch fallback
    assert parsed["value"] > 0
    detail = parsed["detail"]
    assert "steady" in detail["micro_failures"]
    assert detail["value_source"].startswith("t_compare_first")
    # the pipeline phases themselves ran
    assert detail["t_map"] > 0
    # a failed flagship measurement must be visible at the TOP level —
    # a clean-looking JSON must not hide it (VERDICT r4)
    assert parsed["degraded"] is True
    assert any(r.startswith("steady") for r in parsed["degraded_reasons"])
    # decorations do not degrade the run on their own
    assert not any(
        r.startswith(("anchor_extend", "cross512"))
        for r in parsed["degraded_reasons"]
    )


def test_bench_survives_wedged_tunnel_probe():
    """A tunnel that HANGS (the platform probe never answers — observed
    live: jax.devices() blocked >1 h without raising) must degrade the
    run to cpu-pinned host mode, not hang the bench: every later stage
    is pinned off the tunnel and the JSON line still prints with a real
    host-path metric."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("PHYLONIUM_TPU_PLATFORM", None)
    env["PHYLONIUM_TPU_BENCH_E2E"] = "0"
    env["PHYLONIUM_TPU_BENCH_INJECT"] = "probe"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "6", "8192"],
        capture_output=True, timeout=300, env=env, text=True,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [
        ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, r.stdout
    parsed = json.loads(lines[-1])
    assert parsed["value"] > 0
    detail = parsed["detail"]
    assert detail["platform"] == "cpu"
    assert "backend_init" in detail["micro_failures"]
    assert "probe" in detail["micro_failures"]["backend_init"]
    # the pipeline itself completed on the host path
    assert detail["t_map"] > 0


def test_bench_budget_zero_still_prints_json():
    """With an exhausted budget the optional stages are skipped (the
    primary steady metric still gets a floored attempt), and the
    one-JSON-line contract holds."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["PHYLONIUM_TPU_PLATFORM"] = "cpu"
    env["PHYLONIUM_TPU_BENCH_E2E"] = "0"
    env["PHYLONIUM_TPU_BENCH_BUDGET"] = "0"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "6", "8192"],
        capture_output=True, timeout=300, env=env, text=True,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [
        ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
    ]
    parsed = json.loads(lines[-1])
    assert parsed["value"] > 0
    skips = parsed["detail"]["micro_failures"]
    assert skips.get("anchor_extend", "").startswith("skipped")
    assert skips.get("cross512", "").startswith("skipped")


def test_bench_lowmem_tier_subset_parity(monkeypatch):
    """The n=1000 tier's subset-parity rule at toy scale: with the
    reference genome pinned (-r both sides), the oracle run on a genome
    SUBSET must match our full-panel matrix cell-for-cell on the shared
    pairs (pair distances depend only on the two genomes + reference,
    src/process.cxx:524-549)."""
    sys.path.insert(0, REPO)
    monkeypatch.setenv("PHYLONIUM_TPU_PLATFORM", "cpu")
    import bench

    r = bench.e2e_lowmem_tier(
        n=24, length=9000, seed=5, timeout_s=240, oracle_k=5
    )
    assert r, "tier returned nothing (oracle missing?)"
    assert r["e2e_n24_subset_identical"] is True
    assert r["e2e_n24_rss_mb"] and r["e2e_n24_rss_mb"] > 0
    assert r["e2e_n24_tpu_s"] > 0
