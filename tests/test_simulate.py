"""Simulator tests: the pipeline must recover simulated distances."""

import math
import subprocess
import sys

import numpy as np

from phylonium_tpu.config import RunConfig
from phylonium_tpu.core.pipeline import process
from phylonium_tpu.data.sequence import Sequence
from phylonium_tpu.utils.simulate import simulate


def test_simulated_distance_recovery():
    distances = [0.05, 0.15]
    seqs = simulate(distances, length=60_000, seed=3)
    queries = [Sequence(f"S{k}", s) for k, s in enumerate(seqs)]
    cfg = RunConfig(progress="never")
    counts = process(queries[0], queries, cfg)
    jc = counts.estimate_jc()
    for k, d in enumerate(distances):
        got = jc[0, k + 1]
        assert abs(got - d) / d < 0.08, (d, got)


def test_simulate_cli(tmp_path):
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "phylonium_tpu.utils.simulate",
            "-s", "5", "-l", "500", "-d", "0.1", "-d", "0.2",
            "-p", str(tmp_path / "x"),
        ],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    for k in range(3):
        text = (tmp_path / f"x{k}.fasta").read_text()
        assert text.startswith(f">S{k}\n")
        body = "".join(text.split("\n")[1:])
        assert len(body) == 500
        assert set(body) <= set("ACGT")


def test_simulate_stdout_and_raw():
    r = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu.utils.simulate",
         "-s", "1", "-l", "140", "-r", "-d", "0.0"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    records = r.stdout.split(">")[1:]
    assert len(records) == 2
    # raw d=0: the mutant equals the base
    seq = lambda rec: "".join(rec.split("\n")[1:])  # noqa: E731
    assert seq(records[0]) == seq(records[1])
