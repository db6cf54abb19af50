"""Real-hardware golden parity: the Pallas CLI path vs the reference
binary, byte-for-byte.

The regular parity suites pin subprocesses to the CPU backend for
speed; this one forces the actual TPU Pallas kernel through the full
CLI.  Opt-in (slow on a tunnelled chip):

    PHYLONIUM_TPU_TEST_REAL=1 python -m pytest tests/test_real_tpu_parity.py
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_oracle_parity import (
    ORACLE_BIN,
    oracle,  # noqa: F401  (fixture)
    write_fasta,
)

REPO = os.path.dirname(os.path.dirname(__file__))

pytestmark = pytest.mark.skipif(
    not os.environ.get("PHYLONIUM_TPU_TEST_REAL"),
    reason="real-TPU parity is opt-in: set PHYLONIUM_TPU_TEST_REAL=1",
)


def _tpu_available() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.mark.parametrize("flags", [[], ["-2", "--complete-deletion"]])
def test_pallas_cli_matches_reference(oracle, tmp_path, rng, flags):  # noqa: F811
    if not _tpu_available():
        pytest.skip("no TPU device")

    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(acgt, 200_000)
    files = []
    for k, p in enumerate([0.0, 0.01, 0.03, 0.05, 0.08, 0.12]):
        arr = base.copy()
        idx = np.flatnonzero(rng.random(arr.size) < p)
        arr[idx] = acgt[(rng.integers(1, 4, idx.size) + arr[idx]) % 4]
        path = tmp_path / f"T{k}.fasta"
        write_fasta(path, [(f"T{k}", arr.tobytes())])
        files.append(f"T{k}.fasta")

    ref = subprocess.run(
        [ORACLE_BIN, *flags, *files],
        capture_output=True,
        text=True,
        cwd=tmp_path,
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PHYLONIUM_TPU_PLATFORM", None)  # let the TPU win
    ours = subprocess.run(
        [
            sys.executable,
            "-m",
            "phylonium_tpu",
            "--count-backend",
            "pallas",
            *flags,
            *files,
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        env=env,
        timeout=560,
    )
    assert ours.returncode == ref.returncode == 0, ours.stderr[-1000:]
    assert ours.stdout == ref.stdout
