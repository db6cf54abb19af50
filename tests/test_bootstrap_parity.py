"""Parity of `-b` bootstrap matrices vs the reference: byte-exact under
a shared deterministic seed, distributional in production mode.

Production runs are never byte-reproducible: the reference seeds its
PRNG from ``std::random_device`` (src/evo_model.cxx:136-147,
src/phylonium.cxx:91).  But the whole stack below the entropy source is
fully specified, so the oracle build interposes a splitmix32 word
stream over ``std::random_device::_M_getval`` (tests/oracle/shim.cpp,
env ``PHYLONIUM_ORACLE_RD_SEED``) and our CLI replays the identical
stream through model/glibcxx_prng.py (env ``PHYLONIUM_TPU_RD_SEED``) —
seeded `-b` output is then byte-identical, draw for draw
(test_bootstrap_seeded_byte_parity).

For the default unseeded path, each bootstrapped cell is
Binomial(homologs, substitutions/homologs) rescaled through the JC map,
so the replicate *distributions* must agree.  This test collects one
large batch of replicates from each binary on the same panel and
compares per-pair replicate means and standard deviations.

Tolerances (see inline): means within 6 combined standard errors, sd
ratio within [0.7, 1.4] — at B=199 replicates the sd ratio's 99.9%
two-sided band under equality is roughly [0.85, 1.18], so the bounds are
loose enough to keep the test deterministic-in-practice while still
failing for any real parameterization bug (e.g. resampling homologs,
off-by-one in B, or a wrong rate).
"""

import numpy as np
import pytest

from tests.test_oracle_parity import (
    make_panel,
    oracle,  # noqa: F401  (fixture)
    run_oracle,
    run_ours,
)

B = 200  # -b argument; prints B-1 replicate matrices


def parse_matrices(stdout: str) -> list[np.ndarray]:
    """Parse concatenated PHYLIP matrices into float arrays."""
    lines = stdout.strip().splitlines()
    out = []
    i = 0
    while i < len(lines):
        n = int(lines[i])
        rows = []
        for j in range(n):
            rows.append([float(x) for x in lines[i + 1 + j].split()[1:]])
        out.append(np.array(rows))
        i += 1 + n
    return out


@pytest.mark.parametrize("seed", ["0", "42", "4294967295"])
@pytest.mark.parametrize(
    "extra", [[], ["--distance=raw"], ["--distance=ani"], ["-2"]]
)
def test_bootstrap_seeded_byte_parity(oracle, tmp_path, rng, seed, extra):  # noqa: F811
    import os
    import subprocess
    import sys

    from tests.test_oracle_parity import ORACLE_BIN, REPO

    files = make_panel(tmp_path, rng, n=4, length=12_000)
    args = ["-b", "6", *extra, *files]
    env_o = dict(os.environ, PHYLONIUM_ORACLE_RD_SEED=seed)
    r_o = subprocess.run(
        [ORACLE_BIN, *args], capture_output=True, text=True,
        cwd=str(tmp_path), env=env_o,
    )
    env_t = dict(
        os.environ,
        PHYLONIUM_TPU_RD_SEED=seed,
        PHYLONIUM_TPU_PLATFORM="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    r_t = subprocess.run(
        [sys.executable, "-m", "phylonium_tpu", *args],
        capture_output=True, text=True, cwd=str(tmp_path), env=env_t,
    )
    assert r_t.stdout == r_o.stdout, r_t.stderr[-2000:]
    assert r_t.returncode == r_o.returncode


def test_bootstrap_distribution(oracle, tmp_path, rng):  # noqa: F811
    files = make_panel(tmp_path, rng, n=3, length=20_000)
    args = ["-b", str(B), *files]

    rc_o, out_o, _ = run_oracle(args, str(tmp_path))
    rc_t, out_t, err_t = run_ours(args, str(tmp_path))
    assert rc_o == 0 and rc_t == 0, err_t[-500:]

    mats_o = parse_matrices(out_o)
    mats_t = parse_matrices(out_t)
    assert len(mats_o) == len(mats_t) == B  # point estimate + B-1 replicates

    # the non-bootstrap matrix must match exactly
    np.testing.assert_array_equal(mats_o[0], mats_t[0])

    reps_o = np.stack(mats_o[1:])  # [B-1, n, n]
    reps_t = np.stack(mats_t[1:])
    n = reps_o.shape[1]
    for i in range(n):
        for j in range(i + 1, n):
            ro, rt = reps_o[:, i, j], reps_t[:, i, j]
            mo, mt = ro.mean(), rt.mean()
            so, st = ro.std(ddof=1), rt.std(ddof=1)
            se = np.hypot(so, st) / np.sqrt(len(ro))
            assert abs(mo - mt) < 6 * se, (i, j, mo, mt, se)
            assert 0.7 < so / st < 1.4, (i, j, so, st)
            # replicates scatter around the point estimate
            assert abs(mo - mats_o[0][i, j]) < 6 * so / np.sqrt(len(ro))
            assert abs(mt - mats_t[0][i, j]) < 6 * st / np.sqrt(len(rt))
