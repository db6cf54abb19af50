"""True multi-process sharded counting via jax.distributed.

Two OS processes, each with 4 virtual CPU devices, form a (2, 4) global
mesh ('rows' spans the process/DCN axis).  Both must compute the same
bit-exact counts as the single-process path — the multi-host simulation
tier from SURVEY.md §4.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(__file__))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == 2

    import numpy as np
    from phylonium_tpu.parallel.mesh import make_mesh
    from phylonium_tpu.parallel.distributed import pair_counts_sharded
    from phylonium_tpu.ops.match_table import pair_counts_numpy

    rng = np.random.default_rng(0)
    states = rng.integers(0, 11, size=(6, 4096)).astype(np.uint8)
    mesh = make_mesh((2, 4))
    s, h = pair_counts_sharded(states, mesh, block=256)
    s0, h0 = pair_counts_numpy(states)
    assert np.array_equal(s, s0), "subs mismatch"
    assert np.array_equal(h, h0), "homs mismatch"
    print(f"proc {pid}: ok")
    """
)


def test_two_process_mesh(tmp_path):
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]
    coordinator = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert ": ok" in out
