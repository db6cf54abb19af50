"""Regenerate the committed golden fixtures from the reference binary.

Runs the reference oracle (tests/oracle/bin/phylonium, built from
/root/reference) on the deterministic splitmix64 golden panel
(tests/golden_panel.py) for every flag combo in GOLDEN_CASES and writes
its stdout bytes — plus the '-p' refpos file — under
``tests/data/golden/``.  These fixtures are COMMITTED: the golden tier
(tests/test_golden_fixtures.py) asserts our CLI reproduces them with no
oracle binary, compiler, or network present.

Usage:  python tools/regen_golden.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

from golden_panel import GOLDEN_CASES, RD_SEED, write_panel  # noqa: E402

ORACLE = os.path.join(REPO, "tests", "oracle", "bin", "phylonium")
OUT_DIR = os.path.join(REPO, "tests", "data", "golden")


def main() -> int:
    if not os.path.exists(ORACLE):
        r = subprocess.run(
            ["sh", os.path.join(REPO, "tests", "oracle", "build_oracle.sh")],
            capture_output=True,
        )
        if r.returncode or not os.path.exists(ORACLE):
            sys.stderr.write(
                f"oracle build failed:\n{r.stderr.decode()[-2000:]}\n"
            )
            return 1
    os.makedirs(OUT_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="golden_panel_")
    files = write_panel(tmp)
    for name, argv in GOLDEN_CASES.items():
        refpos = os.path.join(tmp, f"refpos_{name}.txt")
        args = [refpos if a == "REFPOS_FILE" else a for a in argv]
        env = dict(os.environ)
        if "-b" in args:
            env["PHYLONIUM_ORACLE_RD_SEED"] = str(RD_SEED)
        r = subprocess.run(
            [ORACLE, *args, *files],
            capture_output=True,
            cwd=tmp,
            env=env,
            timeout=600,
        )
        if r.returncode:
            sys.stderr.write(
                f"case {name!r} rc={r.returncode}:\n"
                f"{r.stderr.decode()[-1000:]}\n"
            )
            return 1
        with open(os.path.join(OUT_DIR, f"{name}.stdout"), "wb") as f:
            f.write(r.stdout)
        if "REFPOS_FILE" in argv:
            with open(refpos, "rb") as src, open(
                os.path.join(OUT_DIR, f"{name}.refpos"), "wb"
            ) as dst:
                dst.write(src.read())
        print(f"{name}: {len(r.stdout)} stdout bytes")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(f"fixtures written to {OUT_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
