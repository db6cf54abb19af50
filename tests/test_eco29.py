"""The eco29 golden dataset (BASELINE.md): 29 public E. coli/Shigella
genomes whose phylonium results are published in the reference manual
(/root/reference/documentation/manual.tex:122-191).

The genomes are NOT redistributable fixtures of this repo (29 x ~5 Mbp
GenBank sequences) and this environment has no network egress, so the
test skips VISIBLY unless the data is provided.  To run it:

    # fetch per the reference manual's recipe (manual.tex:122-126):
    #   one FASTA per accession listed in
    #   /root/reference/documentation/eco29.names, named <ACC>.fasta
    export PHYLONIUM_TPU_ECO29_DIR=/path/to/eco29
    python -m pytest tests/test_eco29.py -v

Asserted published values:
- JC distance BA000007 <-> FM180568 = 2.4833e-02 (manual.tex:131-135)
- 1st-pass reference AP009240 (median length, manual.tex:167-168)
- 2-pass central reference CP000948 (manual.tex:188-191)
- average pairwise coverage 0.738057 (manual.tex:172)
- aligned/total nucleotides 110170145/137065486 (manual.tex:173)
- byte-identical stdout vs the reference binary built in tests/oracle
"""

import contextlib
import io
import os
import re
import sys

import pytest

ECO29_DIR = os.environ.get("PHYLONIUM_TPU_ECO29_DIR") or os.path.join(
    os.path.dirname(__file__), "data", "eco29"
)
NAMES = "/root/reference/documentation/eco29.names"


def _eco29_files():
    if not os.path.isdir(ECO29_DIR) or not os.path.exists(NAMES):
        return None
    with open(NAMES) as f:
        accessions = [line.split(",")[0].strip() for line in f if line.strip()]
    files = []
    for acc in accessions:
        for ext in (".fasta", ".fa", ".fas"):
            path = os.path.join(ECO29_DIR, acc + ext)
            if os.path.exists(path):
                files.append(path)
                break
        else:
            return None
    return files


files = _eco29_files()
pytestmark = pytest.mark.skipif(
    files is None,
    reason=(
        "eco29 dataset not available: no network egress in this "
        "environment and 29 x 5 Mbp GenBank genomes are not committed "
        "as fixtures; set PHYLONIUM_TPU_ECO29_DIR (see module docstring)"
    ),
)


def _run(args):
    from phylonium_tpu.cli import main

    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = main(args)
    return rc, out.getvalue(), err.getvalue()


def _cell(stdout, name_a, name_b):
    lines = stdout.strip().splitlines()
    names = [ln.split()[0] for ln in lines[1:]]
    row = lines[1 + names.index(name_a)].split()[1:]
    return row[names.index(name_b)]


def test_eco29_first_pass():
    rc, out, err = _run(["-v", *files])
    assert rc == 0
    assert "ref: AP009240" in err  # manual.tex:167-168
    assert _cell(out, "BA000007", "FM180568") == "2.4833e-02"
    m = re.search(r"avg coverage:\t([0-9.]+)", err)
    assert m and m.group(1) == "0.738057"  # manual.tex:172
    m = re.search(r"alignment:\t(\d+)\t(\d+)", err)
    assert m and m.groups() == ("110170145", "137065486")


def test_eco29_two_pass():
    rc, out, err = _run(["-2", "-v", *files])
    assert rc == 0
    assert "ref: CP000948" in err  # manual.tex:188-191


def test_eco29_oracle_byte_parity(tmp_path):
    import subprocess

    from tests.test_oracle_parity import ORACLE_BIN, ORACLE_DIR

    if not os.path.exists(ORACLE_BIN):
        r = subprocess.run(
            ["sh", os.path.join(ORACLE_DIR, "build_oracle.sh")],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-300:]}")
    ref = subprocess.run(
        [ORACLE_BIN, *files], capture_output=True, text=True
    )
    rc, out, _ = _run(list(files))
    assert rc == ref.returncode == 0
    assert out == ref.stdout
