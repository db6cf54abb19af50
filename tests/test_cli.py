"""End-to-end CLI tests (the reference's test/simple.sh tier)."""

import io
import math
import sys

import numpy as np
import pytest

from phylonium_tpu.cli import cleanup_names, main, parse_args
from phylonium_tpu.io.fasta import FastaError, extract_genome, parse_fasta_bytes
from tests.conftest import mutate, random_genome


def write_fasta(path, name, seq, width=70):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), width):
            f.write(seq[i : i + width].decode("ascii") + "\n")


@pytest.fixture
def pair_dir(tmp_path):
    rng = np.random.default_rng(42)
    ref = random_genome(rng, 20_000)
    q = mutate(ref, 0.0693, rng)  # ~ JC distance 0.0726
    write_fasta(tmp_path / "S0.fasta", "S0", ref)
    write_fasta(tmp_path / "S1.fasta", "S1", q)
    return tmp_path


def run_cli(args, capsys):
    code = main(args)
    out = capsys.readouterr().out
    return code, out


def parse_phylip(text):
    lines = text.strip().splitlines()
    n = int(lines[0])
    names, mat = [], []
    for line in lines[1 : n + 1]:
        parts = line.split()
        names.append(parts[0])
        mat.append([float(x) for x in parts[1:]])
    return names, np.array(mat)


def test_simple_pair(pair_dir, capsys):
    code, out = run_cli(
        [str(pair_dir / "S0.fasta"), str(pair_dir / "S1.fasta")], capsys
    )
    assert code == 0
    names, mat = parse_phylip(out)
    assert names == ["S0", "S1"]
    assert mat[0, 0] == 0.0 and mat[1, 1] == 0.0
    assert mat[0, 1] == mat[1, 0]
    # recover the simulated distance (0.0693 raw before JC correction)
    raw = 0.0693
    jc = -0.75 * math.log(1 - 4 / 3 * raw)
    assert abs(mat[0, 1] - jc) / jc < 0.05


def test_distance_raw_and_ani(pair_dir, capsys):
    code, out = run_cli(
        ["--distance", "raw", str(pair_dir / "S0.fasta"),
         str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    _, raw_mat = parse_phylip(out)

    code, out = run_cli(
        ["--distance=ani", str(pair_dir / "S0.fasta"),
         str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    _, ani_mat = parse_phylip(out)
    # both sides printed at 4 significant digits
    assert abs(ani_mat[0, 1] - (1 - raw_mat[0, 1]) * 100) < 5e-3


def test_bootstrap_prints_extra_matrices(pair_dir, capsys):
    code, out = run_cli(
        ["-b", "3", str(pair_dir / "S0.fasta"), str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    # -b 3 stores 2 extra matrices (src/phylonium.cxx:179)
    assert out.count("\n2\n") + out.startswith("2\n") == 3


def test_two_pass(pair_dir, capsys):
    code, out = run_cli(
        ["-2", str(pair_dir / "S0.fasta"), str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    names, mat = parse_phylip(out)
    assert mat[0, 1] > 0


def test_reference_flag(pair_dir, capsys):
    code, out = run_cli(
        ["-r", str(pair_dir / "S1.fasta"), str(pair_dir / "S0.fasta"),
         str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0


def test_refpos_output(pair_dir, tmp_path, capsys):
    refpos = tmp_path / "positions.txt"
    code, out = run_cli(
        ["-p", str(refpos), str(pair_dir / "S0.fasta"),
         str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    text = refpos.read_text()
    assert text.startswith(">part1\t")
    # refuses to overwrite
    code = main(
        ["-p", str(refpos), str(pair_dir / "S0.fasta"),
         str(pair_dir / "S1.fasta")]
    )
    assert code == 1


def test_bad_bootstrap_is_soft_error(pair_dir, capsys):
    code, out = run_cli(
        ["-b", "0", str(pair_dir / "S0.fasta"), str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 1  # soft error still produces output but fails
    names, _ = parse_phylip(out)
    assert names == ["S0", "S1"]


def test_cleanup_names():
    assert cleanup_names("b", ["c", "a", "b"]) == ["a", "b", "c"]
    assert cleanup_names("d", ["c", "a"]) == ["a", "c", "d"]


def test_extract_genome():
    assert extract_genome("path/file.fasta") == "file"
    assert extract_genome("file.fa") == "file"
    assert extract_genome("a/b/c.fas") == "c"
    assert extract_genome("file.txt") == "file.txt"
    assert extract_genome("noext") == "noext"


def test_fasta_parser_errors():
    with pytest.raises(FastaError, match="empty"):
        parse_fasta_bytes(b"")
    with pytest.raises(FastaError, match="start with"):
        parse_fasta_bytes(b"ACGT\n")
    with pytest.raises(FastaError, match="Empty sequence"):
        parse_fasta_bytes(b">name\n")
    with pytest.raises(FastaError, match="Empty name"):
        parse_fasta_bytes(b"> \nACGT\n")
    recs = parse_fasta_bytes(b">a comment here\nAC\nGT\n>b\nTTTT\n")
    assert recs[0].name == "a"
    assert recs[0].comment == "comment here"
    assert recs[0].sequence == b"ACGT"
    assert recs[1].sequence == b"TTTT"


def test_multi_contig_draft_assembly(tmp_path, capsys):
    rng = np.random.default_rng(5)
    ref = random_genome(rng, 12_000)
    q = mutate(ref, 0.02, rng)
    write_fasta(tmp_path / "ref.fasta", "ref", ref)
    # query split into 4 contigs in one file
    with open(tmp_path / "draft.fasta", "w") as f:
        for k in range(4):
            f.write(f">contig{k}\n")
            f.write(q[k * 3000 : (k + 1) * 3000].decode("ascii") + "\n")
    code, out = run_cli(
        [str(tmp_path / "ref.fasta"), str(tmp_path / "draft.fasta")], capsys
    )
    assert code == 0
    names, mat = parse_phylip(out)
    assert set(names) == {"ref", "draft"}
    assert 0.01 < mat[0, 1] < 0.04


def test_short_flag_bundling(pair_dir, capsys):
    # -2v == -2 -v ; -b3 == -b 3
    code, out = run_cli(
        ["-b3", str(pair_dir / "S0.fasta"), str(pair_dir / "S1.fasta")],
        capsys,
    )
    assert code == 0
    assert out.count("2\nS0") == 3

    from phylonium_tpu.cli import _expand_bundles

    assert _expand_bundles(["-2v"]) == ["-2", "-v"]
    assert _expand_bundles(["-vvt", "4"]) == ["-v", "-v", "-t", "4"]
    assert _expand_bundles(["-rfile.fa"]) == ["-r", "file.fa"]
    assert _expand_bundles(["--", "-2v"]) == ["--", "-2v"]


def test_profile_flag_writes_trace(tmp_path, pair_dir):
    """--profile DIR produces a jax profiler trace directory."""
    import os

    from phylonium_tpu.cli import main

    files = sorted(str(f) for f in pair_dir.glob("*.fasta"))
    prof = tmp_path / "trace"
    rc = main(
        ["--progress=never", f"--profile={prof}", *files]
    )
    assert rc == 0
    found = []
    for root, _dirs, names in os.walk(prof):
        found += [n for n in names if n.endswith((".xplane.pb", ".json.gz"))]
    assert found, "no profiler artifacts written"


def test_malformed_auto_device_gbp_env(monkeypatch, capsys):
    """A garbled PHYLONIUM_TPU_AUTO_DEVICE_GBP warns and keeps the
    default instead of crashing RunConfig construction."""
    from phylonium_tpu.config import RunConfig

    monkeypatch.setenv("PHYLONIUM_TPU_AUTO_DEVICE_GBP", "lots")
    cfg = RunConfig()
    assert cfg.auto_device_min_gbp == 128.0
    assert "PHYLONIUM_TPU_AUTO_DEVICE_GBP" in capsys.readouterr().err
    monkeypatch.setenv("PHYLONIUM_TPU_AUTO_DEVICE_GBP", "2.5")
    assert RunConfig().auto_device_min_gbp == 2.5


def test_config_error_is_clean_exit(tmp_path, capsys):
    """Pipeline ConfigErrors (backend mismatch) exit 1 with a one-line
    message, no traceback."""
    from phylonium_tpu.cli import main

    for k in range(2):
        p = tmp_path / f"G{k}.fasta"
        p.write_text(f">G{k}\n" + "ACGTACGTAA" * 30 + "\n")
    rc = main(
        [
            "--progress=never",
            "--esa-backend=numpy",
            "--map-backend=native",
            str(tmp_path / "G0.fasta"),
            str(tmp_path / "G1.fasta"),
        ]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "phylonium-tpu: " in err and "native" in err


def test_numeric_flags_strtoul_semantics(tmp_path, capsys):
    """-b/-t parse like strtoul(s, &end, 10) (src/phylonium.cxx:166-199):
    trailing junk and ERANGE reject, '+N' accepts, -t beyond num_procs
    warns with the reference's exact (typo included) wording."""
    from phylonium_tpu.cli import parse_args

    def parse(*args):
        cfg, files = parse_args(["x.fa", "y.fa", *args])
        return cfg

    assert parse("-b", "+3").bootstrap == 2
    assert parse("-b", " 3").bootstrap == 2  # leading ws ok
    for bad in ("3 ", "0x3", "", "abc", "0",
                "99999999999999999999999"):  # trailing junk/ERANGE/zero
        cfg = parse("-b", bad)
        assert cfg.bootstrap == 0, bad
        assert cfg.return_code == 1  # soft error
    capsys.readouterr()

    cfg = parse("-t", "9999")
    assert cfg.threads == 0
    err = capsys.readouterr().err
    assert "greater then the number of available processors" in err
    assert "Ignoring -t 9999 argument" in err

    cfg = parse("-t", "-2")  # wraps mod 2^64 like strtoul
    err = capsys.readouterr().err
    assert "Ignoring -t 18446744073709551614 argument" in err
    assert cfg.threads == 0


def test_unknown_flags_print_getopt_diagnostics(tmp_path, capsys):
    from phylonium_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--bogus", "x.fa", "y.fa"])
    assert e.value.code == 1
    assert "unrecognized option '--bogus'" in capsys.readouterr().err

    with pytest.raises(SystemExit) as e:
        main(["-x", "x.fa", "y.fa"])
    assert e.value.code == 1
    assert "invalid option -- 'x'" in capsys.readouterr().err


def test_refpos_unopenable_path_is_silent(tmp_path, capsys, rng):
    """-p '' / -p <missing-dir>/f: the reference's ofstream fails
    silently (failbit) and the run completes rc 0 — no crash, no file
    (src/process.cxx:479)."""
    from phylonium_tpu.cli import main

    acgt = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(acgt, 5_000)
    files = []
    for k in range(2):
        arr = base.copy()
        arr[rng.random(arr.size) < 0.02] = ord("A")
        f = tmp_path / f"s{k}.fasta"
        f.write_text(f">s{k}\n" + arr.tobytes().decode() + "\n")
        files.append(str(f))
    for path in ("", str(tmp_path / "no-such-dir" / "x.pos")):
        rc = main(["--progress=never", "-p", path, *files])
        out = capsys.readouterr().out
        assert rc == 0, path
        assert out.splitlines()[0] == "2"
    assert not (tmp_path / "no-such-dir").exists()


def test_ambiguous_long_prefix_diagnostic(capsys):
    """A long-option prefix matching several of OUR options gets
    getopt_long's 'is ambiguous; possibilities:' diagnostic (the extra
    backend options can make a reference-unique prefix ambiguous here —
    inherent to extending the surface)."""
    from phylonium_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--c", "x.fa", "y.fa"])
    assert e.value.code == 1
    err = capsys.readouterr().err
    assert "option '--c' is ambiguous; possibilities:" in err
    assert "'--complete-deletion'" in err
