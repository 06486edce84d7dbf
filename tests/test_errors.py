"""Structured user-error layer: misuse must produce the reference's
three-part where/why/help message (exceptions/error.hpp:20-80 +
logging/error_handler.cpp log_error) with a clean exit code — never a raw
Python traceback."""

import gzip

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.cli import main
from octopus_tpu.errors import (CallingBug, UserError, format_error)
from octopus_tpu.io.bam_writer import BamWriter, build_bai


@pytest.fixture
def genome(tmp_path):
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    reads = []
    for i in range(80):
        begin = int(rng.integers(0, len(seq) - 100))
        reads.append((begin, "100M", seq[begin:begin + 100], [37] * 100, 60, 0))
    bam = tmp_path / "s.bam"
    with BamWriter(str(bam), ["chr1"], [len(seq)], samples=["S1"]) as w:
        w.write_batch(make_read_batch("chr1", reads).sorted_by_begin(),
                      sample="S1")
    build_bai(str(bam))
    return fa, bam


def run_cli(capsys, argv):
    rc = main(argv)
    err = capsys.readouterr().err
    assert "Traceback" not in err, err
    return rc, err


def assert_user_error(rc, err, *needles):
    assert rc == 2
    assert "A user error has occurred:" in err
    assert "To help resolve this error" in err
    for n in needles:
        assert n in err, (n, err)


def test_no_inputs(capsys):
    rc, err = run_cli(capsys, [])
    assert_user_error(rc, err, "--help")


def test_missing_reference(capsys, genome, tmp_path):
    _, bam = genome
    rc, err = run_cli(capsys, ["-R", str(tmp_path / "nope.fa"),
                               "-I", str(bam), "-o", str(tmp_path / "o.vcf")])
    assert_user_error(rc, err, "nope.fa", "does not exist")


def test_gzipped_reference(capsys, genome, tmp_path):
    fa, bam = genome
    gz = tmp_path / "ref.fa.gz"
    with open(fa, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    rc, err = run_cli(capsys, ["-R", str(gz), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf")])
    assert_user_error(rc, err, "gzip", "decompress")


def test_missing_read_file(capsys, genome, tmp_path):
    fa, _ = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(tmp_path / "no.bam"),
                               "-o", str(tmp_path / "o.vcf")])
    assert_user_error(rc, err, "no.bam", "does not exist")


def test_bad_region_syntax(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "-T", "chr1:abc-def"])
    assert_user_error(rc, err, "chr1:abc-def", "integers")


def test_unknown_contig(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"), "-T", "chrX"])
    assert_user_error(rc, err, "chrX", "chr1")


def test_region_begin_after_end(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "-T", "chr1:500-100"])
    assert_user_error(rc, err, "begin is greater")


def test_missing_regions_file(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "-t", str(tmp_path / "regions.txt")])
    assert_user_error(rc, err, "regions.txt")


def test_unknown_sample(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "-S", "NOSUCH"])
    assert_user_error(rc, err, "NOSUCH", "S1")


def test_regenotype_rejected(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "--regenotype", "x.vcf"])
    assert_user_error(rc, err, "--regenotype", "--source-candidates")


def test_sample_dropout_concentrations_rejected(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "--sample-dropout-concentrations", "S1=2.0"])
    assert_user_error(rc, err, "--sample-dropout-concentrations",
                      "--dropout-concentration")


def test_missing_forest_model(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "--forest-model", str(tmp_path / "g.forest")])
    assert_user_error(rc, err, "g.forest", "does not exist")


def test_malformed_pedigree(capsys, genome, tmp_path):
    fa, bam = genome
    ped = tmp_path / "fam.ped"
    ped.write_text("FAM1 CHILD\n")
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "o.vcf"),
                               "--pedigree", str(ped), "-T", "chr1:0-200"])
    assert_user_error(rc, err, "fam.ped", "columns")


def test_unwritable_output(capsys, genome, tmp_path):
    fa, bam = genome
    rc, err = run_cli(capsys, ["-R", str(fa), "-I", str(bam),
                               "-o", str(tmp_path / "no_dir" / "o.vcf"),
                               "-T", "chr1:0-200"])
    assert_user_error(rc, err, "could not be created")


def test_formatter_structure():
    e = UserError("the flag --frobnicate conflicts with --defrobnicate",
                  where="options", help="remove one of the two flags")
    text = format_error(e)
    lines = text.splitlines()
    assert lines[0] == "A user error has occurred:"
    assert lines[1] == ""
    assert lines[2].startswith("    The flag --frobnicate")
    assert any(l.startswith("To help resolve this error remove")
               for l in lines)
    # wrap discipline (config::CommandLineWidth role)
    assert all(len(l) <= 72 for l in lines)


def test_calling_bug_semantics():
    bug = CallingBug(RuntimeError("boom"), where="caller")
    assert bug.exit_code == 1
    text = format_error(bug)
    assert "A program error has occurred:" in text
    assert "untrustworthy" in text
    assert "RuntimeError" in text
