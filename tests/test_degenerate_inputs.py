"""Adversarial input probes (round-4 continuation): degenerate reads,
symbolic source candidates, haploid contig ploidy.  Each case pins
no-crash behaviour plus the semantically expected output."""

import os

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.cli import build_parser
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling
from octopus_tpu.utils.synthetic import simulate_diploid


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("degen"))
    fa, bam, truth, n = simulate_diploid(tmp, kb=30, depth=25, seed=9)
    seq = open(fa).read().split("\n", 1)[1].replace("\n", "")
    return tmp, fa, bam, truth, n, seq


def test_degenerate_reads_do_not_crash(sim):
    """BQ0-everywhere reads, all-soft-clip reads, and a 2 kb deletion
    spanning read set must neither crash nor produce confident junk."""
    tmp, fa, _, _, n, seq = sim
    reads = []
    for start in range(1000, 1600, 37):       # BQ 0 everywhere
        reads.append((start, "100M", seq[start:start + 100], [0] * 100, 60, 0))
    for start in range(2000, 2300, 51):       # all soft-clip
        reads.append((start, "100S", seq[start:start + 100], [30] * 100, 60, 0))
    for start in range(3000, 3300, 53):       # deletion longer than the read
        s = seq[start:start + 50] + seq[start + 2050:start + 2100]
        reads.append((start, "50M2000D50M", s, [30] * 100, 60, 0))
    batch = make_read_batch("chr1", reads)
    bam2 = os.path.join(tmp, "degen.bam")
    with BamWriter(bam2, ["chr1"], [n], samples=["S1"]) as w:
        w.write_batch(batch, sample="S1")
    build_bai(bam2)
    out = os.path.join(tmp, "degen.vcf")
    args = build_parser().parse_args(
        ["-R", fa, "-I", bam2, "-o", out, "-T", "chr1"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records() if r.alts]
    # the unanimous 2 kb deletion may be called, but only at low quality
    # (BQ0 and clipped reads contribute no confident support)
    for r in recs:
        assert r.qual < 10 or r.filters != ["PASS"]


def test_symbolic_source_candidates_skipped(sim):
    """--source-candidates with <DEL>/<NON_REF>/breakend ALTs: symbolic
    records are skipped (the reference's VcfExtractor only takes sequence
    alleles); plain records still feed candidates."""
    tmp, fa, bam, _, n, seq = sim
    src = os.path.join(tmp, "cands.vcf")
    alt = "ACGT"[("ACGT".index(seq[799]) + 1) % 4]
    with open(src, "w") as fh:
        fh.write("##fileformat=VCFv4.3\n")
        fh.write("##contig=<ID=chr1,length=%d>\n" % n)
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr1\t500\t.\t%s\t<DEL>\t.\t.\t.\n" % seq[499])
        fh.write("chr1\t600\t.\t%s\t<NON_REF>\t.\t.\t.\n" % seq[599])
        fh.write("chr1\t700\t.\t%s\t%s]chr1:800]\t.\t.\t.\n"
                 % (seq[699], seq[699]))
        fh.write("chr1\t800\t.\t%s\t%s\t.\t.\t.\n" % (seq[799], alt))
    out = os.path.join(tmp, "srccand.vcf")
    args = build_parser().parse_args(
        ["-R", fa, "-I", bam, "-o", out, "-T", "chr1:1-5000",
         "--source-candidates", src])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records() if r.alts]
    # no symbolic ALT can leak into the output
    assert all("<" not in a and "]" not in a and "[" not in a
               for r in recs for a in r.alts)


def test_haploid_contig_ploidy(sim):
    """--contig-ploidies chr1=1 calls haploid GTs on that contig."""
    tmp, fa, bam, _, n, _ = sim
    out = os.path.join(tmp, "haploid.vcf")
    args = build_parser().parse_args(
        ["-R", fa, "-I", bam, "-o", out, "-T", "chr1",
         "--contig-ploidies", "chr1=1"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records() if r.alts]
    assert recs
    for r in recs:
        gt = r.sample_values[0]["GT"].replace("|", "/")
        assert len(gt.split("/")) == 1


def test_filter_vcf_symbolic_alt_passthrough(tmp_path):
    """Foreign VCFs can carry symbolic ALTs (<DEL>, breakends); they have no
    literal allele to score, so the standalone filter pass must write them
    through untouched instead of mislabelling from ref-allele pileups
    (round-5 probe)."""
    import numpy as np
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from octopus_tpu.cli import main
    from octopus_tpu.io.vcf import VcfReader

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    reads = [(int(rng.integers(0, 1900)), "100M", None, [37] * 100, 60, 0)]
    reads = [(b, c, seq[b:b + 100], q, m, f) for b, c, _, q, m, f in reads
             for _ in [0]] * 60
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam = tmp_path / "s.bam"
    with BamWriter(str(bam), ["chr1"], [2000], samples=["S"]) as w:
        w.write_batch(batch, sample="S")
    build_bai(str(bam))
    vcf = tmp_path / "in.vcf"
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=2000>\n")
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        fh.write(f"chr1\t700\t.\t{seq[699]}\t<DEL>\t33\tq10\t.\tGT\t0/1\n")
    out = tmp_path / "out.vcf"
    rc = main(["-R", str(fa), "-I", str(bam), "--filter-vcf", str(vcf),
               "-o", str(out), "--annotations", "AF"])
    assert rc == 0
    recs = VcfReader(str(out)).records()
    assert len(recs) == 1
    assert recs[0].alts == ["<DEL>"]
    assert recs[0].filters == ["q10"]         # untouched
    assert "AF" not in recs[0].info           # not annotated from pileup


def test_bamout_cram_path_is_clear_user_error(tmp_path, capsys):
    """--bamout foo.cram used to write BAM bytes behind a .cram name; it now
    fails up-front with a structured UserError (round-5 probe)."""
    from octopus_tpu.cli import main

    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\n" + "ACGT" * 200 + "\n")
    rc = main(["-R", str(fa), "-I", "missing.bam", "-o", str(tmp_path / "o.vcf"),
               "--bamout", str(tmp_path / "e.cram")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "CRAM" in err and "--bamout" in err


def test_trio_caller_rejects_four_samples(tmp_path, capsys):
    """A 4th sample would be silently dropped by the trio ordering
    (round-5 pedigree probe); the trio caller now requires exactly 3."""
    import numpy as np
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from octopus_tpu.cli import main

    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 1500))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n" + seq + "\n")
    bams = []
    for name in ("MOM", "DAD", "KID1", "KID2"):
        reads = [(int(rng.integers(0, 1400)), "100M", None, [37] * 100, 60, 0)
                 for _ in range(50)]
        reads = [(b, c, seq[b:b + 100], q, m, f) for b, c, _, q, m, f in reads]
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        p = tmp_path / f"{name}.bam"
        with BamWriter(str(p), ["chr1"], [1500], samples=[name]) as w:
            w.write_batch(batch, sample=name)
        build_bai(str(p))
        bams.append(str(p))
    rc = main(["-R", str(fa), "-I", *bams, "-o", str(tmp_path / "o.vcf"),
               "-T", "chr1", "-M", "MOM", "-F", "DAD"])
    assert rc == 2
    assert "exactly 3 samples" in capsys.readouterr().err
    # restricting with --samples makes it runnable
    rc = main(["-R", str(fa), "-I", *bams, "-o", str(tmp_path / "o2.vcf"),
               "-T", "chr1", "-M", "MOM", "-F", "DAD",
               "--samples", "MOM", "DAD", "KID1"])
    assert rc == 0
