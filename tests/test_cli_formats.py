"""CLI end-to-end over the less-exercised I/O formats and ploidies:
BCF output, CRAM input (call-identical to BAM input), tetraploid
genotypes (--organism-ploidy)."""

import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    from octopus_tpu.utils.synthetic import simulate_diploid
    tmp = tmp_path_factory.mktemp("fmt")
    fa, bam, truth, n = simulate_diploid(str(tmp), kb=30, depth=30, seed=9)
    return str(tmp), fa, bam, truth, n


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _call(fa, reads, out, extra=()):
    r = subprocess.run(
        [sys.executable, "-m", "octopus_tpu.cli", "-R", fa, "-I", reads,
         "-o", out, "-T", "chr1", *extra],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    return out


def _body(vcf_path):
    return open(vcf_path).read().split("#CHROM", 1)[1]


def test_bcf_output_readable(sim):
    tmp, fa, bam, truth, n = sim
    out = _call(fa, bam, os.path.join(tmp, "out.bcf"))
    from octopus_tpu.io.bcf import BcfReader
    recs = list(BcfReader(out))
    assert len(recs) >= len(truth) // 2
    assert recs[0].chrom == "chr1"


def test_cram_input_matches_bam(sim):
    tmp, fa, bam, truth, n = sim
    from octopus_tpu.io.bam import BamFile
    from octopus_tpu.io.cram_writer import CramWriter
    from octopus_tpu.io.fasta import IndexedFasta, ReferenceGenome
    ref = ReferenceGenome(IndexedFasta(fa))
    batch = next(iter(BamFile(bam).fetch("chr1", 0, n).values()))
    cram = os.path.join(tmp, "reads.cram")
    with CramWriter(cram, ["chr1"], [n], samples=["SIM"],
                    reference=ref) as w:
        w.write_batch(batch, sample="SIM")
    vcf_bam = _call(fa, bam, os.path.join(tmp, "from_bam.vcf"))
    vcf_cram = _call(fa, cram, os.path.join(tmp, "from_cram.vcf"))
    assert _body(vcf_cram) == _body(vcf_bam)


def test_tetraploid_genotypes(sim):
    tmp, fa, bam, truth, n = sim
    out = _call(fa, bam, os.path.join(tmp, "tetra.vcf"),
                ("--organism-ploidy", "4"))
    gts = [line.split("\t")[9].split(":")[0]
           for line in open(out) if not line.startswith("#")]
    assert gts
    assert all(len(gt.replace("/", "|").split("|")) == 4 for gt in gts)
