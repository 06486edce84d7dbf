"""Multi-allelic CSR measures: carriers of DIFFERENT ALTs at one site must
each contribute the support of THEIR OWN allele (measure cardinality
alt_alleles, measure.hpp; allele_frequency.cpp evaluates per called allele).

Round-4 probe finding: a two-sample site (S1 het 6bp deletion, S2 het SNV
inside the deleted span) produced AD=0 / AF=0 and was threshold-filtered
(AD1;AF0.01) because every path evaluated only alts[0]; the FacetBlock also
dropped non-first ALTs from the called-haplotype model, so assignment
support for ALT 2 carriers was structurally zero."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.cli import build_parser
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling


@pytest.fixture
def scene(tmp_path):
    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")

    def mk(sample, muts):
        reads = []
        for i in range(500):
            b = int(rng.integers(1500, 2400))
            hap = i % 2
            bases = list(seq[b:b + 150])
            cig = "150M"
            for kind, pos, payload, h in muts:
                if h != hap:
                    continue
                if kind == "snv" and b <= pos < b + 150:
                    bases[pos - b] = payload
                if kind == "del" and b < pos and pos + payload < b + 150:
                    a = pos - b
                    bases = list(seq[b:pos] + seq[pos + payload:b + 150 + payload])
                    cig = f"{a}M{payload}D{150 - a}M"
            reads.append((b, cig, "".join(bases), [37] * 150, 60,
                          FLAG_REVERSE if i % 3 else 0))
        p = tmp_path / f"{sample}.bam"
        with BamWriter(str(p), ["chr1"], [len(seq)], samples=[sample]) as w:
            w.write_batch(make_read_batch("chr1", reads).sorted_by_begin(),
                          sample=sample)
        build_bai(str(p))
        return p

    alt = "T" if seq[2003] != "T" else "A"
    b1 = mk("S1", [("del", 2000, 6, 0)])
    b2 = mk("S2", [("snv", 2003, alt, 0)])
    return fa, b1, b2


def test_multiallelic_site_passes_with_real_support(tmp_path, scene):
    fa, b1, b2 = scene
    out = tmp_path / "out.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(b1), str(b2), "-o", str(out),
        "-T", "chr1:1500-2500", "--annotations", "AD", "ADP", "AF",
    ])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(str(out)) if r.alts]
    assert len(recs) == 1
    r = recs[0]
    assert len(r.alts) == 2                       # deletion + (padded) SNV
    # both carriers genotyped on their own allele
    gts = [sv["GT"].replace("|", "/") for sv in r.sample_values]
    assert sorted(gts[0].split("/")) == ["0", "1"]
    assert sorted(gts[1].split("/")) == ["0", "2"]
    # the measure fix: allele support evaluated per carried allele
    assert r.filters == ["PASS"]
    assert float(r.info["AD"]) >= 20
    assert float(r.info["AF"]) > 0.2
