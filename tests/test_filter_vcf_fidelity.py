"""Standalone --filter-vcf facet fidelity vs the inline CSR pass.

The reference's filter-request mode reconstructs full per-sample genotypes
from the VCF (genotype_reader.cpp via facet_factory.hpp:28-79) so the
support/bias measures see the same per-carrier evaluation as inline CSR.
These tests pin that the standalone pass matches the inline pass on a
multi-sample, multi-allelic call set where a pooled-sample / first-ALT
shim demonstrably diverges (round-4 bug #2's standalone twin).
"""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.cli import build_parser, main
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling


@pytest.fixture
def two_sample_multiallelic(tmp_path):
    """Two samples, one multi-allelic site: S0 is 0/1 (alt T), S1 is 0/2
    (alt G) at pos 800; plus a biallelic het private to S1 at 1800."""
    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    base = seq[800]
    alt1 = "T" if base != "T" else "A"
    alt2 = "G" if base not in ("G",) and alt1 != "G" else "C"
    base2 = seq[1800]
    alt3 = "T" if base2 != "T" else "A"
    haps = {
        "S0": [list(seq), list(seq)],
        "S1": [list(seq), list(seq)],
    }
    haps["S0"][1][800] = alt1
    haps["S1"][1][800] = alt2
    haps["S1"][0][1800] = alt3
    bams = []
    for name, pair in haps.items():
        reads = []
        for i in range(700):
            hap = "".join(pair[i % 2])
            begin = int(rng.integers(0, len(hap) - 100))
            reads.append((begin, "100M", hap[begin:begin + 100],
                          [37] * 100, 60, FLAG_REVERSE if i % 3 == 0 else 0))
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        p = tmp_path / f"{name}.bam"
        with BamWriter(str(p), ["chr1"], [len(seq)], samples=[name]) as w:
            w.write_batch(batch, sample=name)
        build_bai(str(p))
        bams.append(p)
    return fa, bams


def _info_measures(rec, keys):
    return {k: rec.info.get(k) for k in keys if k in rec.info}


def test_filter_vcf_matches_inline_csr(tmp_path, two_sample_multiallelic):
    fa, bams = two_sample_multiallelic
    bam_args = [str(b) for b in bams]
    # 1) raw call set, unfiltered + unannotated (the external-VCF input)
    raw = tmp_path / "raw.vcf"
    args = build_parser().parse_args(
        ["-R", str(fa), "-I", *bam_args, "-o", str(raw), "-T", "chr1",
         "--caller", "population", "--disable-call-filtering"])
    assert run_calling(args) == 0
    # 2) inline CSR on the same data, annotated
    keys = ["AF", "AD", "ADP", "DP", "AFB", "SB"]
    inline = tmp_path / "inline.vcf"
    args = build_parser().parse_args(
        ["-R", str(fa), "-I", *bam_args, "-o", str(inline), "-T", "chr1",
         "--caller", "population", "--annotations", *keys])
    assert run_calling(args) == 0
    # 3) standalone filter pass over the raw VCF
    standalone = tmp_path / "standalone.vcf"
    rc = main(["-R", str(fa), "-I", *bam_args, "--filter-vcf", str(raw),
               "-o", str(standalone), "--annotations", *keys])
    assert rc == 0
    inline_recs = {(r.pos, tuple(r.alts or ())): r
                   for r in VcfReader(str(inline)).records()}
    stand_recs = {(r.pos, tuple(r.alts or ())): r
                  for r in VcfReader(str(standalone)).records()}
    # the multi-allelic site must be present and PASS in both
    multi = [k for k in inline_recs if len(k[1]) >= 2]
    assert multi, "expected a multi-allelic record"
    assert set(stand_recs) == set(inline_recs)
    for key in inline_recs:
        ri, rs = inline_recs[key], stand_recs[key]
        assert rs.filters == ri.filters, (key, rs.filters, ri.filters)
        mi, ms = _info_measures(ri, keys), _info_measures(rs, keys)
        for k in mi:
            if k not in ms or mi[k] in (".",) or ms[k] in (".",):
                continue
            vi, vs = float(mi[k]), float(ms[k])
            # support measures must agree closely (same facet semantics);
            # DP may differ by boundary reads between fetch paths
            tol = max(0.05 * max(abs(vi), abs(vs)), 0.02) if k != "DP" \
                else max(0.1 * vi, 3)
            assert abs(vi - vs) <= tol, (key, k, vi, vs)


def test_filter_vcf_per_sample_not_pooled(tmp_path, two_sample_multiallelic):
    """The AF measure for the S1-private het must reflect S1's own reads
    (~0.5), not the pooled two-sample frequency (~0.25)."""
    fa, bams = two_sample_multiallelic
    bam_args = [str(b) for b in bams]
    raw = tmp_path / "raw.vcf"
    args = build_parser().parse_args(
        ["-R", str(fa), "-I", *bam_args, "-o", str(raw), "-T", "chr1",
         "--caller", "population", "--disable-call-filtering"])
    assert run_calling(args) == 0
    out = tmp_path / "filtered.vcf"
    rc = main(["-R", str(fa), "-I", *bam_args, "--filter-vcf", str(raw),
               "-o", str(out), "--annotations", "AF"])
    assert rc == 0
    recs = [r for r in VcfReader(str(out)).records() if r.pos - 1 in (1800,)]
    assert recs, "S1-private het missing from filter output"
    af = float(recs[0].info["AF"])
    assert af > 0.35, f"AF {af} looks pooled, not per-carrier"
