"""Round-5 measurement pins: phasing accuracy and QUAL calibration.

Phasing is scored against the simulator's true haplotype memberships
(pairwise switch errors within phase sets; the reference's PS/PQ
semantics, phaser.cpp:54-175); calibration bins calls by QUAL and
compares empirical error concentration (phred.hpp:99-116 semantics).
"""

import os

import numpy as np
import pytest

from octopus_tpu.config.options import parse_args_with_config
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling
from octopus_tpu.utils.synthetic import write_reference, write_sample_bam


def test_dense_het_region_phases_without_switch_errors(tmp_path):
    """Crafted region: hets every ~150-250 bp with 150 bp reads — adjacent
    hets share reads, so the phaser must link them into multi-site phase
    sets with zero switch errors against the known haplotype assignment."""
    import bench_e2e

    rng = np.random.default_rng(41)
    n = 6000
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = write_reference(str(tmp_path), seq)
    haps = [list(seq), list(seq)]
    truth = {}
    pos = 600
    while pos < n - 600:
        pos += int(rng.integers(60, 110))
        if pos >= n - 600:
            break
        h = int(rng.random() < 0.5)          # carrier haplotype
        alt = "ACGT"[("ACGT".index(seq[pos]) + 1) % 4]
        haps[h][pos] = alt
        truth[pos] = (("snv", alt), "het", (h,))
    bam = write_sample_bam(str(tmp_path), "S", haps, n, 35, 150, rng)
    out = str(tmp_path / "o.vcf")
    args = parse_args_with_config(["-R", fa, "-I", bam, "-o", out,
                                   "-T", "chr1"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records()
            if r.alts and r.filters == ["PASS"]]
    stats = bench_e2e.phasing_stats(recs, truth)
    assert stats["phased_pairs"] >= 15, stats
    # measured round 5: 19 pairs / 1 switch at this size (44/0 at 8 kb);
    # pin the rate, not perfection
    assert stats["switch_rate"] <= 0.06, stats
    assert stats["ps_n50"] >= 500, stats


def test_qual_calibration_is_monotone(tmp_path):
    """Gross-miscalibration bound at noisy low depth (8x, 2% error): high
    QUAL must be overwhelmingly correct and errors must concentrate in the
    low bins — a systematically miscalibrated posterior (confident FPs)
    fails even when recall/precision at normal depth look perfect."""
    import bench_e2e

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/octopus_tpu_jax_cache")
    fa, bam, truth, n = bench_e2e.simulate(str(tmp_path), 60, 8,
                                           err=0.02, seed=29)
    out = str(tmp_path / "o.vcf")
    args = parse_args_with_config(["-R", fa, "-I", bam, "-o", out,
                                   "-T", "chr1"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records() if r.alts]
    cal = bench_e2e.qual_calibration(recs, truth)
    lo_n = sum(v["n"] for b, v in cal.items() if int(b) < 20)
    lo_err = sum(v["err"] for b, v in cal.items() if int(b) < 20)
    hi_n = sum(v["n"] for b, v in cal.items() if int(b) >= 40)
    hi_err = sum(v["err"] for b, v in cal.items() if int(b) >= 40)
    assert hi_n >= 5, cal                      # enough confident calls
    assert hi_err / hi_n <= 0.1, cal           # QUAL>=40 overwhelmingly true
    assert lo_n == 0 or lo_err / max(lo_n, 1) > hi_err / hi_n, cal
