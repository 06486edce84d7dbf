"""Long-read (PacBio-HiFi-style) CLI end-to-end through the shipped preset.

Pins the round-5 long-read path: the PacBioCCS config's 500 bp LINKED
fragmentation (split-long-reads, reference resources/configs/
PacBioCCS.config), the PACBIO discovery predicate, and the no-MQ
assignment model — together these take 5-15 kb reads from recall 0.25 to
~1.0 (BASELINE.md round 5).
"""

import os

from octopus_tpu.config.options import parse_args_with_config
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling

CFG = os.path.join(os.path.dirname(__file__), "..",
                   "resources", "configs", "PacBioCCS.config")


def test_long_read_hifi_cli_end_to_end(tmp_path):
    import bench_e2e
    fa, bam, truth, n = bench_e2e.simulate(
        str(tmp_path), kb=20, depth=30, read_len_range=(5000, 15000),
        err=0.004, base_qual=30, err_qual=13)
    out = str(tmp_path / "o.vcf")
    args = parse_args_with_config(
        ["-R", fa, "-I", bam, "-o", out, "-T", "chr1", "--config", CFG])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records()
            if r.alts and r.filters == ["PASS"]]
    called = {r.pos - 1 for r in recs} | {r.pos for r in recs}
    tp = sum(1 for p in truth if any(abs(p - c) <= 5 for c in called))
    assert tp / max(len(truth), 1) >= 0.85, (
        f"long-read recall {tp}/{len(truth)}; called={sorted(called)}")
    # fragments must re-join under LINKED scoring: hets keep 0|1 genotypes
    gts = {r.pos - 1: r.sample_values[0].get("GT") for r in recs}
    het_truth = [p for p, (kind, zyg, _m) in truth.items()
                 if zyg == "het" and p in gts]
    assert het_truth, "no het truth sites called"
    het_ok = sum(1 for p in het_truth
                 if sorted(gts[p].replace("|", "/").split("/")) == ["0", "1"])
    assert het_ok / len(het_truth) >= 0.8, (het_ok, len(het_truth))
