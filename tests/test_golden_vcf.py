"""Golden-VCF regression: the full pipeline's output on a fixed synthetic
dataset is pinned; any change to calling/annotation semantics must update
the snapshot consciously (the regression harness the reference lacks,
SURVEY.md section 4)."""

import numpy as np
import pytest

from octopus_tpu.cli import build_parser
from octopus_tpu.run import run_calling
from octopus_tpu.io.vcf import VcfReader
from tests.test_cli_e2e import write_bam


@pytest.fixture
def fixed_genome(tmp_path):
    rng = np.random.default_rng(777)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    return fa, seq


def test_pinned_output(tmp_path, fixed_genome):
    fa, seq = fixed_genome
    bam, alts = write_bam(tmp_path, seq, [800, 2200], [1500], n_reads=700)
    out = tmp_path / "calls.vcf"
    args = build_parser().parse_args(
        ["-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1"])
    assert run_calling(args) == 0
    records = VcfReader(str(out)).records()
    summary = [(r.pos, r.ref, tuple(r.alts), r.filters == ["PASS"],
                r.sample_values[0]["GT"]) for r in records]
    # pinned snapshot (seeded data; deterministic pipeline)
    got_gts = {p: (gt if gt[0] <= gt[2] else gt[::-1])
               for p, _, _, _, gt in summary}
    assert [s[0] for s in summary] == [801, 1501, 2201]
    assert all(s[3] for s in summary)
    assert got_gts[801] == "0|1"
    assert got_gts[1501] == "1|1"
    assert got_gts[2201] == "0|1"
    assert {s[2][0] for s in summary} == {alts[800], alts[1500], alts[2200]}
    # qualities should be deterministic run to run
    out2 = tmp_path / "calls2.vcf"
    args2 = build_parser().parse_args(
        ["-R", str(fa), "-I", str(bam), "-o", str(out2), "-T", "chr1"])
    assert run_calling(args2) == 0
    assert [r.to_line() for r in VcfReader(str(out)).records()] == \
           [r.to_line() for r in VcfReader(str(out2)).records()]
