"""Window-boundary reconciliation (resolve_connecting_calls,
octopus.cpp:950-1015) — VERDICT round-1 item #3/#5."""

import numpy as np

from octopus_tpu.core.tools.reconcile import resolve_connecting_records
from octopus_tpu.io.vcf import VcfRecord


def rec(pos0, ref="A", alts=("T",), end=None):
    info = {"END": end} if end is not None else {}
    return VcfRecord(chrom="chr1", pos=pos0 + 1, id="", ref=ref,
                     alts=list(alts), qual=50.0, filters=["PASS"],
                     info=info, format_keys=["GT"],
                     sample_values=[{"GT": "0|1"}])


def refblock(pos0, end):
    return VcfRecord(chrom="chr1", pos=pos0 + 1, id="", ref="A", alts=[],
                     qual=40.0, filters=["PASS"], info={"END": end},
                     format_keys=["GT"], sample_values=[{"GT": "0|0"}])


class TestResolveConnectingRecords:
    def test_duplicate_seam_call_kept_once_from_rhs(self):
        # both windows called the same left-aligned deletion at 995
        lhs = [rec(900), rec(995, ref="ATATA", alts=["A"])]
        rhs = [rec(995, ref="ATATA", alts=["A"]), rec(1100)]
        new_lhs, new_rhs = resolve_connecting_records(lhs, rhs)
        assert [r.pos for r in new_lhs] == [901]
        assert [r.pos for r in new_rhs] == [996, 1101]

    def test_disjoint_windows_untouched(self):
        lhs = [rec(900), rec(950)]
        rhs = [rec(1000), rec(1100)]
        new_lhs, new_rhs = resolve_connecting_records(lhs, rhs)
        assert new_lhs == lhs and new_rhs == rhs

    def test_lhs_variant_preferred_over_rhs_leading_refcall(self):
        # rhs leads with a refcall block overlapping lhs's variant: keep the
        # lhs variant, squash the rhs block to its tail (octopus.cpp:969-1009)
        lhs = [rec(990)]
        rhs = [refblock(985, end=1005), rec(1010)]
        new_lhs, new_rhs = resolve_connecting_records(
            lhs, rhs, fetch_base=lambda p: "G")
        assert [r.pos for r in new_lhs] == [991]
        assert len(new_rhs) == 2
        squashed = new_rhs[0]
        assert squashed.pos == 992           # tail starts after lhs variant
        assert squashed.ref == "G"
        assert squashed.info["END"] == 1005
        assert new_rhs[1].pos == 1011

    def test_fully_overlapped_rhs_refcall_dropped(self):
        lhs = [rec(990, ref="AAAAAAAAAAAAAAAAAAAAA", alts=["A"])]  # spans 990-1011
        rhs = [refblock(995, end=1008), rec(1020)]
        new_lhs, new_rhs = resolve_connecting_records(
            lhs, rhs, fetch_base=lambda p: "C")
        assert [r.pos for r in new_lhs] == [991]
        assert [r.pos for r in new_rhs] == [1021]

    def test_empty_sides(self):
        assert resolve_connecting_records([], [rec(10)])[1] == [rec(10)]
        assert resolve_connecting_records([rec(10)], [])[0] == [rec(10)]


def test_seam_deletion_called_exactly_once_e2e(tmp_path):
    """A deletion in a repeat spanning a window seam is emitted exactly once
    in the merged VCF (VERDICT weak #10: multi-window contig seam test)."""
    import os
    from octopus_tpu.cli import build_parser
    from octopus_tpu.run import run_calling, propose_windows
    from octopus_tpu.utils.synthetic import simulate_diploid

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    fa, bam, truth, n = simulate_diploid(str(tmp_path), kb=12, depth=30,
                                         seed=77)
    out = str(tmp_path / "out.vcf")
    # force a seam in the middle of the contig by monkeypatching window size
    import octopus_tpu.run as run_mod
    orig = run_mod.propose_windows

    def tiny_windows(reference, regions, bams=None, **kw):
        out_w = []
        for contig, begin, end in regions:
            mid = (begin + end) // 2
            out_w.append(run_mod.Window(contig, begin, mid))
            out_w.append(run_mod.Window(contig, mid, end))
        return out_w

    run_mod.propose_windows = tiny_windows
    try:
        args = build_parser().parse_args(["-R", fa, "-I", bam, "-o", out])
        assert run_calling(args) == 0
    finally:
        run_mod.propose_windows = orig
    # every position appears at most once; recall stays complete
    seen = {}
    for line in open(out):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        key = (f[1], f[3], f[4])
        assert key not in seen, f"duplicate record at {key}"
        seen[key] = True
    called = {int(l.split("\t")[1]) - 1 for l in open(out)
              if not l.startswith("#")}
    missed = [t for t in truth if not any(abs(t - c) <= 25 for c in called)]
    assert not missed, f"missed truth sites {missed}"
