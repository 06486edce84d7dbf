"""Whole-run --bamout driver + helper scripts (split/filter) tests."""

import subprocess
import sys

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.basics.sequence import decode_sequence
from octopus_tpu.core.tools.bam_realigner import run_bamout, _phase_blocks
from octopus_tpu.core.types.haplotypes import Haplotype
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.io.bam import BamFile
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.io.vcf import VcfRecord, VcfWriter, VcfHeader


def _write_vcf(path, records, contig="chr1", length=4000, samples=("S",)):
    header = VcfHeader()
    header.contigs.append((contig, length))
    header.samples = list(samples)
    with VcfWriter(str(path), header) as w:
        for r in records:
            w.write(r)
    return str(path)


@pytest.fixture
def scene(tmp_path):
    rng = np.random.default_rng(3)
    ref_codes = rng.integers(0, 4, 4000).astype(np.uint8)
    reference = ReferenceGenome(InMemoryReference({"chr1": ref_codes}))
    fetch = lambda b, e: ref_codes[b:e]
    v = Variant.make(2000, ref_codes[2000:2001],
                     np.asarray([(ref_codes[2000] + 1) % 4], np.uint8))
    h_ref = Haplotype.build(1920, 2120, [], fetch)
    h_alt = Haplotype.build(1920, 2120, [v], fetch)
    reads = []
    for i in range(10):
        begin = 1950 + 3 * i
        src = h_alt if i % 2 else h_ref
        seq = decode_sequence(src.sequence[begin - 1920:begin - 1920 + 60])
        reads.append((begin, "60M", seq, [35] * 60, 60, 0))
    batch = make_read_batch("chr1", reads)
    bam_path = tmp_path / "in.bam"
    with BamWriter(str(bam_path), ["chr1"], [4000], samples=["S"]) as w:
        w.write_batch(batch, sample="S")
    build_bai(str(bam_path))
    alt_base = "ACGT"[(ref_codes[2000] + 1) % 4]
    rec = VcfRecord("chr1", 2001, ".", "ACGT"[ref_codes[2000]], [alt_base],
                    100.0, ["PASS"], {}, ["GT"], [{"GT": "0|1"}])
    vcf = _write_vcf(tmp_path / "calls.vcf", [rec])
    return tmp_path, reference, bam_path, vcf


def test_run_bamout_mini_tags(scene):
    tmp_path, reference, bam_path, vcf = scene
    out = tmp_path / "evidence.bam"
    stats = run_bamout(vcf, reference, [BamFile(str(bam_path))], ["S"],
                       str(out), bamout_type="MINI")
    assert stats["realigned"] == 10
    got = BamFile(str(out)).fetch("chr1", 0, 4000, keep_aux=True)["S"]
    assert len(got) == 10
    hps = {got.tag(i, "HP") for i in range(len(got))}
    assert hps <= {"0", "1", "0,1"} and len(hps) > 1
    assert got.tag(0, "PS").startswith("chr1:")
    assert got.tag(0, "LK") is not None
    # coordinate sorted
    assert (np.diff(got.begins) >= 0).all()


def test_run_bamout_full_passthrough(scene):
    tmp_path, reference, bam_path, vcf = scene
    # second bam region with no calls: reads pass through in FULL mode only
    out_mini = tmp_path / "mini.bam"
    out_full = tmp_path / "full.bam"
    extra = make_read_batch("chr1", [(10, "30M", "A" * 30, [30] * 30, 60, 0)])
    both = tmp_path / "in2.bam"
    src = BamFile(str(bam_path)).fetch("chr1", 0, 4000, keep_names=True)["S"]
    from octopus_tpu.basics.reads import ReadBatch
    with BamWriter(str(both), ["chr1"], [4000], samples=["S"]) as w:
        w.write_batch(extra, sample="S")
        w.write_batch(src, sample="S")
    build_bai(str(both))
    run_bamout(vcf, reference, [BamFile(str(both))], ["S"], str(out_mini),
               bamout_type="MINI")
    run_bamout(vcf, reference, [BamFile(str(both))], ["S"], str(out_full),
               bamout_type="FULL")
    n_mini = len(BamFile(str(out_mini)).fetch("chr1", 0, 4000).get("S", []))
    n_full = len(BamFile(str(out_full)).fetch("chr1", 0, 4000).get("S", []))
    assert n_full == n_mini + 1


def test_split_and_filter_scripts(scene, tmp_path):
    _, reference, bam_path, vcf = scene
    out = tmp_path / "evidence.bam"
    run_bamout(vcf, reference, [BamFile(str(bam_path))], ["S"], str(out),
               bamout_type="MINI")
    prefix = tmp_path / "split"
    r = subprocess.run([sys.executable, "scripts/split_realigned_bam.py",
                        "-b", str(out), "-o", str(prefix)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    import os
    produced = [f for f in os.listdir(tmp_path)
                if f.startswith("split") and f.endswith(".bam")]
    assert produced
    # every read lands in exactly one split BAM
    total = sum(len(b) for f in produced
                for b in BamFile(str(tmp_path / f)).fetch("chr1", 0, 4000).values())
    assert total == 10
    out2 = tmp_path / "assigned.bam"
    r2 = subprocess.run([sys.executable, "scripts/filter_assigned_reads.py",
                         "-I", str(out), "-O", str(out2)],
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr
    kept = BamFile(str(out2)).fetch("chr1", 0, 4000, keep_aux=True).get("S")
    if kept is not None:
        assert all("," not in str(kept.tag(i, "HP")) for i in range(len(kept)))


def test_phase_blocks_grouping():
    def rec(pos, ps=None):
        sv = [{"GT": "0|1", **({"PS": ps} if ps else {})}]
        return VcfRecord("chr1", pos, ".", "A", ["C"], 50.0, ["PASS"], {},
                         ["GT"], sv)
    blocks = _phase_blocks([rec(100), rec(300), rec(5000)])
    assert [len(b) for b in blocks] == [2, 1]
    # shared PS forces co-blocking across a large gap
    blocks = _phase_blocks([rec(100, ps="100"), rec(5000, ps="100")])
    assert [len(b) for b in blocks] == [2]
