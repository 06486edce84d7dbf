"""Whole-product end-to-end: files on disk through the CLI surface."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.cli import build_parser
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling, parse_region
from octopus_tpu.io.fasta import IndexedFasta, ReferenceGenome


@pytest.fixture
def small_genome(tmp_path):
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    return fa, seq


def write_bam(tmp_path, seq, het_pos, hom_pos, n_reads=600, read_len=100):
    rng = np.random.default_rng(5)
    alt_of = {}
    hapA = list(seq)
    hapB = list(seq)
    for p in het_pos:
        alt_of[p] = "T" if seq[p] != "T" else "A"
        hapA[p] = alt_of[p]
    for p in hom_pos:
        alt_of[p] = "G" if seq[p] != "G" else "C"
        hapA[p] = alt_of[p]
        hapB[p] = alt_of[p]
    haps = ["".join(hapA), "".join(hapB)]
    reads = []
    for i in range(n_reads):
        hap = haps[i % 2]
        begin = int(rng.integers(0, len(hap) - read_len))
        reads.append((begin, f"{read_len}M", hap[begin:begin + read_len],
                      [37] * read_len, 60, FLAG_REVERSE if i % 3 == 0 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    p = tmp_path / "sample.bam"
    with BamWriter(str(p), ["chr1"], [len(seq)], samples=["NA12878"]) as w:
        w.write_batch(batch, sample="NA12878")
    build_bai(str(p))
    return p, alt_of


def test_cli_end_to_end(tmp_path, small_genome):
    fa, seq = small_genome
    het, hom = [500, 1500], [1000]
    bam, alt_of = write_bam(tmp_path, seq, het, hom)
    out = tmp_path / "calls.vcf"
    parser = build_parser()
    args = parser.parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1",
    ])
    rc = run_calling(args)
    assert rc == 0
    records = VcfReader(str(out)).records()
    got = {r.pos - 1: r for r in records}
    assert set(got) == set(het) | set(hom)
    for p in het:
        assert sorted(got[p].sample_values[0]["GT"].split("|")) == ["0", "1"]
        assert got[p].alts == [alt_of[p]]
    for p in hom:
        assert got[p].sample_values[0]["GT"] == "1|1"
    assert all(r.qual > 50 for r in records)
    # header sanity
    reader = VcfReader(str(out))
    assert reader.header.samples == ["NA12878"]
    assert ("chr1", 3000) in reader.header.contigs


def test_parse_region(small_genome):
    fa, seq = small_genome
    ref = ReferenceGenome(IndexedFasta(str(fa)))
    # reference semantics: zero-based half-open by default
    # (io/region/region_parser.cpp:96-140)
    assert parse_region("chr1", ref) == ("chr1", 0, 3000)
    assert parse_region("chr1:100-200", ref) == ("chr1", 100, 200)
    assert parse_region("chr1:100", ref) == ("chr1", 100, 101)   # point region
    assert parse_region("chr1:100-", ref) == ("chr1", 100, 3000)
    assert parse_region("chr1:5000-9000", ref) == ("chr1", 2999, 3000)  # clamp
    # --one-based-indexing shifts the whole region left by one
    # (option_collation.cpp:489-510)
    assert parse_region("chr1:101-200", ref, one_based=True) == ("chr1", 100, 199)
    assert parse_region("chr1:101", ref, one_based=True) == ("chr1", 100, 101)


def test_parse_region_colon_contig(tmp_path):
    """GRCh38 ALT/HLA contig names contain colons; a full contig-name match
    wins before colon splitting (region_parser.cpp:94-97)."""
    fa = tmp_path / "hla.fa"
    with open(fa, "w") as fh:
        fh.write(">HLA-A*01:01:01:01\n" + "ACGT" * 25 + "\n")
        fh.write(">chr1\n" + "ACGT" * 25 + "\n")
    ref = ReferenceGenome(IndexedFasta(str(fa)))
    assert parse_region("HLA-A*01:01:01:01", ref) == ("HLA-A*01:01:01:01", 0, 100)
    # range suffix on a colon-bearing contig still parses
    assert parse_region("HLA-A*01:01:01:01:10-20", ref) == \
        ("HLA-A*01:01:01:01", 10, 20)
    # unknown contigs still raise the structured error
    import pytest
    from octopus_tpu.errors import BadRegionError
    with pytest.raises(BadRegionError):
        parse_region("HLA-B*99:99", ref)


def test_checkpoint_resume(tmp_path, small_genome):
    """Completed window shards are reused on rerun."""
    import json, os
    fa, seq = small_genome
    bam, alt_of = write_bam(tmp_path, seq, [500], [1000])
    out = tmp_path / "calls.vcf"
    args = build_parser().parse_args(["-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1"])
    rc = run_calling(args)
    assert rc == 0
    first = [r.to_line() for r in VcfReader(str(out)).records()]
    # simulate an interrupted second run: pre-seed the shard dir with a fake
    # completed window whose shard contains a marker record
    shard_dir = str(out) + ".shards"
    os.makedirs(shard_dir, exist_ok=True)
    # full rerun from scratch reproduces identical records
    rc = run_calling(args)
    second = [r.to_line() for r in VcfReader(str(out)).records()]
    assert first == second


def test_refcall_blocks(tmp_path, small_genome):
    fa, seq = small_genome
    bam, alt_of = write_bam(tmp_path, seq, [500], [])
    out = tmp_path / "calls.g.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1:401-700",
        "--refcall",
    ])
    rc = run_calling(args)
    assert rc == 0
    records = VcfReader(str(out)).records()
    var = [r for r in records if r.alts]
    refs = [r for r in records if not r.alts]
    assert len(var) == 1 and var[0].pos == 501
    assert refs, "expected reference blocks"
    # blocks have END info, 0|0 genotypes, and do not overlap the variant
    for r in refs:
        end = int(r.info["END"])
        assert r.sample_values[0]["GT"] == "0|0"
        assert not (r.pos <= 501 <= end)
    # coverage of the region by blocks + the variant should be near-complete
    covered = sum(int(r.info["END"]) - (r.pos - 1) for r in refs)
    assert covered > 250


def test_threaded_run_matches_serial(tmp_path, small_genome):
    fa, seq = small_genome
    bam, _ = write_bam(tmp_path, seq, [500, 1500, 2500], [1000])
    out1 = tmp_path / "serial.vcf"
    out2 = tmp_path / "threaded.vcf"
    a1 = build_parser().parse_args(["-R", str(fa), "-I", str(bam), "-o", str(out1), "-T", "chr1"])
    a2 = build_parser().parse_args(["-R", str(fa), "-I", str(bam), "-o", str(out2),
                                    "-T", "chr1", "--threads", "4"])
    assert run_calling(a1) == 0
    assert run_calling(a2) == 0
    r1 = [r.to_line() for r in VcfReader(str(out1)).records()]
    r2 = [r.to_line() for r in VcfReader(str(out2)).records()]
    assert r1 == r2


def test_multihost_sharded_run(tmp_path, small_genome):
    """Two 'hosts' split windows by stripe; the second finisher merges."""
    fa, seq = small_genome
    bam, _ = write_bam(tmp_path, seq, [500, 2500], [1500])
    out = tmp_path / "multi.vcf"
    base = ["-R", str(fa), "-I", str(bam), "-o", str(out),
            "-T", "chr1:0-1500", "chr1:1500-3000", "--work-queue"]
    a0 = build_parser().parse_args(base + ["--shard-index", "0", "--num-shards", "2"])
    a1 = build_parser().parse_args(base + ["--shard-index", "1", "--num-shards", "2"])
    run_calling(a0)
    run_calling(a1)
    # one of the two runs performed the merge
    records = VcfReader(str(out)).records()
    assert {r.pos - 1 for r in records} == {500, 1500, 2500}


def test_filter_vcf_mode(tmp_path, small_genome):
    fa, seq = small_genome
    bam, _ = write_bam(tmp_path, seq, [500], [1000])
    raw = tmp_path / "raw.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(raw), "-T", "chr1",
        "--disable-call-filtering"])
    assert run_calling(args) == 0
    filtered = tmp_path / "filtered.vcf"
    from octopus_tpu.cli import main
    rc = main(["-R", str(fa), "-I", str(bam), "--filter-vcf", str(raw),
               "-o", str(filtered)])
    assert rc == 0
    records = VcfReader(str(filtered)).records()
    assert len(records) == 2
    assert all(r.filters == ["PASS"] for r in records)


def test_config_file_preset(tmp_path, small_genome):
    fa, seq = small_genome
    bam, _ = write_bam(tmp_path, seq, [500], [])
    cfgf = tmp_path / "my.config"
    cfgf.write_text("min-variant-posterior = 5\nthreads = 2\n")
    out = tmp_path / "o.vcf"
    from octopus_tpu.config.options import parse_args_with_config
    args = parse_args_with_config(["--config", str(cfgf), "-R", str(fa),
                                   "-I", str(bam), "-o", str(out), "-T", "chr1"])
    assert args.min_variant_posterior == 5.0
    assert args.threads == 2
    assert run_calling(args) == 0
    assert len(VcfReader(str(out)).records()) == 1


def test_new_flag_surface(tmp_path, small_genome):
    """--skip-regions / --sites-only / --annotations / --contig-output-order."""
    fa, seq = small_genome
    het, hom = [500, 1500], [1000]
    bam, alt_of = write_bam(tmp_path, seq, het, hom)
    out = tmp_path / "calls.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1",
        "-K", "chr1:900-1100",          # skip the hom site
        "--sites-only",
        "--annotations", "AF", "SB",
        "--contig-output-order", "LEXICOGRAPHICAL_ASCENDING",
        "--mask-low-quality-tails", "5",
        "--min-read-length", "30",
    ])
    assert run_calling(args) == 0
    records = VcfReader(str(out)).records()
    got = {r.pos - 1: r for r in records}
    assert set(got) == set(het)          # hom site skipped via -K
    for r in records:
        assert not r.sample_values       # sites-only
        assert "AF" in r.info and "SB" in r.info


def test_samples_restriction_and_reads_file(tmp_path, small_genome):
    fa, seq = small_genome
    bam, _ = write_bam(tmp_path, seq, [500], [])
    listing = tmp_path / "bams.txt"
    listing.write_text(str(bam) + "\n")
    out = tmp_path / "calls.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-i", str(listing), "-o", str(out), "-T", "chr1",
        "-S", "NA12878",
    ])
    assert run_calling(args) == 0
    assert any(not l.startswith("#") for l in open(out))
    # unknown sample errors cleanly (structured MissingSampleError)
    from octopus_tpu.errors import MissingSampleError
    args2 = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1",
        "-S", "NOPE",
    ])
    with pytest.raises(MissingSampleError, match="NOPE"):
        run_calling(args2)


def test_forest_model_in_run(tmp_path, small_genome):
    """--forest-model during calling: RF classification + RFGQ emission."""
    fa, seq = small_genome
    bam, alt_of = write_bam(tmp_path, seq, [500, 1500], [1000])
    out = tmp_path / "calls_rf.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1",
        "--forest-model", "resources/forests/germline.npz",
    ])
    assert run_calling(args) == 0
    reader = VcfReader(str(out))
    records = reader.records()
    assert records
    for r in records:
        assert "RFGQ" in r.format_keys
        q = float(r.sample_values[0]["RFGQ"])
        assert (r.filters == ["PASS"]) == (q >= 3.0)
        assert r.filters in (["PASS"], ["RF"])
    # clean sim with strong truth variants: the shipped forest should PASS them
    assert any(r.filters == ["PASS"] for r in records)
    assert any(f.get("ID") == "RF" for f in reader.header.filters)


def test_trio_csr_sample_alignment(tmp_path):
    """Regression: trio reordering (-M/-F) must also reorder the CSR
    filtering read set — a mismatch computes measures against the wrong
    sample's reads and threshold-filters true calls (round-2 bug caught by
    bench_e2e_multi: germline recall 1.00 -> 0.21)."""
    import numpy as np
    from bench_e2e import write_reference, write_sample_bam
    from octopus_tpu.io.vcf import VcfReader

    rng = np.random.default_rng(3)
    n = 6000
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = write_reference(str(tmp_path), seq)
    mom = [list(seq), list(seq)]
    dad = [list(seq), list(seq)]
    # het germline SNV carried by mom
    alt = "ACGT"[("ACGT".index(seq[3000]) + 1) % 4]
    mom[0][3000] = alt
    kid = [list(mom[0]), list(dad[1])]
    # sample names sort to DAD,KID,MOM != trio order MOM,DAD,KID
    bams = [write_sample_bam(str(tmp_path), s_, h, n, 30, 150, rng)
            for s_, h in (("MOM", mom), ("DAD", dad), ("KID", kid))]
    out = tmp_path / "trio.vcf"
    args = build_parser().parse_args(
        ["-R", str(fa), "-I"] + [str(b) for b in bams]
        + ["-o", str(out), "-T", "chr1", "-M", "MOM", "-F", "DAD"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(str(out)).records()
            if r.alts and r.filters == ["PASS"]]
    assert any(abs(r.pos - 1 - 3000) <= 1 for r in recs), \
        [(r.pos, r.filters) for r in VcfReader(str(out)).records()]


def test_refcall_gvcf_tiles_without_gaps_or_overlaps(tmp_path):
    """gVCF continuity: refcall blocks + variant records must tile the
    requested region with no overlaps and no gaps (round-4 probe;
    reference semantics: caller.cpp refcall block construction)."""
    from octopus_tpu.utils.synthetic import simulate_diploid

    fa, bam, truth, n = simulate_diploid(str(tmp_path), kb=12, depth=25,
                                         seed=42)
    out = tmp_path / "g.vcf"
    args = build_parser().parse_args([
        "-R", fa, "-I", bam, "-o", str(out), "-T", "chr1:0-8000", "--refcall",
    ])
    assert run_calling(args) == 0
    recs = list(VcfReader(str(out)))
    assert len(recs) > 50
    prev_end = None
    for r in recs:
        pos0 = r.pos - 1
        end = int(r.info["END"]) if "END" in r.info else pos0 + len(r.ref)
        if prev_end is not None:
            assert pos0 >= prev_end, f"overlap at {pos0} (prev end {prev_end})"
            assert pos0 <= prev_end, f"gap {prev_end}-{pos0}"
        prev_end = max(prev_end or 0, end)
    assert prev_end >= 7990


def test_assembler_suppressed_on_wrong_reference(tmp_path):
    """Majority-mismatch-dense read sets (wrong reference build) must not
    trigger per-bin assembly everywhere — round-4 probe: such a window
    burned 4 minutes making 59 junk candidates before the guard."""
    import time
    import numpy as np
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.io.bam_writer import BamWriter, build_bai

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    other_seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    fa = tmp_path / "wrong.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    reads = []
    for i in range(400):
        b = int(rng.integers(0, 3800))
        reads.append((b, "150M", other_seq[b:b + 150], [37] * 150, 60, 0))
    bam = tmp_path / "wrong.bam"
    with BamWriter(str(bam), ["chr1"], [len(seq)], samples=["S"]) as w:
        w.write_batch(make_read_batch("chr1", reads).sorted_by_begin(),
                      sample="S")
    build_bai(str(bam))
    out = tmp_path / "o.vcf"
    args = build_parser().parse_args([
        "-R", str(fa), "-I", str(bam), "-o", str(out), "-T", "chr1:0-4000",
    ])
    t0 = time.time()
    assert run_calling(args) == 0
    assert time.time() - t0 < 60        # was minutes before the guard
