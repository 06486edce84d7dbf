"""Tests for CLI flags wired in round 2: somatic VAF credible gating,
fallback kmer sizes, assemble-all, output-restriction flags, and the
unmapped-contig check.

Reference semantics cited per test (cancer_caller.cpp, local_reassembler.cpp,
option_collation.cpp)."""

import numpy as np
import pytest

from octopus_tpu.core.callers.cancer import (
    CancerCaller, CancerCallerConfig, beta_hdi)
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from tests.test_population_caller import make_reference, sample_reads, other
from tests.test_cancer_polyclone import mixed_reads


def test_beta_hdi_matches_reference_cases():
    # skewed case = equal-tailed interval (maths.hpp:1019-1025)
    from scipy.stats import beta as beta_dist
    lo, hi = beta_hdi(5.0, 20.0, 0.9)
    assert lo == pytest.approx(float(beta_dist.ppf(0.05, 5, 20)))
    assert hi == pytest.approx(float(beta_dist.ppf(0.95, 5, 20)))
    # symmetric
    lo, hi = beta_hdi(3.0, 3.0, 0.5)
    assert lo == pytest.approx(1 - hi)
    # uniform
    assert beta_hdi(1.0, 1.0, 0.8) == (pytest.approx(0.1), pytest.approx(0.9))
    # J shapes
    assert beta_hdi(1.0, 9.0, 0.9)[0] == 0.0
    assert beta_hdi(9.0, 1.0, 0.9)[1] == 1.0
    # mass 0 collapses to the mean
    lo, hi = beta_hdi(2.0, 6.0, 0.0)
    assert lo == hi == pytest.approx(0.25)


def _cancer_scene(seed, tumour_fraction=0.25, normal_fraction=0.0):
    ref, seq = make_reference(seed=seed)
    alt = other(seq[300])
    tumour = mixed_reads(seq, [({300: alt}, tumour_fraction),
                               ({}, 1 - tumour_fraction)],
                         seed=seed + 1, n_reads=300)
    if normal_fraction > 0:
        normal = mixed_reads(seq, [({300: alt}, normal_fraction),
                                   ({}, 1 - normal_fraction)],
                             seed=seed + 2, n_reads=200)
    else:
        normal = sample_reads(seq, ({}, {}), seed=seed + 2, n_reads=150)
    return ref, seq, tumour, normal


def _cancer_cfg(**kw):
    cfg = CancerCallerConfig(use_device=False, normal_sample=1, **kw)
    cfg.scanner.inclusion = "somatic"
    cfg.scanner.normal_sample = 1
    return cfg


def test_min_credible_somatic_frequency_gates_calls():
    # a 25% VAF somatic passes the default 0.005 floor but cannot have a
    # credible region above 0.60 (cancer_caller.cpp:1246 vaf_stats gate)
    ref, seq, tumour, normal = _cancer_scene(60)
    calls = CancerCaller(ref, "chr1", _cancer_cfg()).call(
        0, 600, [tumour, normal])
    assert [c for c in calls if c.info.get("SOMATIC")]
    strict = _cancer_cfg(min_credible_somatic_frequency=0.60)
    calls = CancerCaller(ref, "chr1", strict).call(0, 600, [tumour, normal])
    assert not [c for c in calls if c.info.get("SOMATIC")]


def test_contaminated_normal_vetoes_somatic_call():
    # the variant is present at similar fraction in the normal: the normal
    # sample's somatic credible region qualifies, killing the somatic call
    # (cancer_caller.cpp:1247-1250)
    ref, seq, tumour, normal = _cancer_scene(61, tumour_fraction=0.3,
                                             normal_fraction=0.3)
    calls = CancerCaller(ref, "chr1", _cancer_cfg()).call(
        0, 600, [tumour, normal])
    assert not [c for c in calls if c.info.get("SOMATIC")]


def test_fallback_kmer_sizes_rescue_ambiguous_bins():
    """A bin whose reference repeats defeat every default kmer size
    assembles at a fallback size (local_reassembler.cpp:38-49)."""
    from octopus_tpu.core.vargen.assembler import (
        AssemblerOptions, LocalReassembler)
    from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome

    rng = np.random.default_rng(7)
    unit = "".join("ACGT"[c] for c in rng.integers(0, 4, 26))
    flank_l = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
    flank_r = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
    # two copies of a 26bp unit: every k <= 26 sees duplicate kmers in the
    # reference -> ambiguous at default sizes (10, 15, 20)
    seq = flank_l + unit + unit + flank_r
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    # somatic-style SNV inside the second unit copy
    pos = len(flank_l) + 26 + 13
    alt_seq = seq[:pos] + other(seq[pos]) + seq[pos + 1:]
    reads = []
    read_len = 80
    for i in range(60):
        begin = int(rng.integers(0, len(seq) - read_len))
        src = alt_seq if i % 2 == 0 else seq
        reads.append((begin, f"{read_len}M", src[begin:begin + read_len],
                      [37] * read_len, 60, 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()

    no_fallback = AssemblerOptions(num_fallbacks=0, assemble_all=True)
    vs = LocalReassembler(ref, "chr1", no_fallback).generate(
        batch, 0, len(seq))
    assert not [v for v in vs if v.begin == pos]

    with_fallback = AssemblerOptions(num_fallbacks=2,
                                     fallback_interval_size=10,
                                     assemble_all=True)
    vs = LocalReassembler(ref, "chr1", with_fallback).generate(
        batch, 0, len(seq))
    assert [v for v in vs if v.begin == pos]


def test_unmapped_contig_check(tmp_path):
    """Whole-genome runs refuse reference contigs absent from the read
    files unless --ignore-unmapped-contigs (calling_components.cpp:755)."""
    from octopus_tpu.cli import build_parser
    from octopus_tpu.run import run_calling
    from octopus_tpu.utils.synthetic import simulate_diploid

    fa, bam, truth, n = simulate_diploid(str(tmp_path), kb=4, depth=8, seed=9)
    # append an extra contig to the FASTA that no BAM covers
    with open(fa, "a") as fh:
        fh.write(">chrEXTRA\n" + "ACGT" * 300 + "\n")
    fai = fa + ".fai"
    if __import__("os").path.exists(fai):
        __import__("os").unlink(fai)
    out = str(tmp_path / "out.vcf")
    argv = ["-R", fa, "-I", bam, "-o", out]
    from octopus_tpu.errors import UserError
    with pytest.raises(UserError, match="missing from every read"):
        run_calling(build_parser().parse_args(argv))
    argv += ["--ignore-unmapped-contigs"]
    assert run_calling(build_parser().parse_args(argv)) == 0
    text = open(out).read()
    assert "chrEXTRA" not in text.split("#CHROM")[1]


# -- round-2 continued: newly wired flags -----------------------------------

def test_split_long_reads_transform():
    """--split-long-reads fragments over-length reads instead of dropping
    them (cli.md:504-510); fragments keep the name hash for linkage."""
    from octopus_tpu.readpipe.transforms import split_long_reads

    seq300 = "".join("ACGT"[i % 4] for i in range(300))
    batch = make_read_batch("chr1", [
        (100, "300M", seq300, [30] * 300, 60, 0),
        (50, "100M", seq300[:100], [30] * 100, 60, 0),
    ])
    out = split_long_reads(batch, 150)
    assert len(out) == 3                       # 2 fragments + 1 untouched
    lens = sorted(out.lengths().tolist())
    assert lens == [100, 150, 150]
    # fragments tile the original alignment
    frag_rows = [i for i in range(3) if out.read_length(i) == 150]
    begins = sorted(int(out.begins[i]) for i in frag_rows)
    assert begins == [100, 250]
    assert len({int(out.name_hashes[i]) for i in frag_rows}) == 1
    # a fragment boundary inside an insertion splits the I op
    batch2 = make_read_batch("chr1", [
        (0, "100M20I80M", seq300[:200], [30] * 200, 60, 0),
    ])
    out2 = split_long_reads(batch2, 110)
    assert len(out2) == 2
    assert sum(out2.lengths().tolist()) == 200


def test_split_long_reads_in_pipe():
    from octopus_tpu.readpipe.pipe import ReadPipe, ReadPipeConfig

    seq300 = "".join("ACGT"[i % 4] for i in range(300))
    batch = make_read_batch("chr1", [(100, "300M", seq300, [30] * 300, 60, 0)])
    # default: over-length read is filtered out
    drop, _ = ReadPipe(ReadPipeConfig(max_read_length=150)).process(batch)
    assert len(drop) == 0
    keep, _ = ReadPipe(ReadPipeConfig(max_read_length=150,
                                      split_long_reads=True)).process(batch)
    assert len(keep) == 2


def test_allow_strand_biased_candidates():
    """The strand-bias rejection clause is skipped under the flag
    (option_parser.cpp:439-441)."""
    from octopus_tpu.core.vargen.cigar_scanner import _is_good_germline
    from octopus_tpu.core.types.variants import Variant

    v = Variant(300, 301, b"A", b"C")
    quals = [38] * 30
    # 30 supporting reads all forward over deep two-stranded coverage
    assert not _is_good_germline(v, 200, 100, 30, quals)
    assert _is_good_germline(v, 200, 100, 30, quals, allow_strand_bias=True)


def test_use_filtered_source_candidates(tmp_path):
    """FILTER-failed source VCF records are dropped unless the flag is set
    (vcf_extractor extract_filtered)."""
    from octopus_tpu.core.vargen.generator import (VariantGenerator,
                                                   VariantGeneratorConfig)
    ref, seq = make_reference(seed=70)
    src = tmp_path / "cand.vcf"
    src.write_text(
        "##fileformat=VCFv4.3\n"
        f"##contig=<ID=chr1,length={len(seq)}>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"chr1\t101\t.\t{seq[100]}\tT\t50\tPASS\t.\n"
        f"chr1\t201\t.\t{seq[200]}\tT\t50\tq10\t.\n")
    base = dict(use_pileup_scanner=False, use_repeat_scanner=False)
    gen = VariantGenerator(ref, "chr1", VariantGeneratorConfig(
        source_vcf=str(src), **base))
    assert [v.begin for v in gen.generate(0, len(seq))] == [100]
    gen2 = VariantGenerator(ref, "chr1", VariantGeneratorConfig(
        source_vcf=str(src), use_filtered_source=True, **base))
    assert [v.begin for v in gen2.generate(0, len(seq))] == [100, 200]


def test_cell_copy_loss_runs():
    """--max-copy-loss adds reduced-ploidy clones to the phylogeny search
    (cell_caller.cpp:342-355); LOH cells may take a ploidy-1 genotype."""
    from octopus_tpu.core.callers.cell import CellCaller, CellCallerConfig

    ref, seq = make_reference(seed=95)
    alt = other(seq[300])
    cells = [
        sample_reads(seq, ({300: alt}, {}), seed=96, n_reads=60),
        sample_reads(seq, ({300: alt}, {}), seed=97, n_reads=60),
        sample_reads(seq, ({}, {}), seed=98, n_reads=60),
        sample_reads(seq, ({}, {}), seed=99, n_reads=60),
    ]
    cfg = CellCallerConfig(use_device=False, max_copy_loss=1,
                           max_copy_gain=1)
    cfg.scanner.inclusion = "cell"
    calls = CellCaller(ref, "chr1", cfg).call(0, 600, cells)
    assert len(calls) == 1 and calls[0].begin == 300
    # every cell still receives a genotype (ploidy 1 or 2)
    assert all(1 <= len(gt) <= 3 for gt in calls[0].genotypes)


def test_independent_genotype_priors_smoke():
    """--use-independent-genotype-priors swaps the joint population prior
    for per-sample priors (cli.md:1157-1163) and still calls correctly."""
    from octopus_tpu.core.callers.population import (PopulationCaller,
                                                     PopulationCallerConfig)
    ref, seq = make_reference(seed=60)
    alt = other(seq[250])
    batches = [sample_reads(seq, ({250: alt}, {}), seed=61 + i, n_reads=60)
               for i in range(3)]
    cfg = PopulationCallerConfig(use_device=False,
                                 use_independent_genotype_priors=True)
    calls = PopulationCaller(ref, "chr1", cfg).call(0, 600, batches)
    assert [c.begin for c in calls] == [250]
    assert all(sorted(gt) == [0, 1] for gt in calls[0].genotypes)


def test_noise_model_vetoes_low_level_normal_contamination():
    """The noise model (evaluate_noise_model, cancer_caller.cpp:572-588,
    1254-1266) fits the somatic mixture on the normal alone: a low-level
    somatic signal in the normal that escapes the credible-region veto is
    still caught; --normal-contamination-risk HIGH disables it."""
    ref, seq, tumour, normal = _cancer_scene(62, tumour_fraction=0.35,
                                             normal_fraction=0.12)
    calls = CancerCaller(ref, "chr1", _cancer_cfg()).call(
        0, 600, [tumour, normal])
    assert not [c for c in calls if c.info.get("SOMATIC")]
    risky = _cancer_cfg(normal_contamination_risk="high")
    calls = CancerCaller(ref, "chr1", risky).call(0, 600, [tumour, normal])
    assert [c for c in calls if c.info.get("SOMATIC")]


def test_noise_model_keeps_clean_normal_somatics():
    ref, seq, tumour, normal = _cancer_scene(63, tumour_fraction=0.3,
                                             normal_fraction=0.0)
    calls = CancerCaller(ref, "chr1", _cancer_cfg()).call(
        0, 600, [tumour, normal])
    assert [c for c in calls if c.info.get("SOMATIC")]


def test_working_directory_and_resolve_symlinks(tmp_path):
    """-w sets the run's working directory for relative outputs
    (cli.md:66-71); --resolve-symlinks replaces symlinked inputs
    (cli.md:80-86)."""
    import os
    from octopus_tpu.cli import build_parser
    from octopus_tpu.run import run_calling
    from octopus_tpu.utils.synthetic import simulate_diploid

    fa, bam, truth, n = simulate_diploid(str(tmp_path), kb=4, depth=10, seed=4)
    link = tmp_path / "link.bam"
    os.symlink(bam, link)
    os.symlink(bam + ".bai", str(link) + ".bai")
    wd = tmp_path / "outdir"
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args(
            ["-R", str(fa), "-I", str(link), "-o", "rel.vcf", "-T", "chr1",
             "-w", str(wd), "--resolve-symlinks"])
        assert run_calling(args) == 0
        assert (wd / "rel.vcf").exists()
        assert args.reads[0] == os.path.realpath(str(link))
    finally:
        os.chdir(cwd)


def test_use_same_read_profile_for_all_samples_pools_mq_profile():
    """--use-same-read-profile-for-all-samples: ONE pooled MQ cap/trigger
    for every sample (option_collation.cpp:1624-1659 shared ReadSetProfile)
    instead of the per-sample derivation."""
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.core.likelihood.likelihood_array import (
        HaplotypeLikelihoodArray, LikelihoodConfig)

    rng = np.random.default_rng(12)
    ref = rng.integers(0, 4, 2000).astype(np.uint8)
    seq = "".join("ACGT"[c] for c in ref)
    short = make_read_batch("chr1", [
        (i * 50, "100M", seq[i * 50:i * 50 + 100], [37] * 100, 60, 0)
        for i in range(8)])
    long = make_read_batch("chr1", [
        (10 + i, "1800M", seq[10 + i:10 + i + 1800], [30] * 1800, 60, 0)
        for i in range(12)])

    # per-sample derivation: short reads cap at max MQ (60), long at 240
    per = HaplotypeLikelihoodArray(LikelihoodConfig())
    assert per._mq_cap_and_trigger(short) == (60, 60)
    assert per._mq_cap_and_trigger(long) == (240, 60)

    shared = HaplotypeLikelihoodArray(
        LikelihoodConfig(shared_read_profile=True))
    shared.populate([short, long], [ref], haplotype_begin=0)
    # pooled median length is 1800 (12 long vs 8 short) -> cap 240 for BOTH
    assert shared._pooled_cap_trig == (240, 60)
    assert shared._mq_cap_and_trigger(short) == (240, 60)
    assert shared._mq_cap_and_trigger(long) == (240, 60)


def test_use_germline_forest_for_somatic_normals_routes_refcalls(tmp_path):
    """Forest choice per somatic_random_forest_filter.cpp:28-37: somatic ->
    somatic forest; refcall -> somatic forest unless
    --use-germline-forest-for-somatic-normals; else germline."""
    from octopus_tpu.core.csr.random_forest import ForestCsr, train_forest

    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 2))
    passing = train_forest(X, np.ones(200, int), ["AD", "DP"], n_trees=5)
    failing = train_forest(X, np.zeros(200, int), ["AD", "DP"], n_trees=5)
    gp, sp = str(tmp_path / "g.npz"), str(tmp_path / "s.npz")
    passing.save(gp)
    failing.save(sp)
    m = {"AD": 0.0, "DP": 0.0}

    default = ForestCsr(gp, sp)
    flagged = ForestCsr(gp, sp, use_somatic_forest_for_refcalls=False)

    # germline record -> germline forest either way
    assert default.classify_q(m)[0] == []
    assert flagged.classify_q(m)[0] == []
    # somatic record -> somatic forest either way
    assert default.classify_q(m, somatic=True)[0] == ["RF"]
    assert flagged.classify_q(m, somatic=True)[0] == ["RF"]
    # refcall record: somatic forest by default, germline under the flag
    assert default.classify_q(m, refcall=True)[0] == ["RF"]
    assert flagged.classify_q(m, refcall=True)[0] == []
