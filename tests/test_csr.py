import numpy as np
import pytest

from octopus_tpu.core.csr.threshold import (
    ThresholdFilter, parse_filter_expression, DEFAULT_GERMLINE_EXPRESSION)
from octopus_tpu.core.csr.measures import compute_measures
from octopus_tpu.core.callers.base import SiteCall
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import encode_sequence


class TestExpressionParser:
    def test_default_parses(self):
        clauses = parse_filter_expression(DEFAULT_GERMLINE_EXPRESSION)
        assert len(clauses) == 10
        assert clauses[0].measure == "QUAL" and clauses[0].op == "<" and clauses[0].value == 10

    def test_classify(self):
        f = ThresholdFilter("QUAL < 10 | SB > 0.98")
        assert f.classify({"QUAL": 50, "SB": 0.2}) == []
        assert f.classify({"QUAL": 5, "SB": 0.2}) == ["QUAL10"]
        assert set(f.classify({"QUAL": 5, "SB": 0.99})) == {"QUAL10", "SB0.98"}

    def test_bad_expression_raises(self):
        with pytest.raises(ValueError):
            parse_filter_expression("QUAL <")


class TestMeasures:
    def _call(self, begin=50):
        v = Variant.make(begin, encode_sequence("A"), encode_sequence("T"))
        return SiteCall(begin=begin, end=begin + 1, alts=[v], quality=200.0,
                        genotypes=[[0, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[200.0])

    def test_depth_and_af(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(10):
            s = list(seq[30:90])
            if i < 5:
                s[20] = "T"     # alt at ref pos 50
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          FLAG_REVERSE if i % 2 else 0))
        batch = make_read_batch("chr1", reads)
        m = compute_measures(self._call(), batch)
        assert m["DP"] == 10
        assert m["AD"] == 5
        assert m["AF"] == pytest.approx(0.5)
        assert m["MQ"] == pytest.approx(60.0)
        assert m["BQ"] == 35
        assert m["AFB"] == pytest.approx(0.0)

    def test_strand_bias_detected(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(30):
            s = list(seq[30:90])
            if i < 15:
                s[20] = "T"
            # all alt reads forward, all ref reads reverse
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          0 if i < 15 else FLAG_REVERSE))
        batch = make_read_batch("chr1", reads)
        m = compute_measures(self._call(), batch)
        assert m["SB"] > 0.98


class TestFullMeasureSet:
    def _scene(self):
        rng = np.random.default_rng(3)
        ref = rng.integers(0, 4, 200).astype(np.uint8)
        alt_base = (ref[100] + 2) % 4
        reads = []
        for i in range(20):
            start = 60 + (i % 30)
            codes = ref[start:start + 80].copy()
            if i % 2 == 0:
                codes[100 - start] = alt_base
            seq = "".join("ACGT"[c] for c in codes)
            flags = FLAG_REVERSE if i % 3 == 0 else 0
            reads.append((start, "80M", seq, [35] * 80, 50, flags))
        batch = make_read_batch("chr1", reads)
        v = Variant.make(100, ref[100:101], np.asarray([alt_base], np.uint8))
        call = SiteCall(begin=100, end=101, alts=[v], quality=300.0,
                        genotypes=[[0, 1]], genotype_qualities=[90.0],
                        phase_set=0, alt_qualities=[300.0])
        return call, batch, ref

    def test_all_measures_present(self):
        from octopus_tpu.core.csr.measures import ALL_MEASURES
        call, batch, ref = self._scene()
        m = compute_measures(call, batch, ref_codes=ref, ref_begin=0)
        # MP/MPD only exist when a caller computed a model posterior;
        # PP/PPD/CC only for denovo/somatic calls; SHC only for somatic
        # (model_posterior.cpp, posterior_probability.cpp,
        # classification_confidence.cpp, somatic_haplotype_count.cpp)
        missing = [k for k in ALL_MEASURES
                   if k not in m and k not in ("PPP", "MHL", "CC", "DC",
                                               "MP", "MPD", "PP", "PPD",
                                               "SHC")]
        assert not missing, missing
        assert m["DP"] == 20
        assert m["AD"] == 10
        assert abs(m["AF"] - 0.5) < 1e-9

    def test_model_posterior_measures_flow(self):
        call, batch, ref = self._scene()
        call.model_posteriors = [23.5]
        call.info["PP"] = 150.0
        m = compute_measures(call, batch, ref_codes=ref, ref_begin=0)
        assert m["MP"] == 23.5                      # FORMAT MP, not QUAL
        assert m["MP"] != m["QUAL"]
        assert m["MPD"] == pytest.approx(23.5 / m["DP"])
        assert m["PP"] == 150.0
        assert m["CC"] == pytest.approx(150.0 / call.quality)

    def test_joint_info_mp_used_when_no_format_mp(self):
        call, batch, ref = self._scene()
        call.info["MP"] = 7.25
        m = compute_measures(call, batch, ref_codes=ref, ref_begin=0)
        assert m["MP"] == 7.25
        assert m["ITV"] in (0, 1)
        assert m["VL"] == 1
        assert 0.0 <= m["GC"] <= 1.0
        assert m["QD"] == pytest.approx(300.0 / 20)
        assert m["MRL"] == 80
        assert m["ER"] == pytest.approx(10 / 20 / 80)

    def test_str_context(self):
        from octopus_tpu.core.csr.measures import _str_context
        codes = np.asarray([0, 1] * 3 + [0, 1, 2, 3] * 10 + [2, 2, 2, 2, 2, 2],
                           np.uint8)
        # site inside the homopolymer run at the end
        L, P = _str_context(codes, 0, len(codes) - 3)
        assert P == 1 and L >= 5


class TestFacets:
    def test_bundle_lazy_and_assignment(self):
        from octopus_tpu.core.csr.facets import FacetBlock, FacetBundle
        from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
        rng = np.random.default_rng(5)
        ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
        reference = ReferenceGenome(InMemoryReference({"chr1": ref}))
        ref_codes = encode_sequence(ref)
        alt_base = (ref_codes[200] + 1) % 4
        reads = []
        for i in range(30):
            start = 150 + (i % 40)
            codes = ref_codes[start:start + 90].copy()
            if i % 2 == 0 and start <= 200 < start + 90:
                codes[200 - start] = alt_base
            seq = "".join("ACGT"[c] for c in codes)
            reads.append((start, "90M", seq, [35] * 90, 50, 0))
        batch = make_read_batch("chr1", reads)
        v = Variant.make(200, ref_codes[200:201], np.asarray([alt_base], np.uint8))
        block = FacetBlock(contig="chr1", begin=195, end=205, variants=[v],
                           genotypes=[[[0, 1]]], reads_by_sample=[batch],
                           samples=["S1"], reference=reference)
        bundle = FacetBundle(block)
        assert bundle.samples == ["S1"]
        assert len(bundle.called_haplotypes) == 2
        support = bundle.allele_support(v)
        assert support[0] > 5      # alt-carrying reads assigned to alt hap
        lo, codes = bundle.reference_context
        assert len(codes) > 0


class TestMeasureSemantics:
    """Reference-faithful measure edge cases (median_base_quality.cpp,
    strand_bias.cpp): missing values must never fail threshold clauses."""

    def _del_call(self, begin, end):
        ref = encode_sequence("A" * (end - begin + 1))
        v = Variant.make(begin, ref, ref[:1])
        return SiteCall(begin=begin, end=end + 1, alts=[v], quality=500.0,
                        genotypes=[[0, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[500.0])

    def test_bq_missing_for_indels(self):
        seq = "ACGT" * 40
        reads = [(30, "30M2D68M", seq[30:60] + seq[62:130], [37] * 98, 60,
                  FLAG_REVERSE if i % 2 else 0) for i in range(12)]
        batch = make_read_batch("chr1", reads)
        v = Variant.make(59, encode_sequence(seq[59:62]), encode_sequence(seq[59]))
        call = SiteCall(begin=59, end=62, alts=[v], quality=500.0,
                        genotypes=[[1, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[500.0])
        m = compute_measures(call, batch)
        assert m.get("BQ") is None
        assert ThresholdFilter("BQ < 15").classify(m) == []

    def test_sb_missing_for_homozygous(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(20):
            s = list(seq[30:90])
            s[20] = "T"
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          0 if i < 18 else FLAG_REVERSE))  # extreme imbalance
        batch = make_read_batch("chr1", reads)
        v = Variant.make(50, encode_sequence("A"), encode_sequence("T"))
        call = SiteCall(begin=50, end=51, alts=[v], quality=900.0,
                        genotypes=[[1, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[900.0])
        m = compute_measures(call, batch)
        assert m.get("SB") is None
        assert ThresholdFilter("SB > 0.98").classify(m) == []

    def test_sb_balanced_het_not_filtered(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(30):
            s = list(seq[30:90])
            if i % 2 == 0:
                s[20] = "T"
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          FLAG_REVERSE if i % 3 == 0 else 0))
        batch = make_read_batch("chr1", reads)
        v = Variant.make(50, encode_sequence("A"), encode_sequence("T"))
        call = SiteCall(begin=50, end=51, alts=[v], quality=500.0,
                        genotypes=[[0, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[500.0])
        m = compute_measures(call, batch)
        assert m.get("SB") is not None and m["SB"] < 0.9

    def test_ad_counts_shifted_indel_placements(self):
        # left-aligned call: del of "AG" at 40 in an (AG)x4 repeat; reads
        # carry the deletion right-shifted (as an aligner would place it)
        pre = "ACGTTGCA" * 5                       # 40 bases
        repeat = "AGAGAGAG"                        # 40..48
        post = "CCTTGGAACCTTGGAA" * 4
        seq = pre + repeat + post
        ref_codes = encode_sequence(seq)
        reads = []
        for i in range(14):
            # 20M at 24 covers to 44, 2D at 44..46, then 40M
            s = seq[24:44] + seq[46:86]
            reads.append((24, "20M2D40M", s, [37] * 60, 60,
                          FLAG_REVERSE if i % 2 else 0))
        batch = make_read_batch("chr1", reads)
        v = Variant.make(40, encode_sequence("AGA"), encode_sequence("A"))
        v = Variant.make(40, encode_sequence(seq[40:42]), np.zeros(0, np.uint8))
        call = SiteCall(begin=40, end=42, alts=[v], quality=800.0,
                        genotypes=[[1, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[800.0])
        m = compute_measures(call, batch, ref_codes=ref_codes, ref_begin=0)
        assert m["AD"] == 14
        assert m["AF"] == pytest.approx(1.0)


def test_beam_dedups_equivalent_haplotypes():
    """Two anchorings of one repeat indel produce ONE haplotype."""
    from octopus_tpu.core.hapgen.beam import grow_haplotypes_beam
    seq = "ACGTTGCA" * 5 + "AGAGAGAG" + "CCTTGGAACCTTGGAA" * 4
    codes = encode_sequence(seq)
    fetch = lambda b, e: codes[b:e]
    v1 = Variant.make(40, codes[40:42], np.zeros(0, np.uint8))
    v2 = Variant.make(42, codes[42:44], np.zeros(0, np.uint8))
    haps = grow_haplotypes_beam(30, 60, [v1, v2], fetch, [], 16)
    seqs = {h.sequence.tobytes() for h in haps}
    assert len(seqs) == len(haps)       # no sequence-identical pair
    assert len(haps) == 3               # ref, single-del, double-del


class TestNativeSiteStats:
    """native site_read_stats is bit-identical to the python golden loop
    (_read_supports/_read_mismatches) across random SNV/ins/del scenes."""

    def _random_scene(self, seed, kind):
        from octopus_tpu.basics.sequence import encode_sequence
        rng = np.random.default_rng(seed)
        n = 600
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        ref = encode_sequence(seq)
        reads = []
        for i in range(120):
            b = int(rng.integers(0, n - 120))
            L = int(rng.integers(60, 110))
            s = list(seq[b:b + L])
            cig = f"{L}M"
            if rng.random() < 0.4:      # random errors
                for _ in range(int(rng.integers(1, 4))):
                    j = int(rng.integers(0, L))
                    s[j] = "ACGT"[rng.integers(0, 4)]
            if rng.random() < 0.3:      # soft clip
                k = int(rng.integers(3, 10))
                cig = f"{k}S{L - k}M"
            if rng.random() < 0.3:      # embedded indel
                k = int(rng.integers(5, L - 10))
                if rng.random() < 0.5:
                    cig = f"{k}M2I{L - k - 2}M"
                else:
                    cig = f"{k}M2D{L - k}M"
            reads.append((b, cig, "".join(s),
                          list(rng.integers(10, 40, L)), 60,
                          FLAG_REVERSE if i % 2 else 0))
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        pos = 300
        if kind == "snv":
            alt = np.asarray([(ref[pos] + 1) % 4], np.uint8)
            return batch, ref, pos, pos + 1, alt, False, False
        if kind == "ins":
            return batch, ref, pos, pos, np.asarray([0, 1], np.uint8), True, False
        return batch, ref, pos, pos + 2, ref[pos:pos + 2], False, True

    @pytest.mark.parametrize("seed", [1, 2, 3])
    @pytest.mark.parametrize("kind", ["snv", "ins", "del"])
    def test_native_matches_python(self, seed, kind):
        from octopus_tpu.core.csr import measures as M
        if M._native is None:
            pytest.skip("native extension unavailable")
        batch, ref, b, e, alt, is_ins, is_del = self._random_scene(seed, kind)
        native_ctx = M.site_context(batch, b, e, alt, is_ins, is_del,
                                    ref_codes=ref, ref_begin=0)
        saved = M._native
        M._native = None
        try:
            py_ctx = M.site_context(batch, b, e, alt, is_ins, is_del,
                                    ref_codes=ref, ref_begin=0)
        finally:
            M._native = saved
        for f in ("depth", "alt_depth", "alt_forward", "alt_reverse",
                  "clipped", "misaligned", "dup_alt"):
            assert getattr(native_ctx, f) == getattr(py_ctx, f), (f, kind)
        assert native_ctx.mismatch_counts == py_ctx.mismatch_counts
        assert native_ctx.alt_base_qualities == py_ctx.alt_base_qualities
        assert native_ctx.alt_offsets == py_ctx.alt_offsets
        assert native_ctx.alt_mapping_qualities == py_ctx.alt_mapping_qualities


def test_strand_disequilibrium_reference_semantics():
    """SD = P(strand fraction in the extreme tails) under
    Beta(fwd+0.5, rev+0.5) with tail mass 0.01
    (strand_disequilibrium.cpp + maths.hpp:980).  The round-3 statistic
    (1 - two-sided binomial p) fired on ~10% of good calls by chance and
    was the entire cancer missed-somatic tail (BASELINE.md round 4)."""
    from octopus_tpu.core.csr.measures import _strand_diseq

    # balanced and mildly skewed pileups: nowhere near the 0.9 clause
    assert _strand_diseq(44, 44) < 1e-6
    assert _strand_diseq(30, 58) < 1e-6          # the old statistic fired here
    assert _strand_diseq(10, 20) < 1e-3
    # genuine one-strand artifacts fire (the 0.9 clause needs deep
    # one-sided pileups; shallow ones keep a wide posterior)
    assert _strand_diseq(0, 60) > 0.5
    assert _strand_diseq(0, 200) > 0.9
    assert _strand_diseq(200, 0) > 0.9
    # tiny depths stay calm (prior keeps the posterior wide)
    assert _strand_diseq(0, 2) < 0.5
