"""Assignment-based CSR measures through the facet layer
(VERDICT round-1 item #6: facets must feed the product measures).

The reference computes AD/AF/ADP from HMM read-to-haplotype assignment
(read_assignments.hpp:25-34), not raw pileup matching; in repetitive
regions the two disagree because pileup matching cannot attribute
repeat-shifted reads to the allele."""

import numpy as np
import pytest

from octopus_tpu.core.csr.facets import FacetBlock, FacetBundle
from octopus_tpu.core.csr.measures import compute_measures
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from tests.test_population_caller import make_reference, sample_reads, other


def _het_scene(seed=12, n=600, pos=300):
    ref, seq = make_reference(seed=seed, n=n)
    alt = other(seq[pos])
    batch = sample_reads(seq, ({pos: alt}, {}), seed=seed + 1,
                         n_reads=400)
    v = Variant.make(pos, encode_sequence(seq[pos]), encode_sequence(alt))
    return ref, seq, batch, v


class FakeCall:
    def __init__(self, v, gt=(0, 1)):
        self.begin, self.end = v.begin, v.end
        self.alts = [v]
        self.quality = 60.0
        self.genotypes = [list(gt)]
        self.genotype_qualities = [50.0]
        self.phase_set = v.begin
        self.info = {}


def _bundle(ref, batch, v, gt=(0, 1)):
    return FacetBundle(FacetBlock(
        contig="chr1", begin=v.begin, end=max(v.end, v.begin + 1),
        variants=[v], genotypes=[[list(gt)]], reads_by_sample=[batch],
        samples=["S"], reference=ref, ploidy=2))


def test_assignment_based_support_measures():
    ref, seq, batch, v = _het_scene()
    call = FakeCall(v)
    call.info["PP"] = call.quality     # CC = PP/QUAL needs INFO PP
    bundle = _bundle(ref, batch, v)
    m = compute_measures(call, batch, facets=bundle)
    # het SNV at 50%: assignment-based AF lands near 0.5 and AD+ADP sane
    assert 0 < m["AD"] <= m["ADP"]
    assert 0.3 < m["AF"] < 0.7
    # MHL populated from assigned likelihoods; CC from PP/QUAL
    assert "MHL" in m and m["MHL"] >= 0
    assert m["CC"] == pytest.approx(call.quality / call.quality)


def test_assignment_beats_pileup_in_repeat():
    """A deletion of one repeat unit: reads covering the repeat are
    attributable by HMM assignment, while pileup matching under-counts
    (exact-window matching misses shifted presentations)."""
    rng = np.random.default_rng(8)
    unit = "ACGGT"
    flank_l = "".join("ACGT"[c] for c in rng.integers(0, 4, 220))
    flank_r = "".join("ACGT"[c] for c in rng.integers(0, 4, 220))
    seq = flank_l + unit * 6 + flank_r
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    site = len(flank_l)
    # het deletion of one unit
    dlen = len(unit)
    reads = []
    read_len = 100
    n_carrier = 0
    for i in range(160):
        begin = int(rng.integers(0, len(seq) - read_len - dlen))
        spans = begin + 15 < site and begin + read_len - 15 > site
        if spans and (n_carrier := n_carrier + 1) % 2 == 0:
            # every other spanning read carries the het deletion
            a = site - begin
            b = read_len - a
            bases = seq[begin:site] + seq[site + dlen:site + dlen + b]
            cig = f"{a}M{dlen}D{b}M"
        else:
            bases = seq[begin:begin + read_len]
            cig = f"{read_len}M"
        reads.append((begin, cig, bases, [37] * read_len, 60,
                      FLAG_REVERSE if i % 3 == 0 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    v = Variant.make(site, encode_sequence(seq[site:site + dlen]),
                     np.zeros(0, np.uint8))
    call = FakeCall(v)
    bundle = _bundle(ref, batch, v)
    m_facet = compute_measures(call, batch, facets=bundle)
    m_pileup = compute_measures(call, batch)
    # the facet path must attribute a healthy alt fraction
    assert m_facet["AD"] >= m_pileup["AD"]
    assert 0.25 < m_facet["AF"] < 0.75


def test_pln_phase_length_flows_from_blocks():
    ref, seq, batch, v = _het_scene()
    call = FakeCall(v)
    m = compute_measures(call, batch, phase_length=1234)
    assert m["PLN"] == 1234


def test_duplicate_concordance():
    ref, seq = make_reference(seed=44)
    pos = 300
    alt = other(seq[pos])
    # distinct begins -> no accidental duplicate groups
    reads = []
    for k, begin in enumerate(range(230, 290, 2)):
        src = list(seq)
        if k % 2 == 0:
            src[pos] = alt
        bases = "".join(src[begin:begin + 90])
        reads.append((begin, "90M", bases, [37] * 90, 60, 0))
    from octopus_tpu.basics.reads import ReadBatch
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    v = Variant.make(pos, encode_sequence(seq[pos]), encode_sequence(alt))
    # no duplicates -> missing
    assert _bundle(ref, batch, v).duplicate_concordance(v) is None
    # duplicate every read (same begin/end/strand) -> perfect concordance
    dup = ReadBatch.concatenate([batch, batch]).sorted_by_begin()
    assert _bundle(ref, dup, v).duplicate_concordance(v) == pytest.approx(1.0)
    # a discordant pair at one begin drops concordance below 1
    bad = reads + [(230, "90M", "".join(seq[230:320]), [37] * 90, 60, 0)]
    mixed = make_read_batch("chr1", bad).sorted_by_begin()
    dc = _bundle(ref, mixed, v).duplicate_concordance(v)
    assert dc is not None and dc < 1.0


# -- round 4: assignment-based bias measures (SB/RTB/REB/RSB/ARF/BMC) --------

def _mk_batch(reads):
    return make_read_batch("chr1", reads).sorted_by_begin()


def _scene_snv(n_err=0):
    """Deterministic het SNV scene: 6 alt carriers (4 fwd / 2 rev), 6 ref
    (3 fwd / 3 rev), all error-free and mid-read; plus n_err reads with a
    third base at the site (mismatching BOTH haplotypes equally ->
    ambiguous assignment)."""
    rng = np.random.default_rng(77)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    site = 200
    alt = other(seq[site])
    third = next(b for b in "ACGT" if b not in (seq[site], alt))
    reads = []
    for k in range(6):                     # alt carriers
        begin = 150 + k
        bases = list(seq[begin:begin + 100])
        bases[site - begin] = alt
        reads.append((begin, "100M", "".join(bases), [37] * 100, 60,
                      0 if k < 4 else FLAG_REVERSE))
    for k in range(6):                     # ref reads
        begin = 140 + k
        reads.append((begin, "100M", seq[begin:begin + 100], [37] * 100, 60,
                      0 if k < 3 else FLAG_REVERSE))
    for k in range(n_err):                 # site errors: ambiguous ties
        begin = 160 + k
        bases = list(seq[begin:begin + 100])
        bases[site - begin] = third
        reads.append((begin, "100M", "".join(bases), [37] * 100, 60, 0))
    v = Variant.make(site, encode_sequence(seq[site]), encode_sequence(alt))
    return ref, _mk_batch(reads), v


def test_assignment_strand_bias_pinned():
    """SB = max over called-allele pairs of P(|p_i - p_j| > 0.25),
    p ~ Beta(fwd+1, rev+1) over ASSIGNED support (strand_bias.cpp:110-213;
    deterministic integral replaces the Monte-Carlo estimate of the same
    probability)."""
    from octopus_tpu.core.csr.measures import _strand_bias_prob

    ref, batch, v = _scene_snv()
    m = compute_measures(FakeCall(v), batch, facets=_bundle(ref, batch, v))
    # called-allele order is (ref, alt): ref (3f,3r) vs alt (4f,2r)
    want = _strand_bias_prob(3, 3, 4, 2)
    assert m["SB"] == pytest.approx(want, abs=1e-12)
    # hom-alt carriers are not evaluable (is_evaluable strand_bias.cpp:84-87)
    m_hom = compute_measures(FakeCall(v, gt=(1, 1)), batch,
                             facets=_bundle(ref, batch, v, gt=(1, 1)))
    assert "SB" not in m_hom


def test_assignment_position_biases_pinned():
    """RTB/REB = beta_cdf(head+1, tail+1, 0.09) over containing assigned
    reads (read_tail_bias.cpp:100-110, read_end_bias.cpp:111-121); RSB the
    strand-aware side test (read_side_bias.cpp:74-85)."""
    from scipy import stats as sps

    ref, batch, v = _scene_snv()
    m = compute_measures(FakeCall(v), batch, facets=_bundle(ref, batch, v))
    # every read holds the site mid-read: head-only counts for both alleles
    # alt: 6 containing reads; ref: 6 -> beta_cdf(0.09, 7, 1) both
    want_mid = float(sps.beta.cdf(0.09, 6 + 1, 0 + 1))
    assert m["RTB"] == pytest.approx(want_mid, abs=1e-12)
    assert m["REB"] == pytest.approx(want_mid, abs=1e-12)
    assert 0.0 <= m["RSB"] <= 1.0


def test_assignment_tail_bias_diverges_from_pileup():
    """Alt observations in the 3' read tail: the assignment statistic is the
    reference's beta tail probability, NOT the pileup fraction."""
    from scipy import stats as sps

    rng = np.random.default_rng(9)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    site = 200
    alt = other(seq[site])
    reads = []
    for k in range(6):                     # alt forward reads, site in tail
        begin = site - 98                  # offset 98 >= 100 - 3 (tail bases)
        bases = list(seq[begin:begin + 100])
        bases[site - begin] = alt
        reads.append((begin, "100M", "".join(bases), [37] * 100, 60, 0))
    for k in range(6):                     # ref reads mid-placed
        begin = 140 + k
        reads.append((begin, "100M", seq[begin:begin + 100], [37] * 100, 60,
                      0 if k % 2 else FLAG_REVERSE))
    v = Variant.make(site, encode_sequence(seq[site]), encode_sequence(alt))
    batch = _mk_batch(reads)
    m_facet = compute_measures(FakeCall(v), batch,
                               facets=_bundle(ref, batch, v))
    m_pileup = compute_measures(FakeCall(v), batch)
    # alt allele: head 0, tail 6 -> beta_cdf(0.09, 1, 7); ref: all mid ->
    # beta_cdf(0.09, 7, 1); max = the alt tail bias
    want = float(sps.beta.cdf(0.09, 0 + 1, 6 + 1))
    assert m_facet["RTB"] == pytest.approx(want, abs=1e-12)
    # pileup fallback is an observation FRACTION (1.0 here): demonstrably
    # different statistic on the same reads
    assert m_pileup["RTB"] == pytest.approx(1.0)
    assert abs(m_facet["RTB"] - m_pileup["RTB"]) > 0.3


def test_assignment_arf_counts_ambiguous_reads():
    """ARF = ambiguously-assigned / overlapping (ambiguous_read_fraction
    .cpp:34-53): reads with a third base at the site tie across haplotypes
    and assign ambiguous."""
    ref, batch, v = _scene_snv(n_err=2)
    m = compute_measures(FakeCall(v), batch, facets=_bundle(ref, batch, v))
    assert m["ARF"] == pytest.approx(2 / 14)


def test_assignment_bmc_counts_allele_mismatches():
    """BMC: mismatches of assigned supporting reads against their OWN
    allele sequence over the allele region (base_mismatch_count.cpp:35-77)."""
    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    site = 200
    # MNV with all three bases changed: any overlap discriminates
    ref_seq = seq[site:site + 3]
    alt_seq = "".join(other(b) for b in ref_seq)
    reads = []
    for k in range(5):                     # clean alt carriers
        begin = 150 + k
        bases = list(seq[begin:begin + 100])
        bases[site - begin:site - begin + 3] = alt_seq
        reads.append((begin, "100M", "".join(bases), [37] * 100, 60, 0))
    # one carrier with an error in the allele's last base (a 4th value):
    # closer to alt (1 mismatch) than ref (3) -> assigned alt, BMC += 1
    begin = 155
    bases = list(seq[begin:begin + 100])
    bases[site - begin:site - begin + 3] = alt_seq
    bad = next(b for b in "ACGT" if b not in (ref_seq[2], alt_seq[2]))
    bases[site - begin + 2] = bad
    reads.append((begin, "100M", "".join(bases), [30] * 100, 60, 0))
    for k in range(6):                     # clean ref reads
        begin = 140 + k
        reads.append((begin, "100M", seq[begin:begin + 100], [37] * 100, 60,
                      FLAG_REVERSE if k % 2 else 0))
    v = Variant.make(site, encode_sequence(ref_seq), encode_sequence(alt_seq))
    assert len(v.alt_codes) == 3, "normalisation must keep the MNV intact"
    batch = _mk_batch(reads)
    m = compute_measures(FakeCall(v), batch, facets=_bundle(ref, batch, v))
    assert m["BMC"] == 1
    assert m["BMQ"] == pytest.approx(30.0)
    assert m["BMF"] == pytest.approx(1 / (12 * 3))
