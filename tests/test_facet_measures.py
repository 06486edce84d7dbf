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
