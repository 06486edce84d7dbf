import numpy as np
import pytest

from octopus_tpu.basics import (
    GenomicRegion,
    encode_sequence,
    decode_sequence,
    reverse_complement,
    parse_cigar,
    cigar_to_string,
    reference_span,
    query_span,
)
from octopus_tpu.basics.genomic_region import (
    overlaps,
    contains,
    encompassing_region,
    expand,
    intervening_region,
    overlap_size,
)
from octopus_tpu.basics import cigar as cg
from octopus_tpu.basics.reads import make_read_batch, ReadBatch


class TestRegions:
    def test_basic(self):
        r = GenomicRegion("chr1", 100, 200)
        assert len(r) == 100
        assert str(r) == "chr1:100-200"

    def test_overlaps(self):
        a = GenomicRegion("chr1", 100, 200)
        b = GenomicRegion("chr1", 150, 250)
        c = GenomicRegion("chr1", 200, 300)
        d = GenomicRegion("chr2", 150, 250)
        assert overlaps(a, b)
        assert not overlaps(a, c)  # half-open
        assert not overlaps(a, d)

    def test_empty_region_overlap(self):
        ins = GenomicRegion("chr1", 150, 150)
        r = GenomicRegion("chr1", 100, 200)
        assert overlaps(ins, r)
        assert overlaps(r, ins)

    def test_contains(self):
        outer = GenomicRegion("chr1", 100, 200)
        inner = GenomicRegion("chr1", 120, 180)
        assert contains(outer, inner)
        assert not contains(inner, outer)

    def test_encompassing(self):
        rs = [GenomicRegion("chr1", 10, 20), GenomicRegion("chr1", 5, 12), GenomicRegion("chr1", 18, 40)]
        e = encompassing_region(rs)
        assert (e.begin, e.end) == (5, 40)

    def test_expand_clamps_at_zero(self):
        r = GenomicRegion("chr1", 5, 10)
        e = expand(r, 10)
        assert (e.begin, e.end) == (0, 20)

    def test_intervening(self):
        a = GenomicRegion("chr1", 0, 10)
        b = GenomicRegion("chr1", 20, 30)
        g = intervening_region(a, b)
        assert (g.begin, g.end) == (10, 20)

    def test_overlap_size(self):
        a = GenomicRegion("chr1", 0, 10)
        b = GenomicRegion("chr1", 5, 30)
        assert overlap_size(a, b) == 5


class TestSequence:
    def test_roundtrip(self):
        s = "ACGTNACGT"
        codes = encode_sequence(s)
        assert decode_sequence(codes) == s

    def test_lowercase(self):
        assert decode_sequence(encode_sequence("acgt")) == "ACGT"

    def test_unknown_is_n(self):
        assert decode_sequence(encode_sequence("RYKM")) == "NNNN"

    def test_revcomp(self):
        codes = encode_sequence("AACGT")
        assert decode_sequence(reverse_complement(codes)) == "ACGTT"


class TestCigar:
    def test_parse_roundtrip(self):
        text = "3S10M2I5M3D7M"
        c = parse_cigar(text)
        assert cigar_to_string(c) == text

    def test_spans(self):
        c = parse_cigar("3S10M2I5M3D7M")
        assert query_span(c) == 3 + 10 + 2 + 5 + 7
        assert reference_span(c) == 10 + 5 + 3 + 7

    def test_collapse(self):
        c = parse_cigar("5=1X4=")
        m = cg.collapse_matches(c)
        assert cigar_to_string(m) == "10M"

    def test_soft_clips(self):
        assert cg.soft_clip_sizes(parse_cigar("3S10M2S")) == (3, 2)
        assert cg.soft_clip_sizes(parse_cigar("5H3S10M")) == (3, 0)
        assert cg.soft_clip_sizes(parse_cigar("10M")) == (0, 0)


class TestReadBatch:
    def _batch(self):
        return make_read_batch(
            "chr1",
            [
                (100, "10M", "ACGTACGTAC", [30] * 10, 60, 0),
                (105, "5M2I3M", "ACGTACGTAC", [20] * 10, 50, 16),
                (200, "10M", "TTTTTTTTTT", [40] * 10, 60, 0),
            ],
        )

    def test_shapes(self):
        b = self._batch()
        assert len(b) == 3
        assert b.ends[0] == 110
        assert b.ends[1] == 105 + 8  # 5M + 3M ref span
        assert b.read_length(1) == 10

    def test_take(self):
        b = self._batch()
        sub = b.take(np.array([2, 0]))
        assert len(sub) == 2
        assert sub.begins[0] == 200
        assert decode_sequence(sub.sequence(0)) == "TTTTTTTTTT"
        assert decode_sequence(sub.sequence(1)) == "ACGTACGTAC"
        assert cigar_to_string(sub.cigar(1)) == "10M"

    def test_overlapping(self):
        b = self._batch()
        sub = b.overlapping(108, 150)
        assert len(sub) == 2

    def test_concatenate(self):
        b = self._batch()
        both = ReadBatch.concatenate([b, b.take(np.array([0]))])
        assert len(both) == 4
        assert decode_sequence(both.sequence(3)) == "ACGTACGTAC"
