"""The full read filter/transform inventory
(read_filter.hpp:61-330, read_transform.hpp:15-182)."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import (
    FLAG_MATE_UNMAPPED,
    FLAG_PAIRED,
    FLAG_PROPER_PAIR,
    FLAG_REVERSE,
    ReadBatch,
    make_read_batch,
)
from octopus_tpu.readpipe import filters as rf
from octopus_tpu.readpipe import transforms as rt
from octopus_tpu.readpipe.pipe import ReadPipe, ReadPipeConfig


def simple_batch():
    return make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, 0),
        (105, "4S6M", "ACGTACGTAC", [30] * 10, 50, 0),
        (110, "6M4S", "ACGTACGTAC", [5] * 10, 10, FLAG_REVERSE),
    ])


def test_length_filters():
    b = simple_batch()
    assert rf.is_short(b, 10).all()
    assert not rf.is_short(b, 9).any()
    assert rf.is_long(b, 10).all()
    assert not rf.is_long(b, 11).any()


def test_good_base_fraction():
    b = simple_batch()
    got = rf.has_sufficient_good_base_fraction(b, 20, 0.5)
    assert got.tolist() == [True, True, False]


def test_template_filters():
    flags = FLAG_PAIRED | FLAG_MATE_UNMAPPED
    b = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, flags),
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, FLAG_PAIRED | FLAG_PROPER_PAIR),
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, 0),
    ])
    assert rf.is_next_segment_mapped(b).tolist() == [False, True, True]
    assert rf.is_proper_template(b).tolist() == [False, True, True]
    assert rf.is_not_chimeric(b).tolist() == [False, False, True]
    # local template needs mate_same_contig
    b.mate_same_contig = np.asarray([False, True, True])
    assert rf.is_local_template(b).tolist() == [False, True, True]
    # contamination: template shorter than read span
    b.template_lengths = np.asarray([5, 20, 5], np.int32)
    got = rf.is_not_contaminated(b)
    assert got.tolist() == [True, True, True]  # unpaired / mate-unmapped pass
    b2 = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, FLAG_PAIRED),
    ])
    b2.template_lengths = np.asarray([5], np.int32)
    assert not rf.is_not_contaminated(b2)[0]


def test_well_formed_cigar_rejects_all_clipped():
    b = make_read_batch("chr1", [
        (100, "10S", "ACGTACGTAC", [30] * 10, 50, 0),
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, 0),
    ])
    assert rf.has_well_formed_cigar(b).tolist() == [False, True]


def test_tag_filters_with_aux():
    b = simple_batch()
    # hand-build aux bytes: read0 has BC:Z:ACGT, read1 none, read2 SA tag
    aux0 = b"BCZACGT\x00"
    aux2 = b"SAZdecoy1,100,+,10M,0,0;\x00"
    b.aux = np.frombuffer(aux0 + aux2, np.uint8).copy()
    b.aux_offsets = np.asarray([0, len(aux0), len(aux0), len(aux0) + len(aux2)], np.int64)
    assert b.tag(0, "BC") == "ACGT"
    assert b.tag(1, "BC") is None
    assert rf.has_tag(b, "BC").tolist() == [True, False, False]
    assert rf.has_tag(b, "BC", "ACGT").tolist() == [True, False, False]
    assert rf.has_tag(b, "BC", "TTTT").tolist() == [False, False, False]
    assert rf.not_has_tag(b, "BC").tolist() == [False, True, True]
    # decoy supplementary filter reads the SA tag
    assert rf.no_decoy_supplementary_alignments(b, None).tolist() == [True, True, False]
    assert rf.no_decoy_supplementary_alignments(b, 10).tolist() == [True, True, True]


def test_mask_tail_and_low_quality_tails():
    b = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, 0),
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, FLAG_REVERSE),
    ])
    q = b.quals.copy()
    rt.mask_tail(b, q, 3)
    assert q[:10].tolist() == [30] * 7 + [0] * 3      # forward: back masked
    assert q[10:].tolist() == [0] * 3 + [30] * 7      # reverse: front masked
    b2 = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 6 + [5, 5, 30, 5], 50, 0),
    ])
    q2 = b2.quals.copy()
    rt.mask_low_quality_tails(b2, q2, 10)
    # only the trailing low-quality run is zeroed
    assert q2.tolist() == [30, 30, 30, 30, 30, 30, 5, 5, 30, 0]


def test_mask_adapters_and_overlap():
    flags_f = FLAG_PAIRED | FLAG_PROPER_PAIR
    b = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, flags_f),
    ])
    b.mate_same_contig = np.asarray([True])
    b.template_lengths = np.asarray([7], np.int32)   # insert < read length
    q = b.quals.copy()
    rt.mask_adapters(b, q)
    assert q.tolist() == [30] * 7 + [0] * 3
    # overlapped segment: forward read whose mate begins before its end
    b2 = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, flags_f),
    ])
    b2.mate_begins = np.asarray([106])
    b2.mate_same_contig = np.asarray([True])
    q2 = b2.quals.copy()
    rt.mask_overlapped_segment(b2, q2)
    assert q2.tolist() == [30] * 6 + [0] * 4


def test_mask_soft_clip_variants():
    b = make_read_batch("chr1", [
        (100, "3S7M", "ACGTACGTAC", [2, 30, 2, 30, 30, 30, 30, 30, 30, 30], 50, 0),
    ])
    q = b.quals.copy()
    rt.mask_soft_clipped(b, q)
    assert q.tolist()[:3] == [0, 0, 0]
    q2 = b.quals.copy()
    rt.mask_low_quality_soft_clipped_bases(b, q2, 10)
    assert q2.tolist() == [0, 30, 0] + [30] * 7
    q3 = b.quals.copy()
    rt.mask_low_quality_soft_clipped_boundary_bases(b, q3, 2, 10)
    assert q3.tolist() == [0, 30, 0, 30, 30] + [30] * 5


def test_mask_low_average_quality_soft_clipped_tails():
    b = make_read_batch("chr1", [
        (100, "6M4S", "ACGTACGTAC", [30] * 6 + [3, 3, 3, 3], 50, 0),
    ])
    q = b.quals.copy()
    rt.mask_low_average_quality_soft_clipped_tails(b, q, 10, 3)
    assert q.tolist() == [30] * 6 + [0] * 4


def test_template_transforms():
    flags_f = FLAG_PAIRED
    flags_r = FLAG_PAIRED | FLAG_REVERSE
    b = make_read_batch("chr1", [
        (100, "10M", "ACGTACGTAC", [30] * 10, 50, flags_f),
        (95, "10M", "ACGTACGTAC", [30] * 10, 50, flags_r),
    ])
    b.name_hashes = np.asarray([7, 7], np.uint64)
    q = b.quals.copy()
    rt.mask_template_adapters(b, q)
    # reverse begins before forward: its 5-base left overhang is adapter;
    # reverse ends (105) before forward end (110): forward's last 5 masked
    assert q[10:15].tolist() == [0] * 5
    assert q[5:10].tolist() == [0] * 5


def test_inverted_clip_masking():
    class FakeRef:
        def __init__(self, codes):
            self.codes = codes

        def fetch_codes(self, contig, lo, hi):
            return self.codes[lo:hi]

    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    # read aligned at 100 with a 12-base clipped head equal to the reverse
    # complement of reference [120:132]
    comp = np.array([3, 2, 1, 0], np.uint8)
    clip = comp[ref[120:132]][::-1]
    aligned = ref[100:120]
    seq = "".join("ACGT"[c] for c in np.concatenate([clip, aligned]))
    b = make_read_batch("chr1", [(100, "12S20M", seq, [30] * 32, 50, 0)])
    q = b.quals.copy()
    rt.mask_inverted_soft_clipped_read_ends(b, q, FakeRef(ref), "chr1", 10, 100)
    assert (q[:12] == 0).all() and (q[12:] == 30).all()


def test_pipe_chains_compose():
    cfg = ReadPipeConfig(min_read_length=8, max_read_length=200,
                         no_reads_with_unmapped_segments=True,
                         mask_low_quality_tails=10, assembler_enabled=True,
                         min_good_bases=5)
    pipe = ReadPipe(cfg)
    b = simple_batch()
    out, report = pipe.process(b)
    assert report.n_raw == 3
    assert len(out) >= 1
