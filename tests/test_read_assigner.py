import numpy as np
import pytest

from octopus_tpu.basics.cigar import cigar_to_string, parse_cigar
from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.basics.sequence import decode_sequence, encode_sequence
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.core.types.haplotypes import Haplotype
from octopus_tpu.core.tools.read_assigner import (
    assign_reads,
    realign_read_to_haplotype,
    lift_to_reference,
)


@pytest.fixture
def setup():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    fetch = lambda b, e: ref[b:e]
    v = Variant.make(150, ref[150:151], encode_sequence("T" if ref[150] != 3 else "A"))
    h_ref = Haplotype.build(0, 300, [], fetch)
    h_alt = Haplotype.build(0, 300, [v], fetch)
    return ref, h_ref, h_alt, v


def test_assignment_splits_by_allele(setup):
    ref, h_ref, h_alt, v = setup
    reads = []
    for i in range(20):
        begin = 120 + i
        src = h_alt.sequence if i % 2 == 0 else h_ref.sequence
        reads.append((begin, "60M", decode_sequence(src[begin:begin + 60]),
                      [35] * 60, 60, 0))
    batch = make_read_batch("chr1", reads)
    a = assign_reads(batch, [h_ref, h_alt], [0, 1], hap_begin=0)
    for i in range(20):
        want = 1 if i % 2 == 0 else 0
        assert a.hap_of_read[i] == want


def test_realign_snv_read_is_full_match(setup):
    ref, h_ref, h_alt, v = setup
    begin = 130
    seq = decode_sequence(h_alt.sequence[begin:begin + 50])
    batch = make_read_batch("chr1", [(begin, "50M", seq, [35] * 50, 60, 0)])
    nb, cig = realign_read_to_haplotype(batch, 0, h_alt)
    assert nb == begin
    assert cigar_to_string(cig) == "50M"


def test_realign_through_deletion():
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    fetch = lambda b, e: ref[b:e]
    v = Variant.make(150, ref[150:153], np.zeros(0, np.uint8))  # 3bp deletion
    h = Haplotype.build(0, 300, [v], fetch)
    begin_h = 130  # position on haplotype
    seq = decode_sequence(h.sequence[begin_h:begin_h + 50])
    batch = make_read_batch("chr1", [(130, "50M", seq, [35] * 50, 60, 0)])
    nb, cig = realign_read_to_haplotype(batch, 0, h)
    assert nb == 130
    assert cigar_to_string(cig) == "20M3D30M"


def test_realign_through_insertion():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    fetch = lambda b, e: ref[b:e]
    v = Variant.make(150, np.zeros(0, np.uint8), encode_sequence("GGG"))
    h = Haplotype.build(0, 300, [v], fetch)
    seq = decode_sequence(h.sequence[130:180])
    batch = make_read_batch("chr1", [(130, "50M", seq, [35] * 50, 60, 0)])
    nb, cig = realign_read_to_haplotype(batch, 0, h)
    assert nb == 130
    assert cigar_to_string(cig) == "20M3I27M"


def test_grouped_assignment_matches_per_block():
    """assign_reads_grouped must reproduce per-block assign_reads exactly
    (hap choice, ambiguity, and best-hap log-likelihoods) across blocks
    with mixed haplotype structures (SNV-only and indel-carrying)."""
    from octopus_tpu.core.tools.read_assigner import assign_reads_grouped

    rng = np.random.default_rng(11)
    jobs = []
    for blk in range(12):
        n = 240 + 40 * blk
        ref = rng.integers(0, 4, n).astype(np.uint8)
        fetch = lambda b, e, ref=ref: ref[b:e]
        mid = n // 2
        if blk % 3 == 0:       # het SNV
            alt = encode_sequence("ACGT"[(int(ref[mid]) + 1) % 4])
            v = Variant.make(mid, ref[mid:mid + 1], alt)
        elif blk % 3 == 1:     # 2bp deletion
            v = Variant.make(mid, ref[mid:mid + 3], ref[mid:mid + 1])
        else:                  # insertion
            v = Variant.make(mid, ref[mid:mid + 1],
                             np.concatenate([ref[mid:mid + 1],
                                             encode_sequence("GT")]))
        h_ref = Haplotype.build(0, n, [], fetch)
        h_alt = Haplotype.build(0, n, [v], fetch)
        reads = []
        for k in range(30):
            src = h_alt if k % 2 else h_ref
            start = int(rng.integers(0, len(src.sequence) - 80))
            seq = list(decode_sequence(src.sequence[start:start + 80]))
            if rng.random() < 0.5:   # sprinkle errors
                p = int(rng.integers(0, 80))
                seq[p] = "ACGT"[(("ACGT".index(seq[p])) + 1) % 4]
            reads.append((start, "80M", "".join(seq), [35] * 80, 60,
                          16 if k % 4 == 0 else 0))
        batch = make_read_batch("chr1", reads)
        jobs.append((batch, [h_ref, h_alt], 0))

    grouped = assign_reads_grouped(jobs)
    for (batch, haps, lo), g in zip(jobs, grouped):
        lazy = assign_reads(batch, haps, list(range(len(haps))), lo)
        assert np.array_equal(g.hap_of_read, lazy.hap_of_read)
        assert np.allclose(g.log_likelihoods, lazy.log_likelihoods,
                           rtol=0, atol=1e-12)
