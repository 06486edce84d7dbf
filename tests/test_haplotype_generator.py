"""Stateful HaplotypeGenerator: walker stepping, lagging, holdout,
and dense-region calling through the base caller."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.core.hapgen.haplotype_generator import (
    GeneratorLimits, HaplotypeGenerator)
from octopus_tpu.core.hapgen.walker import GenomeWalker, WalkerConfig
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def _ref(n=4000, seed=1):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    return codes


def _snv_at(codes, pos):
    return Variant.make(pos, codes[pos:pos + 1],
                        np.asarray([(codes[pos] + 1) % 4], np.uint8))


def test_walker_steps_cover_all_candidates():
    codes = _ref()
    cands = [_snv_at(codes, p) for p in range(100, 3000, 40)]
    w = GenomeWalker(cands, WalkerConfig(max_included=10))
    seen = []
    while not w.done():
        step = w.walk()
        seen.extend(step.included[step.n_indicators:])
    assert len(seen) == len(cands)
    # lagging carries indicators
    w2 = GenomeWalker(cands, WalkerConfig(max_included=10, lagging_level="moderate"))
    first = w2.walk()
    second = w2.walk()
    assert first.n_indicators == 0
    assert second.n_indicators == 4
    assert second.included[:4] == first.included[-4:]


def _reads_over(codes, begin, end, variants_on_hap1, n=120, L=100, seed=0):
    rng = np.random.default_rng(seed)
    reads = []
    vpos = {v.begin: v for v in variants_on_hap1}
    for i in range(n):
        start = int(rng.integers(begin, max(end - L, begin + 1)))
        c = codes[start:start + L].copy()
        if i % 2 == 0:
            for p, v in vpos.items():
                if start <= p < start + L:
                    c[p - start] = np.frombuffer(v.alt, np.uint8)[0]
        reads.append((start, f"{L}M", "".join("ACGT"[x] for x in c),
                      [35] * L, 60, 0))
    return make_read_batch("chr1", reads)


def test_generator_packets_cover_stream_with_lagging():
    codes = _ref()
    cands = [_snv_at(codes, p) for p in range(200, 2600, 60)]   # 40 candidates
    batch = _reads_over(codes, 100, 2800, cands)
    fetch = lambda b, e: codes[b:e]
    gen = HaplotypeGenerator(cands, fetch, [batch],
                             GeneratorLimits(target=64, lagging_level="moderate"))
    covered = set()
    n_packets = 0
    while not gen.done():
        packet = gen.generate()
        if packet is None:
            break
        n_packets += 1
        covered.update(v.begin for v in packet.variants)
        assert len(packet.haplotypes) >= 2
        assert len(packet.haplotypes) <= 64 + 1
    assert n_packets > 1                       # really stepped
    assert covered == {v.begin for v in cands}


def test_generator_holdout_defers_dense_groups():
    codes = _ref()
    # a dense pile: 14 overlapping alternates at one spot + spread SNVs
    dense = []
    for k in range(14):
        dense.append(Variant.make(500, codes[500:502],
                                  np.asarray([(codes[500] + 1 + k) % 4,
                                              (codes[501] + k) % 4], np.uint8)))
    spread = [_snv_at(codes, p) for p in range(600, 1400, 50)]
    cands = dense + spread
    batch = _reads_over(codes, 400, 1500, spread)
    fetch = lambda b, e: codes[b:e]
    gen = HaplotypeGenerator(cands, fetch, [batch],
                             GeneratorLimits(target=16, holdout=32,
                                             max_holdout_depth=4))
    total_variants = set()
    while not gen.done():
        p = gen.generate()
        if p is None:
            break
        total_variants.update((v.begin, v.alt) for v in p.variants)
    # nothing silently dropped: every candidate appears in some packet
    assert {(v.begin, v.alt) for v in cands} <= total_variants


def test_dense_region_calls_through_base_caller():
    from octopus_tpu.core.callers.individual import CallerConfig, IndividualCaller
    codes = _ref(seed=7)
    reference = ReferenceGenome(InMemoryReference(
        {"chr1": "".join("ACGT"[c] for c in codes)}))
    positions = list(range(300, 2400, 70))   # 30 het SNVs -> generator path
    cands = [_snv_at(codes, p) for p in positions]
    batch = _reads_over(codes, 200, 2500, cands, n=400, seed=3)
    caller = IndividualCaller(reference, "chr1", CallerConfig())
    calls = caller.call(250, 2450, [batch])
    called_pos = {c.begin for c in calls}
    hit = sum(1 for p in positions if p in called_pos)
    assert hit >= len(positions) * 0.9
    for c in calls:
        if c.begin in positions:
            gt = sorted(c.genotypes[0])
            assert gt == [0, 1]


def test_generated_haplotypes_cover_read_overhangs():
    # Regression: a narrow variant cluster with long overlapping reads used
    # to produce haplotypes shorter than read_len + 2*band, crashing the
    # likelihood array (the reference skips such regions via
    # ShortHaplotypeError, caller.cpp:1182-1188; we expand the region).
    codes = _ref()
    cands = [_snv_at(codes, p) for p in (500, 510, 520)]
    # a 3bp deletion also shrinks the haplotype sequence
    cands.append(Variant.make(530, codes[530:534], codes[530:531]))
    reads = _reads_over(codes, 360, 680, cands[:1], n=40, L=150)
    gen = HaplotypeGenerator(
        cands, lambda b, e: codes[b:e], [reads],
        GeneratorLimits(target=64), pad=4)
    pad = 8  # default LikelihoodConfig.max_indel_error
    packets = 0
    while not gen.done():
        packet = gen.generate()
        if packet is None:
            break
        packets += 1
        ov = reads.overlapping(packet.active_begin, packet.active_end)
        if not len(ov):
            continue
        for h in packet.haplotypes:
            for r in range(len(ov)):
                rl = int(ov.lengths()[r])
                assert len(h.sequence) >= rl + 2 * pad
    assert packets >= 1


def test_short_haplotype_error_type():
    from octopus_tpu.core.likelihood.likelihood_array import (
        HaplotypeLikelihoodArray, LikelihoodConfig, ShortHaplotypeError)
    codes = _ref(200)
    reads = _reads_over(codes, 0, 160, [], n=4, L=150)
    arr = HaplotypeLikelihoodArray(LikelihoodConfig())
    with pytest.raises(ShortHaplotypeError):
        arr.populate([reads], [codes[40:191]], 40)
