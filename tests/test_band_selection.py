"""Adaptive pair-HMM band selection (VERDICT round-1 items #5/#7).

The reference runs one config-wide band (--max-indel-errors, default 16,
simd_pair_hmm_wrapper.hpp:43-95); we select the smallest sufficient band
per calling context — SNV-only regions keep the fast 8-band kernel,
long-indel regions escalate to 16/32."""

import numpy as np

from octopus_tpu.core.likelihood.likelihood_array import select_band
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.core.callers.individual import (IndividualCaller,
                                                 CallerConfig)
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from tests.test_population_caller import make_reference


def var(dlen):
    return Variant.make(100, np.zeros(dlen + 1, np.uint8),
                        np.zeros(1, np.uint8))


def test_select_band_buckets():
    assert select_band([], 16) == 8
    assert select_band([var(0)], 16) == 8
    assert select_band([var(7)], 16) == 8
    assert select_band([var(8)], 16) == 16       # band b tolerates b-1
    assert select_band([var(15)], 16) == 16
    assert select_band([var(16)], 16) == 16      # capped by the ceiling
    assert select_band([var(16)], 32) == 32
    assert select_band([var(40)], 32) == 32
    assert select_band([var(8)], 8) == 8         # user-lowered ceiling wins


def test_long_deletion_called_with_wide_band():
    """A 12 bp het deletion selects band 16 (reference default band), where
    carrier reads score vs the REFERENCE haplotype with the same in-band
    drift the reference kernel allows; at band 8 those cross-scores clip
    and QUAL/GQ deviate from the reference."""
    ref, seq = make_reference(seed=70, n=700)
    dlen = 12
    site = 300
    rng = np.random.default_rng(71)
    reads = []
    read_len = 110
    for i in range(120):
        begin = int(rng.integers(0, len(seq) - read_len - dlen))
        if i % 2 == 0 and begin + 12 < site and begin + read_len - 12 > site:
            # deletion-carrying read with an aligner-style split CIGAR
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
    caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
    calls = caller.call(0, 700, [batch])
    dels = [c for c in calls
            for v in c.alts if len(v.ref) - len(v.alt) == dlen]
    assert dels, f"12bp deletion not called; calls: {[(c.begin, c.alts) for c in calls]}"
    assert any(0 in gt and 1 in gt for c in dels for gt in c.genotypes)
