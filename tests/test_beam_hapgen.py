"""Dense-region haplotype growth with likelihood pruning."""
import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.core.callers.individual import IndividualCaller, CallerConfig
from tests.test_population_caller import make_reference, other


def test_dense_region_all_variants_callable():
    """12 nearby het SNVs (2^12 = 4096 haplotype combos > cap) all called."""
    ref, seq = make_reference(seed=100, n=800)
    positions = list(range(300, 420, 10))          # 12 sites, 10bp apart
    alts = {p: other(seq[p]) for p in positions}
    hapA = list(seq)
    for p in positions:
        hapA[p] = alts[p]
    hapA = "".join(hapA)
    rng = np.random.default_rng(101)
    reads = []
    for i in range(160):
        hap = hapA if i % 2 == 0 else seq
        begin = int(rng.integers(200, 430))
        reads.append((begin, "90M", hap[begin:begin + 90], [37] * 90, 60,
                      FLAG_REVERSE if i % 3 == 0 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    cfg = CallerConfig(use_device=False, max_haplotypes=50)
    caller = IndividualCaller(ref, "chr1", cfg)
    calls = caller.call(0, 800, batch)
    called_pos = {c.begin for c in calls}
    assert called_pos.issuperset(set(positions)), \
        sorted(set(positions) - called_pos)
    # all het and phased onto the same haplotype
    for c in calls:
        if c.begin in alts:
            assert sorted(c.genotype) == [0, 1]
