import numpy as np
from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.core.tools.bad_region_detector import (
    Severity, assess_region, median_depth)


def _batch(n, begin_lo, begin_hi, seed=0, L=60):
    rng = np.random.default_rng(seed)
    reads = []
    for _ in range(n):
        b = int(rng.integers(begin_lo, begin_hi))
        reads.append((b, f"{L}M", "A" * L, [30] * L, 60, 0))
    return make_read_batch("chr1", reads)


def test_normal_region_ok():
    b = _batch(60, 0, 1000)
    typical = median_depth(b)
    assert assess_region(b, 400, 600, 3, typical) == Severity.NONE


def test_collapsed_repeat_flags_high():
    # background plus a massive pileup with saturated candidates
    bg = _batch(60, 0, 1000)
    pile = _batch(600, 480, 520, seed=1)
    from octopus_tpu.basics.reads import ReadBatch
    b = ReadBatch.concatenate([bg, pile]).sorted_by_begin()
    typical = median_depth(bg)
    assert assess_region(b, 480, 580, 60, typical) == Severity.HIGH
