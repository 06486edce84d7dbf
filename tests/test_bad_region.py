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


def test_multi_sample_normal_depth_not_flagged():
    """The caller assesses each sample against its OWN typical depth
    (the reference's per-sample average_depths map,
    bad_region_detector.hpp:71): an 8-sample cohort at normal per-sample
    coverage must not read as an 8-fold depth spike.  Regression for the
    cell-caller dropout where every somatic+germline active region was
    erased (round 5)."""
    from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
    from octopus_tpu.core.callers.individual import CallerConfig
    from octopus_tpu.core.callers.population import (
        PopulationCaller, PopulationCallerConfig)

    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2000))
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    alt = "T" if seq[1000] != "T" else "A"
    hap = list(seq)
    hap[1000] = alt
    hap = "".join(hap)
    batches = []
    for s in range(8):
        reads = []
        for i in range(400):
            src = hap if i % 2 else seq          # het in every sample
            b = int(rng.integers(0, len(src) - 100))
            reads.append((b, "100M", src[b:b + 100], [37] * 100, 60, 0))
        batches.append(make_read_batch("chr1", reads).sorted_by_begin())
    cfg = PopulationCallerConfig(use_device=False)
    caller = PopulationCaller(ref, "chr1", cfg)
    calls = caller.call(500, 1500, batches)
    hit = [c for c in calls if c.begin == 1000]
    assert hit, ("shared het erased by pooled-depth bad-region flag; "
                 f"calls at {[c.begin for c in calls]}")
