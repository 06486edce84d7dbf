"""Flank-state integration: the calling path discounts mismatches caused by
INACTIVE candidates that fall inside a context's haplotype span
(caller.cpp:1121-1157 + haplotype_likelihood_model.cpp:50-115).

VERDICT round-1 item #2: flank machinery must be live in the product path.
"""

import numpy as np

from octopus_tpu.core.callers.base import calculate_flank_state
from octopus_tpu.core.callers.individual import (IndividualCaller,
                                                 CallerConfig)
from octopus_tpu.core.likelihood.likelihood_array import FlankState
from octopus_tpu.core.types.variants import Variant
from tests.test_population_caller import (make_reference, sample_reads,
                                          other)


def var(begin, ref_len=1, alt_len=1):
    return Variant.make(begin, np.zeros(ref_len, np.uint8),
                        np.ones(alt_len, np.uint8))


class TestCalculateFlankState:
    def test_no_inactive_candidates_means_no_flank(self):
        # haplotype overhangs exist but contain no candidates -> flank empty
        # (caller.cpp:1133-1135 head_region / tail_region)
        fs = calculate_flank_state(100, 400, 200, 300, [var(250)])
        assert fs is None

    def test_lhs_inactive_candidate_sets_flank(self):
        fs = calculate_flank_state(100, 400, 200, 300,
                                   [var(150), var(250)])
        assert fs == FlankState(151 - 100, 0)

    def test_rhs_inactive_candidate_sets_flank(self):
        fs = calculate_flank_state(100, 400, 200, 300,
                                   [var(250), var(350)])
        assert fs == FlankState(0, 400 - 350)

    def test_flank_stops_at_furthest_inactive_candidate(self):
        fs = calculate_flank_state(100, 400, 200, 300,
                                   [var(120), var(180), var(250)])
        assert fs == FlankState(181 - 100, 0)

    def test_boundary_insertion_stays_active(self):
        # leftmost active candidate is an insertion exactly at active begin:
        # the lhs flank shrinks by 1 so it is not counted inactive
        # (caller.cpp:1129-1131)
        ins = var(200, ref_len=0, alt_len=2)
        assert ins.begin == ins.end
        fs = calculate_flank_state(100, 400, 200, 300, [ins, var(250)])
        assert fs is None

    def test_no_active_candidates(self):
        assert calculate_flank_state(100, 400, 200, 300, [var(150)]) is None


def test_flank_discount_raises_likelihoods_near_inactive_site():
    """Reads spanning a neighbouring (inactive) candidate mismatch it inside
    this context's haplotype flank. With flank scoring ON those mismatches
    are discounted, so read likelihoods must improve, and the calls must be
    unchanged."""
    ref, seq = make_reference(seed=31, n=900)
    a1 = other(seq[300])
    a2 = other(seq[520])
    # both SNVs het on the same haplotype; 220bp apart > merge_distance 150
    batch = sample_reads(seq, ({300: a1, 520: a2}, {}), seed=32,
                         n_reads=160, read_len=250)
    v1 = Variant.make(300, np.frombuffer(seq[300].encode(), np.uint8),
                      np.frombuffer(a1.encode(), np.uint8))
    v2 = Variant.make(520, np.frombuffer(seq[520].encode(), np.uint8),
                      np.frombuffer(a2.encode(), np.uint8))
    # encode to base codes as the caller does
    from octopus_tpu.basics.sequence import encode_sequence
    v1 = Variant.make(300, encode_sequence(seq[300]), encode_sequence(a1))
    v2 = Variant.make(520, encode_sequence(seq[520]), encode_sequence(a2))

    def build(use_flank):
        cfg = CallerConfig(use_device=False)
        cfg.likelihood.use_flank_state = use_flank
        caller = IndividualCaller(ref, "chr1", cfg)
        caller._score_cache = {}
        # active region = v1 only; v2 is a known-but-inactive candidate
        return caller._build_context(300, 301, [v1], [batch],
                                     all_candidates=[v1, v2])

    ctx_on = build(True)
    ctx_off = build(False)
    assert ctx_on is not None and ctx_off is not None
    lnl_on, lnl_off = ctx_on.lnL[0], ctx_off.lnL[0]
    assert lnl_on.shape == lnl_off.shape
    # the flank fired: discounted likelihoods strictly improve somewhere
    assert (lnl_on >= lnl_off - 1e-9).all()
    assert (lnl_on > lnl_off + 1e-9).any()

    def run(use_flank):
        cfg = CallerConfig(use_device=False)
        cfg.likelihood.use_flank_state = use_flank
        return IndividualCaller(ref, "chr1", cfg).call(0, 900, [batch])

    calls_on, calls_off = run(True), run(False)
    assert [c.begin for c in calls_on] == [c.begin for c in calls_off]
    assert [c.genotypes for c in calls_on] == [c.genotypes for c in calls_off]
