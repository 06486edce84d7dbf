"""Repeat-context indel mutation model (IndelMutationModel parity)."""

import numpy as np

from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.core.models.indel_mutation import (ContextIndelModel,
                                                    IndelMutationParams,
                                                    enrichment,
                                                    extension_probability,
                                                    gap_open_prior)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_extension_matches_reference_formula():
    # spot values verified against the reference's generated table
    # (indel_mutation_model_config.hpp): sigmoid ramps at whole periods,
    # 1.0 mid-period, base ramp restarting past the tract
    assert abs(extension_probability(1, 0, 0) - _sigmoid(-3)) < 1e-12
    assert abs(extension_probability(1, 0, 5) - _sigmoid(2)) < 1e-12
    # period 1, 10 periods: logit = sqrt(10) - 3 + gap inside the tract
    for g in range(10):
        want = _sigmoid(np.sqrt(10) - 3 + g)
        assert abs(extension_probability(1, 10, g) - want) < 1e-12
    # beyond the tract the base ramp restarts
    assert abs(extension_probability(1, 10, 10) - _sigmoid(-3)) < 1e-12
    assert abs(extension_probability(1, 3, 3) - _sigmoid(-3)) < 1e-12
    # mid-period positions must extend
    assert extension_probability(2, 5, 1) == 1.0
    assert extension_probability(3, 4, 2) == 1.0
    # whole-period with the base-ramp max: p2 n5 gap 8 -> max(4.162, 5) = 5
    assert abs(extension_probability(2, 5, 8) - _sigmoid(5.0)) < 1e-12
    # long-tract sqrt cap at 49
    assert abs(extension_probability(1, 50, 0) - _sigmoid(np.sqrt(49) - 3)) < 1e-12


def test_enrichment_monotone_and_anchored():
    # anchored to the Montgomery-derived curve at knots
    assert enrichment(1, 0) == 1.0
    assert abs(enrichment(1, 4) - 2.64) < 0.01
    assert abs(enrichment(1, 10) - 256.23) / 256.23 < 0.01
    assert abs(enrichment(2, 5) - 26.09) / 26.09 < 0.01
    # monotone in num_periods, saturating
    vals = [enrichment(1, n) for n in range(31)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    assert enrichment(1, 100) == vals[30]


def test_context_model_enriches_repeat_tracts():
    seq = encode_sequence("ACGTCTGA" + "AT" * 12 + "CGCGTTGACC")
    m = ContextIndelModel(seq, IndelMutationParams(indel_mutation_prior=1e-4))
    base = 1e-4
    # first period of the AT tract is enriched
    assert m.gap_open[8] > 50 * base
    # far from repeats: base prior
    assert m.gap_open[2] == base
    # a 2bp (one-unit) indel in the tract is much more likely than a 3bp one
    p2 = m.indel_probability(8, 2)
    p3 = m.indel_probability(8, 3)
    assert p2 > p3
    # mid-period extension is free: p(2bp) == p(1bp-extended-by-certainty)
    assert p2 == m.indel_probability(8, 1) * extension_probability(
        2, 12, 1, open_prior=float(m.gap_open[8]))


def test_indel_probability_decays_out_of_tract():
    seq = encode_sequence("A" * 20 + "CGTACGTACG")
    m = ContextIndelModel(seq)
    # homopolymer start enriched vs complex context
    assert m.indel_probability(0, 1) > 100 * m.indel_probability(25, 1)
    # size decay in complex sequence ~ sigmoid ramp product
    p1 = m.indel_probability(25, 1)
    p4 = m.indel_probability(25, 4)
    assert p4 < p1
