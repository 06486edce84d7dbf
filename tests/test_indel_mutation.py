"""Repeat-context indel mutation model (IndelMutationModel parity)."""

import numpy as np
import pytest

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


class TestDeNovoSequencePath:
    """HMM-scored arbitrary-sequence de novo probabilities
    (denovo_model.cpp evaluate_uncached / recalculate_log_probability)."""

    def _model(self):
        from octopus_tpu.core.models.denovo import DeNovoModel
        return DeNovoModel()

    def test_identical_and_snv(self):
        import math
        rng = np.random.default_rng(1)
        parent = rng.integers(0, 4, 120).astype(np.uint8)
        m = self._model()
        assert m.ln_probability_sequences(parent, parent) == 0.0
        child = parent.copy(); child[60] = (child[60] + 1) % 4
        got = m.ln_probability_sequences(child, parent)
        assert got == pytest.approx(math.log(1.3e-8))

    def test_indel_scores_and_ordering(self):
        rng = np.random.default_rng(2)
        parent = rng.integers(0, 4, 150).astype(np.uint8)
        m = self._model()
        del2 = np.concatenate([parent[:50], parent[52:]])
        del5 = np.concatenate([parent[:50], parent[55:]])
        p2 = m.ln_probability_sequences(del2, parent)
        p5 = m.ln_probability_sequences(del5, parent)
        assert p2 < 0 and p5 < p2          # longer indel less probable
        # >= band length difference takes the global-alignment fallback
        del20 = np.concatenate([parent[:50], parent[70:]])
        p20 = m.ln_probability_sequences(del20, parent)
        assert np.isfinite(p20) and p20 < p5

    def test_repeat_context_enrichment(self):
        """An indel inside a long STR is more probable than in unique seq."""
        m = self._model()
        rng = np.random.default_rng(3)
        flank = rng.integers(0, 4, 50).astype(np.uint8)
        str_parent = np.concatenate([flank, np.tile([0, 1], 10).astype(np.uint8),
                                     flank[::-1]])
        del_in_str = np.concatenate([str_parent[:52], str_parent[54:]])
        p_str = m.ln_probability_sequences(del_in_str, str_parent)
        uniq_parent = rng.integers(0, 4, len(str_parent)).astype(np.uint8)
        del_in_uniq = np.concatenate([uniq_parent[:52], uniq_parent[54:]])
        p_uniq = m.ln_probability_sequences(del_in_uniq, uniq_parent)
        assert p_str > p_uniq
