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


def test_tables_bit_exact_vs_reference_golden():
    """The shipped npz is byte-identical to the reference's generated
    tables (indel_mutation_model_config.hpp), re-dumped in place by
    tests/golden/golden_indel_table.cpp."""
    import os
    import subprocess
    from octopus_tpu.core.models.indel_mutation import (ENRICHMENT_TABLE,
                                                        EXTENSION_TABLE)
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "golden_indel_table")
    if not os.path.exists(golden):
        pytest.skip("golden_indel_table binary not built")
    raw = np.frombuffer(subprocess.run([golden], stdout=subprocess.PIPE,
                                       check=True).stdout, dtype="<f8")
    assert raw.size == 11 * 31 + 11 * 51 * 101
    assert np.array_equal(raw[:11 * 31].reshape(11, 31), ENRICHMENT_TABLE)
    assert np.array_equal(raw[11 * 31:].reshape(11, 51, 101), EXTENSION_TABLE)


def test_extension_matches_reference_table():
    # table spot values copied by eye from indel_mutation_model_config.hpp
    assert abs(extension_probability(1, 0, 0) - _sigmoid(-3)) < 1e-12
    # mid-period positions must extend
    assert extension_probability(2, 5, 1) == 1.0
    assert extension_probability(3, 4, 2) == 1.0
    # gap clamps at the table edge (gap 100)
    assert extension_probability(1, 0, 1000) == extension_probability(1, 0, 100)
    # the floor at the open prior applies
    assert extension_probability(1, 0, 0, open_prior=0.5) == 0.5


def test_enrichment_anchored_exact():
    # exact table values (indel_mutation_model_config.hpp rows 1 and 2)
    assert enrichment(1, 0) == 1.0
    assert enrichment(1, 4) == 2.64
    assert enrichment(1, 10) == 256.23
    assert enrichment(2, 5) == 26.09
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
