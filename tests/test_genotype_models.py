import numpy as np
import pytest
from math import comb

from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.core.types.genotypes import (
    generate_all_genotypes,
    genotype_counts_matrix,
    genotype_zygosity,
    num_genotypes,
    max_zygosity_genotypes,
)
from octopus_tpu.core.types.variants import Variant, left_align
from octopus_tpu.core.types.haplotypes import Haplotype
from octopus_tpu.core.models.genotype_likelihoods import (
    genotype_log_likelihoods,
    genotype_log_likelihoods_np,
)
from octopus_tpu.core.models.coalescent import (
    CoalescentModel,
    CoalescentParams,
    coalescent_log_prob,
    _coalescent_1type,
)
from octopus_tpu.core.models.individual import IndividualModel, UniformGenotypePriorModel


class TestGenotypes:
    @pytest.mark.parametrize("n,p", [(1, 2), (3, 1), (3, 2), (4, 3), (5, 4), (10, 2)])
    def test_counts(self, n, p):
        g = generate_all_genotypes(n, p)
        assert len(g) == num_genotypes(n, p) == comb(n + p - 1, p)
        # sorted non-decreasing rows, all unique
        assert (np.diff(g, axis=1) >= 0).all()
        assert len(np.unique(g, axis=0)) == len(g)

    def test_zygosity(self):
        g = np.array([[0, 0], [0, 1], [2, 2]])
        assert genotype_zygosity(g).tolist() == [1, 2, 1]

    def test_counts_matrix(self):
        g = np.array([[0, 0], [0, 1]])
        c = genotype_counts_matrix(g, 3)
        assert c.tolist() == [[2, 0, 0], [1, 1, 0]]

    def test_max_zygosity(self):
        g = max_zygosity_genotypes(5, 2)
        assert (genotype_zygosity(g) == 2).all()
        assert len(g) == comb(5, 2)


class TestGenotypeLikelihoods:
    def test_device_matches_host(self):
        rng = np.random.default_rng(0)
        H, R = 7, 40
        lnL = -rng.exponential(3.0, (H, R))
        gts = generate_all_genotypes(H, 2)
        want = genotype_log_likelihoods_np(lnL, gts)
        got = genotype_log_likelihoods(lnL, gts, device=True)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_homozygous_equals_sum(self):
        rng = np.random.default_rng(1)
        lnL = -rng.exponential(2.0, (3, 10))
        gts = np.array([[1, 1]])
        got = genotype_log_likelihoods_np(lnL, gts)
        np.testing.assert_allclose(got[0], lnL[1].sum())

    def test_haploid(self):
        lnL = np.array([[-1.0, -2.0], [-3.0, -4.0]])
        gts = np.array([[0], [1]])
        got = genotype_log_likelihoods_np(lnL, gts)
        np.testing.assert_allclose(got, [-3.0, -7.0])


class TestVariantsHaplotypes:
    def test_haplotype_build_snv(self):
        ref = encode_sequence("ACGTACGTACGT")
        fetch = lambda b, e: ref[b:e]
        v = Variant.make(4, ref[4:5], encode_sequence("T"))
        h = Haplotype.build(0, 12, [v], fetch)
        want = ref.copy()
        want[4] = 3
        assert np.array_equal(h.sequence, want)
        assert h.contains(v)
        assert h.substitution_mask()[4]
        assert h.substitution_mask().sum() == 1

    def test_haplotype_build_indel(self):
        ref = encode_sequence("ACGTACGTACGT")
        fetch = lambda b, e: ref[b:e]
        ins = Variant.make(4, np.zeros(0, np.uint8), encode_sequence("GG"))
        dele = Variant.make(8, ref[8:10], np.zeros(0, np.uint8))
        h = Haplotype.build(0, 12, [ins, dele], fetch)
        assert len(h) == 12 + 2 - 2
        # sequence: ACGT GG ACGT [AC deleted] GT
        assert np.array_equal(h.sequence, encode_sequence("ACGTGGACGTGT"))

    def test_left_align(self):
        # ref:  AACCCG ; deletion of one C at pos 4 shifts to pos 2
        ref = encode_sequence("AACCCG")
        fetch = lambda b, e: ref[b:e]
        v = Variant.make(4, ref[4:5], np.zeros(0, np.uint8))
        la = left_align(v, fetch)
        assert la.begin == 2
        assert la.end == 3


class TestCoalescent:
    def test_single_type_no_sites(self):
        # with k=0 the prior should be close to 1 for small theta
        lp = _coalescent_1type(3, 0, 0.0011)
        assert -0.01 < lp < 0.0

    def test_more_sites_less_probable(self):
        lps = [coalescent_log_prob(3, (k, 0), (0.001, 0.0001)) for k in range(4)]
        assert all(a > b for a, b in zip(lps, lps[1:]))

    def test_model_end_to_end(self):
        ref_codes = encode_sequence("ACGTACGTTTTTACGTACGT")
        fetch = lambda b, e: ref_codes[b:e]
        ref_hap = Haplotype.build(0, 20, [], fetch)
        v1 = Variant.make(2, ref_codes[2:3], encode_sequence("T"))
        v2 = Variant.make(9, ref_codes[9:10], np.zeros(0, np.uint8))  # del in T-run
        h1 = Haplotype.build(0, 20, [v1], fetch)
        h2 = Haplotype.build(0, 20, [v2], fetch)
        model = CoalescentModel(ref_hap)
        model.prime([ref_hap, h1, h2])
        gts = np.array([[0, 0], [0, 1], [1, 2], [2, 2]])
        lps = model.evaluate_many(gts)
        assert lps[0] > lps[1] > lps[2]      # more segregating sites, lower prior
        assert np.isfinite(lps).all()
        # single-index evaluation consistent
        assert lps[1] == pytest.approx(model.evaluate_indices(np.array([0, 1])))


class TestIndividualModel:
    def test_posterior_peaks_on_true_genotype(self):
        rng = np.random.default_rng(2)
        H, R = 4, 60
        # reads drawn from haplotypes 1 and 2 (het genotype)
        lnL = np.full((H, R), -8.0)
        true = np.array([1, 2])
        for r in range(R):
            h = true[r % 2]
            lnL[h, r] = -0.01
        gts = generate_all_genotypes(H, 2)
        model = IndividualModel(UniformGenotypePriorModel(), use_device=False)
        latents = model.evaluate(gts, lnL)
        best = gts[np.argmax(latents.posteriors)]
        assert sorted(best.tolist()) == [1, 2]
        assert latents.posteriors.sum() == pytest.approx(1.0)
        assert np.isfinite(latents.log_evidence)
