"""Large-cohort joint population calling: the EM-marginal + top-k tuple
reduction (population_model.cpp:492-615) keeps joint calling alive at ANY
cohort size, and the joint prior recovers a shared rare variant that the
independent fallback misses."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import FLAG_REVERSE, make_read_batch
from octopus_tpu.core.callers.population import (PopulationCaller,
                                                 PopulationCallerConfig)
from octopus_tpu.core.models.population_em import (
    em_genotype_marginals, propose_genotype_combinations,
    select_top_k_genotypes, select_top_k_tuples)
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def _reference(seed=0, n=600):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def _sample_reads(ref_seq, muts, n_reads, read_len=100, seed=1,
                  alt_every=2):
    rng = np.random.default_rng(seed)
    hap = list(ref_seq)
    for pos, alt in muts.items():
        hap[pos] = alt
    hap = "".join(hap)
    reads = []
    for i in range(n_reads):
        # every alt_every-th read from the mutated haplotype (het with
        # allele-sampling skew)
        src = hap if i % alt_every == 0 else ref_seq
        begin = int(rng.integers(max(0, 300 - read_len + 10), 300))
        seq = src[begin:begin + read_len]
        # modest base quality: two alt observations are individually
        # insufficient against the coalescent prior, but shared across
        # carriers the joint prior is paid once
        reads.append((begin, f"{read_len}M", seq, [21] * read_len, 60,
                      FLAG_REVERSE if i % 2 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


class TestEmReduction:
    def test_top_k_tuples_order_and_content(self):
        marg = np.asarray([[0.7, 0.2, 0.1],
                           [0.1, 0.8, 0.1],
                           [0.5, 0.25, 0.25]])
        out = select_top_k_tuples(marg, 4)
        assert out.shape == (4, 3)
        # best tuple is the per-sample argmax
        assert list(out[0]) == [0, 1, 0]
        # scores descend
        scores = [np.prod([marg[s, g] for s, g in enumerate(t)]) for t in out]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:]))
        # no duplicates
        assert len({tuple(t) for t in out}) == 4

    def test_select_top_k_genotypes_votes(self):
        marg = np.asarray([[0.9, 0.05, 0.05],
                           [0.8, 0.1, 0.1],
                           [0.1, 0.85, 0.05]])
        top = select_top_k_genotypes(marg, 1)
        assert top[0] == 0            # two of three samples vote genotype 0

    def test_propose_includes_hom_ref_and_caps(self):
        rng = np.random.default_rng(0)
        S, G = 6, 10
        marg = rng.dirichlet(np.ones(G), size=S)
        genotypes = np.stack([np.zeros(2, np.int64)] * G)
        out = propose_genotype_combinations(genotypes, marg, 50,
                                            hom_ref_idx=7)
        assert out.shape[1] == S
        assert len(out) <= 50 + S * (S // 2)
        assert (out == 7).all(axis=1).any()

    def test_em_marginals_concentrate_on_truth(self):
        # two haplotypes; 8 samples all het -> EM frequencies ~0.5/0.5 and
        # the het genotype's marginal dominates for every sample
        genotypes = np.asarray([[0, 0], [0, 1], [1, 1]])
        S = 8
        loglik = np.tile(np.asarray([-40.0, -2.0, -40.0]), (S, 1))
        marg = em_genotype_marginals(genotypes, loglik, 2)
        assert marg.shape == (S, 3)
        assert (marg.argmax(axis=1) == 1).all()


class TestTenSampleJoint:
    DEPTH = 6

    def _cohort(self, joint: bool, cap: int = 800):
        ref, seq = _reference(seed=11)
        alt = "T" if seq[300] != "T" else "A"
        carriers = {0, 4, 9}
        batches = []
        for s in range(10):
            muts = {300: alt} if s in carriers else {}
            # carriers get thin support: depth 6, only 2 in 6 reads alt
            batches.append(_sample_reads(seq, muts, self.DEPTH, seed=100 + s,
                                         alt_every=3))
        cfg = PopulationCallerConfig(use_device=False, joint_model=joint,
                                     max_genotype_combinations=cap)
        caller = PopulationCaller(ref, "chr1", cfg)
        calls = caller.call(250, 350, batches)
        return calls, carriers

    def test_joint_recovers_what_independent_misses(self):
        joint_calls, carriers = self._cohort(joint=True)
        indep_calls, _ = self._cohort(joint=False)

        def called_carriers(calls):
            got = set()
            for c in calls:
                if c.begin == 300:
                    for s, gt in enumerate(c.genotypes):
                        if any(a > 0 for a in gt):
                            got.add(s)
            return got

        joint_car = called_carriers(joint_calls)
        indep_car = called_carriers(indep_calls)
        # the joint prior shares the variant across carriers: every carrier
        # genotyped; thin evidence makes the independent path drop some
        assert joint_car == carriers
        assert indep_car < carriers
        # and nobody else is genotyped as a carrier (no FP GTs)
        assert not joint_car - carriers

    def test_ten_sample_joint_uses_reduction_and_is_bounded(self):
        # G^10 blows any cap here; the EM reduction must kick in and the
        # call still completes quickly with per-sample MP emitted
        calls, carriers = self._cohort(joint=True, cap=500)
        assert calls
        c = next(c for c in calls if c.begin == 300)
        assert len(c.genotypes) == 10
        assert c.model_posteriors is not None and len(c.model_posteriors) == 10
