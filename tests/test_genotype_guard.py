"""Genotype-explosion guard: --max-genotypes triggers the max-zygosity
seeded reduction (IndividualCaller::propose_genotypes,
individual_caller.cpp:699-752) in the individual/population/trio paths."""

import time

import numpy as np

from octopus_tpu.core.callers.base import BaseCallerConfig, CallerBase
from octopus_tpu.core.types.genotypes import (generate_all_genotypes,
                                              num_genotypes)


class _Hap:
    def __init__(self, variants):
        self.variants = variants


class _FlatPrior:
    def evaluate_many(self, genotypes):
        return np.zeros(len(genotypes))


class _Ctx:
    def __init__(self, H):
        # haplotype 0 is the reference (no variants)
        self.haplotypes = [_Hap([] if i == 0 else [i]) for i in range(H)]
        self.prior_model = _FlatPrior()


def _caller(max_genotypes):
    c = CallerBase.__new__(CallerBase)
    c.config = BaseCallerConfig(max_genotypes=max_genotypes,
                                use_device=False)
    return c


def _lnl_for_truth(H, R, truth, seed=0):
    """Reads drawn evenly from `truth` haplotypes: lnL[h, r] high when the
    read's source haplotype is h."""
    rng = np.random.default_rng(seed)
    lnL = np.full((H, R), -30.0) + rng.normal(0, 0.1, (H, R))
    for r in range(R):
        lnL[truth[r % len(truth)], r] = -0.1
    return lnL


def test_uncapped_passthrough():
    ctx = _Ctx(6)
    lnL = _lnl_for_truth(6, 20, [0, 1])
    got = _caller(None).propose_genotypes(ctx, 2, lnL)
    assert np.array_equal(got, generate_all_genotypes(6, 2))


def test_hexaploid_explosion_bounded_and_fast():
    H, ploidy, cap = 30, 6, 500
    assert num_genotypes(H, ploidy) > 1_000_000
    truth = [0, 0, 1, 1, 2, 3]          # hexaploid truth genotype
    ctx = _Ctx(H)
    lnL = _lnl_for_truth(H, 60, truth)
    t0 = time.monotonic()
    got = _caller(cap).propose_genotypes(ctx, ploidy, lnL)
    elapsed = time.monotonic() - t0
    assert elapsed < 30.0
    assert got.shape[1] == ploidy
    # the proposal count is pinned well under the full enumeration and
    # near the cap (dedup after extension can keep it below cap * small)
    assert len(got) <= cap * H // 4
    assert len(got) >= 10
    # the data-supported genotype survives the reduction
    want = np.sort(np.asarray(truth))
    assert (np.sort(got, axis=1) == want).all(axis=1).any()
    # hom-ref genotype is retained for QUAL sanity
    assert (got == 0).all(axis=1).any()


def test_cap_reduction_keeps_map_genotype_diploid():
    H, cap = 40, 100
    assert num_genotypes(H, 3) > cap
    truth = [0, 5, 9]
    ctx = _Ctx(H)
    lnL = _lnl_for_truth(H, 45, truth, seed=3)
    got = _caller(cap).propose_genotypes(ctx, 3, lnL)
    assert got.shape[1] == 3
    want = np.sort(np.asarray(truth))
    assert (np.sort(got, axis=1) == want).all(axis=1).any()
