"""Multi-chip sharding in the REAL calling pipeline (VERDICT round-1 item
#4): every big pair-HMM launch and genotype reduction shards over
jax.devices(); results must be identical to the single-device path.

The suite runs on the 8-device virtual CPU mesh (conftest.py)."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.device_count() < 2,
                                reason="needs a multi-device mesh")


def test_sharded_pairhmm_scores_equal_single_device():
    from octopus_tpu.core.likelihood.pairhmm_batch import (
        pairhmm_scores, pairhmm_scores_xla)
    rng = np.random.default_rng(0)
    B, R, pad = 16 * jax.device_count(), 48, 8
    W = R + 2 * pad - 1
    args = tuple(a.astype(np.int32) for a in (
        rng.integers(0, 4, (B, R)), rng.integers(10, 40, (B, R)),
        rng.integers(0, 4, (B, W)), rng.integers(20, 45, (B, W)),
        rng.integers(1, 6, (B, W)), rng.integers(0, 4, (B, W)),
        rng.integers(3, 50, (B, W))))
    got = np.asarray(pairhmm_scores(*args, pad=pad))
    want = np.asarray(pairhmm_scores_xla(*args, pad=pad))
    assert np.array_equal(got, want)


def test_sharded_genotype_reduction_matches_host():
    from octopus_tpu.core.models.genotype_likelihoods import (
        genotype_log_likelihoods, genotype_log_likelihoods_np)
    from octopus_tpu.core.types.genotypes import generate_all_genotypes
    rng = np.random.default_rng(1)
    H, R = 12, 512
    lnL = -rng.exponential(3.0, (H, R))
    gts = generate_all_genotypes(H, 2)
    # force the device path (above the tiny-reduction threshold check)
    got = genotype_log_likelihoods(np.repeat(lnL, 2, axis=1)[:, :R * 2],
                                   gts, device=True)
    want = genotype_log_likelihoods_np(
        np.repeat(lnL, 2, axis=1)[:, :R * 2], gts)
    assert np.allclose(got, want, rtol=2e-4, atol=2e-3)


def test_real_window_calls_identical_with_and_without_mesh(tmp_path):
    from octopus_tpu.core.callers.individual import (CallerConfig,
                                                     IndividualCaller)
    from octopus_tpu.utils.synthetic import simulate_diploid
    from octopus_tpu.io.bam import BamFile
    from octopus_tpu.io.fasta import IndexedFasta, ReferenceGenome

    fa, bam, truth, n = simulate_diploid(str(tmp_path), kb=4, depth=14,
                                         seed=3)
    reference = ReferenceGenome(IndexedFasta(fa))
    batch = next(iter(BamFile(bam).fetch("chr1", 0, n).values()))

    def call_all():
        caller = IndividualCaller(reference, "chr1", CallerConfig())
        return [(c.begin, tuple(sorted(c.genotypes[0])), round(c.quality, 3))
                for c in caller.call(0, n, [batch])]

    sharded = call_all()
    os.environ["OCTOPUS_TPU_NO_SHARD"] = "1"
    try:
        single = call_all()
    finally:
        del os.environ["OCTOPUS_TPU_NO_SHARD"]
    assert sharded
    assert sharded == single
