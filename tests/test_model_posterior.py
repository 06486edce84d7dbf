"""Model posteriors (MP/PP): the callers compute real model-check
posteriors (individual_caller.cpp:179-192, population_caller.cpp:241-260,
trio_caller.cpp:458-508, cancer_caller.cpp:246-276) and MP varies
independently of QUAL — a ploidy-model misfit lowers MP while QUAL stays
high, so the default germline clause ``MP < 10`` can fire on a call that
passes ``QUAL < 10``."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import FLAG_REVERSE, make_read_batch
from octopus_tpu.basics.sequence import decode_sequence
from octopus_tpu.core.callers.base import (extend_genotypes,
                                           model_posterior_phred)
from octopus_tpu.core.callers.individual import CallerConfig, IndividualCaller
from octopus_tpu.core.callers.population import (PopulationCaller,
                                                 PopulationCallerConfig)
from octopus_tpu.core.csr.measures import compute_measures
from octopus_tpu.core.csr.threshold import ThresholdFilter
from octopus_tpu.core.tools.vcf_record_factory import site_call_to_record
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def _reference(seed=0, n=800):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def _reads_from_haps(ref_seq, haps_muts, n_reads=90, read_len=100, seed=1):
    """Simulate reads drawn uniformly from len(haps_muts) haplotypes."""
    rng = np.random.default_rng(seed)
    haps = []
    for muts in haps_muts:
        s = list(ref_seq)
        for pos, alt in muts.items():
            s[pos] = alt
        haps.append("".join(s))
    reads = []
    for i in range(n_reads):
        hap = haps[i % len(haps)]
        begin = int(rng.integers(0, len(hap) - read_len))
        seq = hap[begin:begin + read_len]
        reads.append((begin, f"{read_len}M", seq, [37] * read_len, 60,
                      FLAG_REVERSE if i % 2 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def _other(c):
    return "T" if c != "T" else "A"


def test_model_posterior_phred_formula():
    # equal evidences: the 0.9999999 model prior dominates
    assert model_posterior_phred(0.0, 0.0) == pytest.approx(
        -10 * np.log10(1e-7), rel=1e-6)
    # dummy model hugely better: mp -> 0, phred -> 0
    assert model_posterior_phred(-100.0, 0.0) < 1e-3
    # noise evidence only matters when it beats the dummy
    assert model_posterior_phred(0.0, -50.0, -100.0) == pytest.approx(
        model_posterior_phred(0.0, -50.0))
    assert model_posterior_phred(0.0, -100.0, -50.0) == pytest.approx(
        model_posterior_phred(0.0, -50.0))


def test_extend_genotypes_dedups():
    seeds = np.asarray([[0, 1], [1, 1]])
    out = extend_genotypes(seeds, 3)
    assert out.shape[1] == 3
    # rows are sorted multisets and unique
    assert (np.sort(out, axis=1) == out).all()
    assert len(np.unique(out, axis=0)) == len(out)
    # [0,1]+1 and [1,1]+0 both give (0,1,1): deduped
    assert sum((out == [0, 1, 1]).all(axis=1)) == 1


def test_mp_high_for_clean_diploid_het():
    ref, seq = _reference()
    alt = _other(seq[400])
    batch = _reads_from_haps(seq, ({400: alt}, {}))
    caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
    calls = caller.call(0, 800, batch)
    assert len(calls) == 1
    c = calls[0]
    assert c.model_posteriors is not None
    # diploid model fits: MP near the prior ceiling (70 phred)
    assert c.model_posteriors[0] > 30
    # and it reaches the VCF FORMAT field
    rec = site_call_to_record(c, "chr1", ref)
    assert "MP" in rec.format_keys
    assert rec.sample_values[0]["MP"] == round(c.model_posteriors[0], 2)


def test_mp_low_on_ploidy_misfit_while_qual_passes():
    """Three distinct haplotypes at ~1/3 each in a nominally diploid
    sample: the ploidy+1 dummy model explains the reads far better, so MP
    collapses while the variant itself remains certain (QUAL high).  The
    default germline clause MP < 10 fires; QUAL < 10 does not."""
    ref, seq = _reference(seed=5)
    a1, a2, a3 = _other(seq[390]), _other(seq[410]), _other(seq[430])
    batch = _reads_from_haps(
        seq, ({390: a1}, {410: a2}, {430: a3}), n_reads=120, seed=7)
    caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
    calls = caller.call(0, 800, batch)
    assert calls, "misfit scene still produces calls"
    mp = min(c.model_posteriors[0] for c in calls)
    qual = max(c.quality for c in calls)
    assert qual > 10            # the variant is certain
    assert mp < 10              # ...but the diploid model is rejected
    # the default germline expression fires MP10 but not QUAL10
    filt = ThresholdFilter()
    low_mp_call = min(calls, key=lambda c: c.model_posteriors[0])
    m = compute_measures(low_mp_call, batch)
    failed = filt.classify(m)
    assert "MP10" in failed
    assert "QUAL10" not in failed


def test_population_mp_per_sample():
    ref, seq = _reference(seed=9)
    alt = _other(seq[400])
    clean = _reads_from_haps(seq, ({400: alt}, {}), n_reads=80, seed=2)
    misfit = _reads_from_haps(
        seq, ({390: _other(seq[390])}, {410: _other(seq[410])},
              {430: _other(seq[430])}), n_reads=120, seed=3)
    caller = PopulationCaller(ref, "chr1",
                              PopulationCallerConfig(use_device=False))
    calls = caller.call(0, 800, [clean, misfit])
    assert calls
    c = calls[0]
    assert c.model_posteriors is not None and len(c.model_posteriors) == 2
    # the misfit sample's MP is lower than the clean sample's
    assert c.model_posteriors[1] < c.model_posteriors[0]
