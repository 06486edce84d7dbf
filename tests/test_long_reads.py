"""Long-read calling path: reads past the Pallas VMEM ceiling ride the
XLA wavefront (pairhmm_batch.pairhmm_scores length gate), and PacBio
error-model labels disable the SNV context model as the reference does
(error_model_factory.cpp presets)."""

import numpy as np

from octopus_tpu.basics.reads import FLAG_REVERSE, make_read_batch
from octopus_tpu.core.callers.individual import CallerConfig, IndividualCaller
from octopus_tpu.core.likelihood.error_models import make_error_models
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def _reference(seed=21, n=8000):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def _long_reads(ref_seq, muts, n_reads=60, read_len=1500, seed=4,
                err=0.005):
    """CCS-style long reads: 1.5 kb, 0.5% random substitution errors."""
    rng = np.random.default_rng(seed)
    hap = list(ref_seq)
    for pos, alt in muts.items():
        hap[pos] = alt
    hap = "".join(hap)
    reads = []
    for i in range(n_reads):
        src = hap if i % 2 == 0 else ref_seq        # het
        begin = int(rng.integers(0, len(src) - read_len))
        s = list(src[begin:begin + read_len])
        for j in range(read_len):
            if rng.random() < err:
                s[j] = "ACGT"[rng.integers(0, 4)]
        reads.append((begin, f"{read_len}M", "".join(s),
                      [23] * read_len, 60, FLAG_REVERSE if i % 2 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def test_pacbio_label_disables_snv_model():
    snv, indel = make_error_models("PCR-FREE.PACBIO-CCS")
    assert snv is None
    assert indel is not None
    snv2, _ = make_error_models("PCR-FREE.HISEQ-2500")
    assert snv2 is not None


def test_long_read_het_snv_called():
    ref, seq = _reference()
    alt = "T" if seq[4000] != "T" else "A"
    batch = _long_reads(seq, {4000: alt})
    cfg = CallerConfig(use_device=False)
    cfg.likelihood.error_model = "PCR-FREE.PACBIO-CCS"
    caller = IndividualCaller(ref, "chr1", cfg)
    calls = caller.call(3000, 5000, [batch])
    hit = [c for c in calls if c.begin == 4000]
    assert hit, f"het SNV at 4000 not called; calls at {[c.begin for c in calls]}"
    assert sorted(hit[0].genotypes[0]) == [0, 1]
