import numpy as np
import pytest

from octopus_tpu.core.callers.cancer import CancerCaller, CancerCallerConfig
from octopus_tpu.core.callers.polyclone import PolycloneCaller, PolycloneCallerConfig
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from tests.test_population_caller import make_reference, sample_reads, other


def mixed_reads(seq, muts_and_fracs, n_reads=150, read_len=90, seed=1):
    """Reads from weighted haplotypes: [(muts_dict, fraction), ...]."""
    rng = np.random.default_rng(seed)
    haps, fracs = [], []
    for muts, f in muts_and_fracs:
        s = list(seq)
        for pos, alt in muts.items():
            s[pos] = alt
        haps.append("".join(s))
        fracs.append(f)
    fracs = np.asarray(fracs) / sum(fracs)
    reads = []
    for i in range(n_reads):
        hap = haps[rng.choice(len(haps), p=fracs)]
        begin = int(rng.integers(0, len(hap) - read_len))
        reads.append((begin, f"{read_len}M", hap[begin:begin + read_len],
                      [37] * read_len, 60, FLAG_REVERSE if i % 3 == 0 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


class TestCancerCaller:
    def test_germline_het_called_as_germline(self):
        ref, seq = make_reference(seed=40)
        alt = other(seq[300])
        tumour = sample_reads(seq, ({300: alt}, {}), seed=41)
        normal = sample_reads(seq, ({300: alt}, {}), seed=42)
        caller = CancerCaller(ref, "chr1",
                              CancerCallerConfig(use_device=False, normal_sample=1))
        calls = caller.call(0, 600, [tumour, normal])
        assert len(calls) >= 1
        germ = [c for c in calls if not c.info.get("SOMATIC")]
        assert len(germ) == 1
        assert sorted(germ[0].genotypes[0]) == [0, 1]

    def test_low_frequency_somatic_flagged(self):
        ref, seq = make_reference(seed=50)
        alt = other(seq[300])
        # tumour: 20% somatic fraction; normal: clean
        tumour = mixed_reads(seq, [({300: alt}, 0.2), ({}, 0.8)], seed=51,
                             n_reads=300)
        normal = sample_reads(seq, ({}, {}), seed=52, n_reads=150)
        cfg = CancerCallerConfig(use_device=False, normal_sample=1)
        cfg.scanner.inclusion = "somatic"
        cfg.scanner.normal_sample = 1
        caller = CancerCaller(ref, "chr1", cfg)
        calls = caller.call(0, 600, [tumour, normal])
        som = [c for c in calls if c.info.get("SOMATIC")]
        assert len(som) == 1
        assert som[0].begin == 300


class TestPolycloneCaller:
    def test_two_clones_detected(self):
        ref, seq = make_reference(seed=60)
        a1 = other(seq[200])
        a2 = other(seq[400])
        batch = mixed_reads(seq, [({200: a1}, 0.6), ({400: a2}, 0.4)],
                            seed=61, n_reads=250)
        caller = PolycloneCaller(ref, "chr1",
                                 PolycloneCallerConfig(use_device=False))
        calls = caller.call(0, 600, batch and [batch])
        positions = {c.begin for c in calls}
        assert positions == {200, 400}

    def test_single_clone(self):
        ref, seq = make_reference(seed=70)
        a1 = other(seq[250])
        batch = mixed_reads(seq, [({250: a1}, 1.0)], seed=71, n_reads=100)
        caller = PolycloneCaller(ref, "chr1",
                                 PolycloneCallerConfig(use_device=False))
        calls = caller.call(0, 600, [batch])
        assert len(calls) == 1
        assert calls[0].begin == 250
        assert calls[0].info["CLONES"] == 1
