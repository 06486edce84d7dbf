import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.callers.population import PopulationCaller, PopulationCallerConfig


def make_reference(seed=0, n=600):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def sample_reads(seq, muts_by_hap, n_reads=80, read_len=90, seed=1):
    rng = np.random.default_rng(seed)
    haps = []
    for muts in muts_by_hap:
        s = list(seq)
        for pos, alt in muts.items():
            s[pos] = alt
        haps.append("".join(s))
    reads = []
    for i in range(n_reads):
        hap = haps[i % len(haps)]
        begin = int(rng.integers(0, len(hap) - read_len))
        reads.append((begin, f"{read_len}M", hap[begin:begin + read_len],
                      [37] * read_len, 60, FLAG_REVERSE if i % 3 == 0 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def other(c):
    return "T" if c != "T" else "A"


@pytest.mark.parametrize("joint", [False, True])
def test_shared_and_private_variants(joint):
    ref, seq = make_reference()
    alt = other(seq[300])
    # sample A: het at 300; sample B: hom ref
    batch_a = sample_reads(seq, ({300: alt}, {}), seed=2)
    batch_b = sample_reads(seq, ({}, {}), seed=3)
    cfg = PopulationCallerConfig(use_device=False, joint_model=joint)
    caller = PopulationCaller(ref, "chr1", cfg)
    calls = caller.call(0, 600, [batch_a, batch_b])
    assert len(calls) == 1
    c = calls[0]
    assert c.begin == 300
    assert sorted(c.genotypes[0]) == [0, 1]       # het in A
    assert c.genotypes[1] == [0, 0]               # ref in B
    assert len(c.genotype_qualities) == 2


@pytest.mark.parametrize("joint", [False, True])
def test_variant_shared_by_all(joint):
    ref, seq = make_reference(seed=5)
    alt = other(seq[250])
    batch_a = sample_reads(seq, ({250: alt}, {250: alt}), seed=6)
    batch_b = sample_reads(seq, ({250: alt}, {}), seed=7)
    cfg = PopulationCallerConfig(use_device=False, joint_model=joint)
    caller = PopulationCaller(ref, "chr1", cfg)
    calls = caller.call(0, 600, [batch_a, batch_b])
    assert len(calls) == 1
    assert calls[0].genotypes[0] == [1, 1]
    assert sorted(calls[0].genotypes[1]) == [0, 1]
