import numpy as np
import pytest

from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.callers.trio import TrioCaller, TrioCallerConfig
from tests.test_population_caller import make_reference, sample_reads, other


def test_inherited_het_not_denovo():
    ref, seq = make_reference(seed=10)
    alt = other(seq[300])
    mom = sample_reads(seq, ({300: alt}, {}), seed=11)       # het mother
    dad = sample_reads(seq, ({}, {}), seed=12)               # ref father
    kid = sample_reads(seq, ({300: alt}, {}), seed=13)       # het child (inherited)
    caller = TrioCaller(ref, "chr1", TrioCallerConfig(use_device=False))
    calls = caller.call(0, 600, [mom, dad, kid])
    assert len(calls) == 1
    c = calls[0]
    assert sorted(c.genotypes[0]) == [0, 1]   # mother het
    assert c.genotypes[1] == [0, 0]           # father ref
    assert sorted(c.genotypes[2]) == [0, 1]   # child het
    assert "DENOVO" not in c.info


def test_denovo_flagged():
    ref, seq = make_reference(seed=20)
    alt = other(seq[250])
    mom = sample_reads(seq, ({}, {}), seed=21)
    dad = sample_reads(seq, ({}, {}), seed=22)
    kid = sample_reads(seq, ({250: alt}, {}), seed=23, n_reads=120)
    caller = TrioCaller(ref, "chr1", TrioCallerConfig(use_device=False))
    calls = caller.call(0, 600, [mom, dad, kid])
    assert len(calls) == 1
    c = calls[0]
    assert c.genotypes[0] == [0, 0]
    assert c.genotypes[1] == [0, 0]
    assert sorted(c.genotypes[2]) == [0, 1]
    assert c.info.get("DENOVO") is True


def test_hom_parents_hom_child():
    ref, seq = make_reference(seed=30)
    alt = other(seq[350])
    mom = sample_reads(seq, ({350: alt}, {350: alt}), seed=31)
    dad = sample_reads(seq, ({350: alt}, {350: alt}), seed=32)
    kid = sample_reads(seq, ({350: alt}, {350: alt}), seed=33)
    caller = TrioCaller(ref, "chr1", TrioCallerConfig(use_device=False))
    calls = caller.call(0, 600, [mom, dad, kid])
    assert len(calls) == 1
    assert all(gt == [1, 1] for gt in calls[0].genotypes)
    assert "DENOVO" not in calls[0].info
