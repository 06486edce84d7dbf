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


def test_denovo_pp_depth_calibration():
    """Pins the BASELINE.md round-3 calibration claim: the de novo
    classification posterior (INFO PP) sits far below the reference's
    default 'PP < 40' de novo filter clause at low depth (the competing
    'parent het with zero alt reads' hypothesis keeps ~2^-depth x
    het-prior mass), crosses it around ~30x, and clears it decisively at
    ~60x — so depth-60 trio configs reach PASS de novo recall 1.0 while
    30x sits at the threshold knee.  The caller flags DENOVO at every
    depth; only the filter outcome changes."""
    from octopus_tpu.core.csr.threshold import ThresholdFilter

    pps = {}
    for n_reads in (100, 200, 400):        # site depth ~15x / ~30x / ~60x
        ref, seq = make_reference(seed=40)
        alt = other(seq[250])
        mom = sample_reads(seq, ({}, {}), seed=41, n_reads=n_reads)
        dad = sample_reads(seq, ({}, {}), seed=42, n_reads=n_reads)
        kid = sample_reads(seq, ({250: alt}, {}), seed=43, n_reads=n_reads)
        caller = TrioCaller(ref, "chr1", TrioCallerConfig(use_device=False))
        calls = caller.call(0, 600, [mom, dad, kid])
        dn = [c for c in calls if c.info.get("DENOVO")]
        assert len(dn) == 1, f"de novo not flagged at n_reads={n_reads}"
        pps[n_reads] = float(dn[0].info["PP"])
    assert pps[100] < 30                      # far below the clause
    assert 20 < pps[200] < 60                 # the ~phred-40 knee at 30x
    assert pps[400] > 60                      # decisively past it
    assert pps[100] < pps[200] < pps[400]     # monotone in depth
    # through the reference's default de novo expression (PP < 40 clause):
    t = ThresholdFilter()
    assert any(f.startswith("PP") for f in
               t.classify({"PP": pps[100]}, denovo=True))
    assert not any(f.startswith("PP") for f in
                   t.classify({"PP": pps[400]}, denovo=True))
