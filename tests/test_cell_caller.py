import numpy as np
import pytest

from octopus_tpu.core.callers.cell import CellCaller, CellCallerConfig
from tests.test_population_caller import make_reference, sample_reads, other


def test_clonal_somatic_in_subset_of_cells():
    ref, seq = make_reference(seed=80)
    alt = other(seq[300])
    # 4 cells: two carry a het somatic variant, two do not
    cells = [
        sample_reads(seq, ({300: alt}, {}), seed=81, n_reads=60),
        sample_reads(seq, ({300: alt}, {}), seed=82, n_reads=60),
        sample_reads(seq, ({}, {}), seed=83, n_reads=60),
        sample_reads(seq, ({}, {}), seed=84, n_reads=60),
    ]
    cfg = CellCallerConfig(use_device=False)
    cfg.scanner.inclusion = "cell"
    caller = CellCaller(ref, "chr1", cfg)
    calls = caller.call(0, 600, cells)
    assert len(calls) == 1
    c = calls[0]
    assert c.begin == 300
    assert c.info.get("SOMATIC") is True
    assert c.info.get("CELLS") == 2
    # carrier cells get the somatic allele in their genotype
    assert any(1 in gt for gt in c.genotypes[:2])
    assert all(1 not in gt for gt in c.genotypes[2:])


def test_germline_het_all_cells():
    ref, seq = make_reference(seed=90)
    alt = other(seq[250])
    cells = [sample_reads(seq, ({250: alt}, {}), seed=91 + i, n_reads=60)
             for i in range(3)]
    cfg = CellCallerConfig(use_device=False)
    cfg.scanner.inclusion = "cell"
    caller = CellCaller(ref, "chr1", cfg)
    calls = caller.call(0, 600, cells)
    assert len(calls) == 1
    assert "SOMATIC" not in calls[0].info
    assert all(sorted(gt) == [0, 1] for gt in calls[0].genotypes)
