import numpy as np
import pytest

from octopus_tpu.io.pedigree import Pedigree
from octopus_tpu.core.models.hardy_weinberg import HardyWeinbergModel
from octopus_tpu.core.types.genotypes import generate_all_genotypes


def test_ped_parse_and_trio(tmp_path):
    ped = tmp_path / "fam.ped"
    ped.write_text(
        "#comment\n"
        "FAM1 NA12878 NA12891 NA12892 2 1\n"
        "FAM1 NA12891 0 0 1 1\n"
        "FAM1 NA12892 0 0 2 1\n")
    p = Pedigree.read(str(ped))
    trio = p.find_trio(["NA12878", "NA12891", "NA12892"])
    assert trio is not None
    assert trio.child == "NA12878"
    assert trio.paternal == "NA12891"
    assert trio.maternal == "NA12892"
    assert p.find_trio(["NA12878", "NA12891"]) is None


def test_hardy_weinberg_normalises():
    hw = HardyWeinbergModel(n_haplotypes=4)
    gts = generate_all_genotypes(4, 2)
    lps = hw.evaluate_many(gts)
    assert np.exp(lps).sum() == pytest.approx(1.0)
    # het more likely than a specific hom under uniform freqs
    het = lps[np.flatnonzero((gts[:, 0] == 0) & (gts[:, 1] == 1))[0]]
    hom = lps[np.flatnonzero((gts[:, 0] == 0) & (gts[:, 1] == 0))[0]]
    assert het == pytest.approx(hom + np.log(2))


def test_timers():
    from octopus_tpu.utils import timers
    timers.enabled = True
    timers.reset()
    with timers.phase("likelihood"):
        pass
    assert "likelihood" in timers.report()
    timers.enabled = False


def test_ploidy_map():
    from octopus_tpu.basics.ploidy import PloidyMap
    pm = PloidyMap.parse(2, ["chrX=1"])
    assert pm.of("chr1") == 2
    assert pm.of("chrX") == 1
    assert pm.of("chrY") == 1     # human builtin
    assert pm.of("chrM") == 1
