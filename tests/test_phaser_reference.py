"""Phase quality anchored to the reference's definition: PQ is the phred of
the ABSOLUTE posterior mass on non-MAP haplotype pairings, collapsed over
unordered allele-set groups (Phaser::compute_phase_quality,
phaser.cpp:356-391), and phase sets follow the fully-connected /
clique / singleton partition (phase_sample, :470-607).  Each case below
has a hand-computed expected value."""

import numpy as np
import pytest

from octopus_tpu.core.tools.phaser import Phaser, PhaserConfig

# four haplotypes over two sites: allele ids per site
#   h0 = (0,0)   h1 = (1,1)   h2 = (0,1)   h3 = (1,0)
SITE_ALLELES_2 = np.asarray([[0, 1, 0, 1],
                             [0, 1, 1, 0]])
CIS = [0, 1]        # genotype (h0,h1): 0|0 + 1|1 -> alleles in cis
TRANS = [2, 3]      # genotype (h2,h3): alleles in trans
HOM2 = [0, 3]       # het at site 0, hom(0) at site 1


def _phase(posterior_of, site_alleles=SITE_ALLELES_2, config=None):
    genotypes = np.asarray(list(posterior_of.keys()))
    posteriors = np.asarray(list(posterior_of.values()))
    return Phaser(config or PhaserConfig()).phase(site_alleles, genotypes,
                                                  posteriors)


def test_case1_certain_cis_phases_at_max():
    sets = _phase({tuple(CIS): 1.0})
    assert len(sets) == 1
    assert sets[0].site_indices == [0, 1]
    assert sets[0].quality == 100.0          # capped at max_phase_quality


def test_case2_ninety_ten_is_exactly_phred_ten():
    # not-MAP mass = 0.1 -> PQ = -10*log10(0.1) = 10 >= min -> phased
    sets = _phase({tuple(CIS): 0.9, tuple(TRANS): 0.1})
    assert len(sets) == 1
    assert sets[0].quality == pytest.approx(10.0, abs=1e-9)


def test_case3_eighty_twenty_splits():
    # not-MAP mass = 0.2 -> PQ = 6.99 < 10 -> sites split into singletons
    sets = _phase({tuple(CIS): 0.8, tuple(TRANS): 0.2})
    assert [s.site_indices for s in sets] == [[0], [1]]


def test_case4_likely_homozygous_shortcut():
    # MAP genotype hom at site 1 with posterior > 0.9999: maximum quality
    # regardless of the residual mass (is_very_likely_homozygous,
    # phaser.cpp:294-303)
    sets = _phase({tuple(HOM2): 0.99995, tuple(TRANS): 0.00005})
    assert len(sets) == 1
    assert sets[0].quality == 100.0


def test_case5_absolute_mass_semantics():
    """The het-het mass is tiny (0.001) but its not-MAP share is 0.0004:
    the reference phreds the ABSOLUTE mass -> PQ = 33.98, phased.  (A
    het-normalised formula would give 0.4 -> PQ 3.98 and wrongly split.)"""
    sets = _phase({tuple(HOM2): 0.999, tuple(CIS): 0.0006,
                   tuple(TRANS): 0.0004})
    assert len(sets) == 1
    assert sets[0].site_indices == [0, 1]
    assert sets[0].quality == pytest.approx(-10 * np.log10(0.0004), abs=1e-6)


def test_case6_three_site_partition():
    """Sites 0-1 certainly cis; site 2's pairing ambiguous (0.6/0.4):
    q01 = max, q02 = q12 = 3.98 < min -> phase sets {0,1} and {2}."""
    # haplotypes over three sites
    site_alleles = np.asarray([[0, 1, 0, 1],
                               [0, 1, 0, 1],
                               [0, 1, 1, 0]])
    g1 = (0, 1)       # (0,0,0)+(1,1,1)
    g2 = (2, 3)       # (0,0,1)+(1,1,0)
    sets = _phase({g1: 0.6, g2: 0.4}, site_alleles=site_alleles)
    assert [s.site_indices for s in sets] == [[0, 1], [2]]
    assert sets[0].quality == 100.0


def test_case7_min_phase_quality_config_moves_the_split():
    # same 0.8/0.2 scene as case 3 phases when --min-phase-score drops
    sets = _phase({tuple(CIS): 0.8, tuple(TRANS): 0.2},
                  config=PhaserConfig(min_phase_quality=5.0))
    assert len(sets) == 1
    assert sets[0].quality == pytest.approx(-10 * np.log10(0.2), abs=1e-9)
