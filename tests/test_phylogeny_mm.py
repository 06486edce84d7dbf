"""Phylogeny type + mixture-mixture VB (single-cell stack)."""

import numpy as np

from octopus_tpu.core.types.phylogeny import (Group, Phylogeny,
                                              enumerate_tree_shapes)
from octopus_tpu.core.models.mixture_mixture_vb import (
    VariationalBayesMixtureMixtureModel)


def test_phylogeny_structure():
    p = Phylogeny(Group(0, "founder"))
    p.add_descendant(Group(1, "clone1"), 0)
    p.add_descendant(Group(2, "clone2"), 0)
    p.add_descendant(Group(3, "clone3"), 1)
    assert len(p) == 4
    assert p.founder.id == 0
    assert p.num_descendants(0) == 2
    assert p.ancestor(3).id == 1
    assert [g.id for g in p.traverse_preorder()] == [0, 1, 3, 2]
    q = p.copy()
    p.clear(1)           # removes 1 and 3
    assert len(p) == 2 and len(q) == 4
    assert p.serialize() == ((0, None), (2, 0))


def test_tree_shape_enumeration():
    assert enumerate_tree_shapes(1) == [[None]]
    assert enumerate_tree_shapes(2) == [[None, 0]]
    # size 3: chain 0-1-2 and star 0->(1,2)
    shapes = enumerate_tree_shapes(3)
    assert [s[1:] for s in shapes] == [[0, 0], [0, 1]]
    assert len(enumerate_tree_shapes(4)) == 6


def test_mixture_mixture_separates_clones():
    rng = np.random.default_rng(0)
    H, R = 3, 60
    # founder clone: haps {0,1}; somatic clone: {0,1,2}
    def cell_lnl(somatic, r=R):
        lnl = np.full((H, r), -8.0)
        for j in range(r):
            h = rng.choice([0, 1, 2] if somatic else [0, 1])
            lnl[h, j] = -0.1
            if not somatic:
                lnl[2, j] = -12.0
        return lnl

    cells = [cell_lnl(False) for _ in range(8)] + [cell_lnl(True) for _ in range(8)]
    mm = VariationalBayesMixtureMixtureModel(n_seeds=3, n_iter=80)
    inf = mm.evaluate(cells, [[0, 1], [0, 1, 2]])
    # somatic cells (second half) assigned to clone 1
    assert (inf.map_assignments[8:] == 1).mean() >= 0.75
    assert (inf.map_assignments[:8] == 0).mean() >= 0.75
    # evidence should beat the single-clone explanation
    inf1 = mm.evaluate(cells, [[0, 1]])
    assert inf.log_evidence > inf1.log_evidence
