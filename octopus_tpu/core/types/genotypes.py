"""Genotype enumeration over indexed haplotypes.

Capability-equivalent to the reference's Genotype<T> +
generate_all_genotypes (src/core/types/genotype.hpp:1117-1345): a genotype is
a sorted multiset of `ploidy` haplotype indices; enumeration is combinations
with repetition, count C(n + p - 1, p).  Everything is dense int32 matrices
ready for device gathers.
"""

from __future__ import annotations

from math import comb

import numpy as np


def num_genotypes(n_haplotypes: int, ploidy: int) -> int:
    return comb(n_haplotypes + ploidy - 1, ploidy)


def generate_all_genotypes(n_haplotypes: int, ploidy: int) -> np.ndarray:
    """(G, ploidy) int32 matrix of non-decreasing haplotype index tuples.

    Ordering is lexicographic over the non-decreasing tuples, matching a
    standard combinations-with-repetition enumeration.
    """
    if ploidy == 0:
        return np.zeros((1, 0), dtype=np.int32)
    if n_haplotypes == 0:
        return np.zeros((0, ploidy), dtype=np.int32)
    # build incrementally: genotypes of ploidy p with max index i extend all
    # genotypes of ploidy p-1 over indices [0..i] — O(G) memory, no filtering
    out = np.arange(n_haplotypes, dtype=np.int32)[:, None]
    for _ in range(1, ploidy):
        counts = np.asarray([num_genotypes(i + 1, out.shape[1]) for i in range(n_haplotypes)])
        # prefix of `out` rows usable for each new max index i: rows whose
        # last element <= i are exactly the first counts[i] rows (out is
        # generated in lexicographic order so this holds by induction)
        new_last = np.repeat(np.arange(n_haplotypes, dtype=np.int32), counts)
        rows = np.concatenate([np.arange(c) for c in counts])
        out = np.concatenate([out[rows], new_last[:, None]], axis=1)
    return out


def genotype_counts_matrix(genotypes: np.ndarray, n_haplotypes: int) -> np.ndarray:
    """(G, H) float32 matrix of per-haplotype multiplicities."""
    G, P = genotypes.shape
    out = np.zeros((G, n_haplotypes), dtype=np.float32)
    rows = np.repeat(np.arange(G), P)
    np.add.at(out, (rows, genotypes.ravel()), 1.0)
    return out


def genotype_zygosity(genotypes: np.ndarray) -> np.ndarray:
    """Number of distinct haplotypes per genotype, vectorised."""
    srt = np.sort(genotypes, axis=1)
    if genotypes.shape[1] == 0:
        return np.zeros(len(genotypes), dtype=np.int32)
    return 1 + (srt[:, 1:] != srt[:, :-1]).sum(axis=1).astype(np.int32)


def genotypes_containing(genotypes: np.ndarray, haplotype_idx: int) -> np.ndarray:
    return np.flatnonzero((genotypes == haplotype_idx).any(axis=1))


def max_zygosity_genotypes(n_haplotypes: int, ploidy: int) -> np.ndarray:
    """All genotypes with maximum possible zygosity (distinct haplotypes) —
    the reference's pre-pass when the full enumeration is too large
    (individual_caller.cpp:633-730)."""
    if ploidy >= n_haplotypes:
        return generate_all_genotypes(n_haplotypes, ploidy)
    gts = generate_all_genotypes(n_haplotypes, ploidy)
    zyg = genotype_zygosity(gts)
    return gts[zyg == min(ploidy, n_haplotypes)]


__all__ = [
    "num_genotypes",
    "generate_all_genotypes",
    "genotype_counts_matrix",
    "genotype_zygosity",
    "genotypes_containing",
    "max_zygosity_genotypes",
]
