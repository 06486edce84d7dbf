"""Phasing of called sites from genotype posteriors.

Capability-equivalent to the reference's Phaser
(src/core/tools/phaser/phaser.{hpp,cpp}): pairwise phase qualities between
heterozygous sites are computed from the posterior mass of alternative
haplotype pairings (grouped by unordered allele sets at each site); sites
connect when quality >= min_phase_quality (default 10), fully-connected
vertices form the core set, remaining sites join maximal cliques
(Bron-Kerbosch), and each phase set's quality is the minimum pairwise
quality inside it (capped at max_phase_quality, default 100).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from itertools import combinations

import numpy as np

MAX_QUALITY = 1e6


@dataclass
class PhaserConfig:
    min_phase_quality: float = 10.0
    max_phase_quality: float | None = 100.0


@dataclass
class PhaseSet:
    site_indices: list[int]
    quality: float


def _phred(p_false: float) -> float:
    if p_false <= 0:
        return MAX_QUALITY
    return min(-10.0 * math.log10(p_false), MAX_QUALITY)


class Phaser:
    def __init__(self, config: PhaserConfig | None = None):
        self.config = config or PhaserConfig()

    def phase(
        self,
        site_alleles: np.ndarray,    # (n_sites, n_haplotypes) allele id per hap
        genotypes: np.ndarray,       # (G, P) haplotype index matrix
        posteriors: np.ndarray,      # (G,) probabilities
    ) -> list[PhaseSet]:
        n_sites = site_alleles.shape[0]
        if n_sites == 0:
            return []
        if n_sites == 1 or genotypes.shape[1] == 1:
            return [PhaseSet(list(range(n_sites)), MAX_QUALITY)]
        # allele pattern per genotype per site: (n_sites, G, P)
        patt = site_alleles[:, genotypes]            # (n_sites, G, P)
        qual = np.full((n_sites, n_sites), MAX_QUALITY)
        for lhs, rhs in combinations(range(n_sites), 2):
            q = self._pair_quality(patt[lhs], patt[rhs], posteriors)
            qual[lhs, rhs] = qual[rhs, lhs] = q
        cfg = self.config
        adj = qual >= cfg.min_phase_quality
        np.fill_diagonal(adj, True)
        sets = self._partition(adj)
        out = []
        for s in sets:
            if len(s) > 1:
                q = min(qual[a, b] for a, b in combinations(s, 2))
            else:
                q = MAX_QUALITY
            if cfg.max_phase_quality is not None:
                q = min(q, cfg.max_phase_quality)
            out.append(PhaseSet(sorted(s), q))
        out.sort(key=lambda ps: ps.site_indices[0])
        return out

    @staticmethod
    def _pair_quality(patt_l: np.ndarray, patt_r: np.ndarray,
                      posteriors: np.ndarray) -> float:
        """Phase quality between two sites (phaser.cpp:357-395).

        patt_l/patt_r: (G, P) allele ids of each genotype's haplotypes at
        the site."""
        # heterozygous at both sites?
        het_l = (patt_l != patt_l[:, :1]).any(axis=1)
        het_r = (patt_r != patt_r[:, :1]).any(axis=1)
        both = het_l & het_r
        if not both.any():
            return MAX_QUALITY
        # MAP homozygous shortcut
        map_idx = int(np.argmax(posteriors))
        if posteriors[map_idx] > 0.9999 and not (both[map_idx]):
            return MAX_QUALITY
        groups: dict[tuple, dict[tuple, float]] = {}
        for g in np.flatnonzero(both):
            al = tuple(sorted(set(patt_l[g].tolist())))
            ar = tuple(sorted(set(patt_r[g].tolist())))
            # phased chunk: unique (allele_l, allele_r) pairs over haplotypes
            chunk = tuple(sorted(set(zip(patt_l[g].tolist(), patt_r[g].tolist()))))
            d = groups.setdefault((al, ar), {})
            d[chunk] = d.get(chunk, 0.0) + float(posteriors[g])
        # total not-MAP mass in ABSOLUTE posterior units: the reference
        # normalises within each allele-set group, scales back by the group
        # weight and finally multiplies by the total heterozygous mass
        # (phaser.cpp:367-390) — net effect Σ_sets (set_mass − max_chunk).
        # A likely-homozygous pair (small het mass) therefore phases with
        # high quality.
        total_mass = sum(sum(v.values()) for v in groups.values())
        if total_mass <= 0 or not np.isfinite(total_mass):
            return MAX_QUALITY
        total_not_map = 0.0
        for chunk_posts in groups.values():
            if len(chunk_posts) > 1:
                vals = np.asarray(list(chunk_posts.values()))
                total_not_map += float(vals.sum() - vals.max())
        return _phred(total_not_map)

    @staticmethod
    def _partition(adj: np.ndarray) -> list[list[int]]:
        """Partition sites into phase sets (phaser.cpp:470-607)."""
        n = adj.shape[0]
        degree = adj.sum(axis=1) - 1
        fully = [i for i in range(n) if degree[i] == n - 1]
        rest = [i for i in range(n) if degree[i] < n - 1]
        if not rest:
            return [fully] if fully else []
        # adjacency among the rest (fully-connected removed)
        singles = [i for i in rest if not any(adj[i, j] for j in rest if j != i)]
        partial = [i for i in rest if i not in singles]
        cliques: list[list[int]] = []
        if partial:
            sub = {i: {j for j in partial if j != i and adj[i, j]} for i in partial}
            cliques = [sorted(c) for c in _bron_kerbosch(sub)]
        cliques.extend([[i] for i in singles])
        possible = {}
        for i in partial:
            possible[i] = [ci for ci, c in enumerate(cliques) if i in c]
        for k, i in enumerate(singles):
            possible[i] = [len(cliques) - len(singles) + k]
        for i in fully:
            possible[i] = list(range(len(cliques))) or [0]
        if not cliques:
            cliques = [[]]
            for i in fully:
                possible[i] = [0]
        phase_sets: list[list[int]] = [[] for _ in cliques]
        for i in range(n):
            opts = possible[i]
            if len(opts) == 1:
                phase_sets[opts[0]].append(i)
            else:
                # choose the clique containing the positionally closest
                # unambiguous site
                best = opts[0]
                best_dist = None
                for ci in opts:
                    for j in cliques[ci]:
                        if j != i and len(possible.get(j, [])) == 1:
                            d = abs(j - i)
                            if best_dist is None or d < best_dist:
                                best, best_dist = ci, d
                phase_sets[best].append(i)
        return [sorted(s) for s in phase_sets if s]


def _bron_kerbosch(adj: dict[int, set[int]]) -> list[set[int]]:
    """All maximal cliques of a small graph."""
    cliques: list[set[int]] = []

    def bk(r: set, p: set, x: set):
        if not p and not x:
            cliques.append(set(r))
            return
        pivot_candidates = p | x
        pivot = max(pivot_candidates, key=lambda v: len(adj[v] & p)) if pivot_candidates else None
        ext = p - adj[pivot] if pivot is not None else set(p)
        for v in list(ext):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(adj), set())
    return cliques


__all__ = ["Phaser", "PhaserConfig", "PhaseSet"]
