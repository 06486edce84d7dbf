"""Coalescent (Ewens-sampling) prior over haplotype sets.

Capability-equivalent to the reference's CoalescentModel
(src/core/models/mutation/coalescent_model.{hpp,cpp}): the prior probability
of observing k segregating sites among n sampled haplotypes (the genotype's
haplotypes + the reference) under the infinite-sites coalescent,

  p(k | n, theta) = sum_{i=2}^{n} (-1)^i C(n-1, i-1) ((i-1)/(theta+i-1))
                                   (theta/(theta+i-1))^k

split across site classes (SNVs, repeat-context indels, complex indels) with
per-class heterozygosities and a multinomial combination term
(coalescent_model.cpp:100-180).

Per-indel heterozygosity comes from the repeat-context mutation model
(core/models/indel_mutation.py — exact closed-form extension model plus a
compact parametrization of the Montgomery-derived enrichment curves),
mirroring calculate_heterozygosity (coalescent_model.cpp:321-326) with the
reference's (min, max) -> (complex, repeat) class buffering.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from math import comb, inf, log

import numpy as np

from ...utils.tandem import extract_exact_tandem_repeats_arrays
from ..types.haplotypes import Haplotype
from ..types.variants import Variant


@dataclass(frozen=True)
class CoalescentParams:
    snp_heterozygosity: float = 0.001
    indel_heterozygosity: float = 0.0001


@lru_cache(maxsize=100000)
def _coalescent_1type(n: int, k: int, theta: float) -> float:
    """log p(k segregating sites | n haplotypes, theta)."""
    if n < 2:
        return 0.0
    # real-space first; complex-log fallback for alternating-sum cancellation
    total = 0.0
    for i in range(2, n + 1):
        sign = 1 if i % 2 == 0 else -1
        total += (sign * comb(n - 1, i - 1) * ((i - 1) / (theta + i - 1))
                  * (theta / (theta + i - 1)) ** k)
    if total > 0:
        return log(total)
    # complex log-space
    terms = []
    for i in range(2, n + 1):
        re = (log(comb(n - 1, i - 1)) + log((i - 1) / (theta + i - 1))
              + k * log(theta / (theta + i - 1)))
        im = np.pi * i  # log((-1)^i) imaginary part
        terms.append(complex(re, im))
    arr = np.asarray(terms)
    m = arr.real.max()
    s = np.exp(arr - m).sum()
    return float(m + np.log(s).real)


def _log_multinomial(ks: tuple[int, ...]) -> float:
    from math import lgamma
    n = sum(ks)
    return lgamma(n + 1) - sum(lgamma(k + 1) for k in ks)


def coalescent_log_prob(n: int, site_counts: tuple[int, ...],
                        thetas: tuple[float, ...]) -> float:
    """Multi-class segregating-site prior (coalescent_model.cpp:167-180)."""
    theta_tot = sum(thetas)
    k_tot = sum(site_counts)
    result = _coalescent_1type(n, k_tot, theta_tot)
    for k, th in zip(site_counts, thetas):
        if k:
            result += k * log(th / theta_tot)
    result += _log_multinomial(tuple(site_counts))
    return result


class CoalescentModel:
    """Primed over a haplotype block; evaluates genotype priors by counting
    the union of segregating sites among the genotype's haplotypes."""

    def __init__(self, reference_haplotype: Haplotype,
                 params: CoalescentParams | None = None,
                 indel_error_model=None):
        self.params = params or CoalescentParams()
        self.reference = reference_haplotype
        ref_codes = reference_haplotype.sequence
        reps = extract_exact_tandem_repeats_arrays(ref_codes, 1, 5)
        self._repeat_intervals = np.stack(
            [reps[:, 0], reps[:, 0] + reps[:, 1]],
            axis=1).astype(np.int64) if len(reps) else \
            np.zeros((0, 2), np.int64)
        from .indel_mutation import ContextIndelModel, IndelMutationParams
        self._context_model = ContextIndelModel(
            ref_codes,
            IndelMutationParams(indel_mutation_prior=self.params.indel_heterozygosity))
        self._haplotype_variants: list[tuple[Variant, ...]] = []
        self._variant_ids: dict[Variant, int] = {}
        self._variant_kinds: list[int] = []      # 0 snp, 1 repeat indel, 2 complex indel
        self._variant_hets: list[float] = []
        self._hap_masks: np.ndarray | None = None

    # -- priming -----------------------------------------------------------

    def prime(self, haplotypes: list[Haplotype]) -> None:
        self._variant_ids.clear()
        self._variant_kinds.clear()
        self._variant_hets.clear()
        for h in haplotypes:
            for v in h.variants:
                if v not in self._variant_ids:
                    self._variant_ids[v] = len(self._variant_ids)
                    self._variant_kinds.append(self._classify(v))
                    self._variant_hets.append(self._site_heterozygosity(v))
        nvar = len(self._variant_ids)
        self._hap_masks = np.zeros((len(haplotypes), nvar), dtype=bool)
        for i, h in enumerate(haplotypes):
            for v in h.variants:
                self._hap_masks[i, self._variant_ids[v]] = True
        self._kinds_arr = np.asarray(self._variant_kinds, np.int8)
        self._hets_arr = np.asarray(self._variant_hets, np.float64)

    def _classify(self, v: Variant) -> int:
        if not v.is_indel():
            return 0
        pos = v.begin - self.reference.begin
        end = max(v.end - self.reference.begin, pos + 1)
        if len(self._repeat_intervals):
            hit = ((self._repeat_intervals[:, 0] < end)
                   & (self._repeat_intervals[:, 1] > pos)).any()
            if hit:
                return 1
        return 2

    def _site_heterozygosity(self, v: Variant) -> float:
        """Per-site indel heterozygosity from the repeat-context mutation
        model (coalescent_model.cpp:321-326 calculate_heterozygosity)."""
        if not v.is_indel():
            return self.params.indel_heterozygosity
        pos = v.begin - self.reference.begin
        return self._context_model.indel_probability(pos, max(v.indel_size(), 1))

    # -- evaluation --------------------------------------------------------

    def evaluate_indices(self, hap_indices: np.ndarray) -> float:
        """ln prior of a multiset of primed haplotype indices (a genotype)."""
        union = self._hap_masks[np.asarray(hap_indices)].any(axis=0)
        return self._evaluate_union(union, len(hap_indices) + 1)

    def evaluate_many(self, genotypes: np.ndarray) -> np.ndarray:
        """Vectorised ln priors for a (G, P) genotype index matrix."""
        unions = self._hap_masks[genotypes].any(axis=1)     # (G, nvar)
        n = genotypes.shape[1] + 1
        k_snp = (unions & (self._kinds_arr == 0)).sum(axis=1)
        k_rep = (unions & (self._kinds_arr == 1)).sum(axis=1)
        k_cpx = (unions & (self._kinds_arr == 2)).sum(axis=1)
        out = np.empty(len(genotypes))
        # group identical count/heterozygosity signatures
        for g in range(len(genotypes)):
            out[g] = self._evaluate_counts(
                n, int(k_snp[g]), int(k_rep[g]), int(k_cpx[g]), unions[g])
        return out

    def _evaluate_union(self, union: np.ndarray, n: int) -> float:
        k_snp = int((union & (self._kinds_arr == 0)).sum())
        k_rep = int((union & (self._kinds_arr == 1)).sum())
        k_cpx = int((union & (self._kinds_arr == 2)).sum())
        return self._evaluate_counts(n, k_snp, k_rep, k_cpx, union)

    def _evaluate_counts(self, n, k_snp, k_rep, k_cpx, union) -> float:
        p = self.params
        if k_rep + k_cpx == 0:
            return coalescent_log_prob(
                n, (k_snp, 0), (p.snp_heterozygosity, p.indel_heterozygosity))
        indels = union & (self._kinds_arr != 0)
        hets = self._hets_arr[indels]
        # the reference uses (min, max) site heterozygosity for the
        # (complex, repeat) classes respectively (coalescent_model.cpp)
        h_min = float(_round_sf(hets.min(), 6)) if len(hets) else p.indel_heterozygosity
        h_max = float(_round_sf(hets.max(), 6)) if len(hets) else p.indel_heterozygosity
        return coalescent_log_prob(
            n, (k_snp, k_rep, k_cpx), (p.snp_heterozygosity, h_max, h_min))


def _round_sf(x: float, sf: int) -> float:
    if x == 0:
        return 0.0
    from math import floor, log10
    return round(x, -int(floor(log10(abs(x)))) + sf - 1)


__all__ = [
    "CoalescentModel",
    "CoalescentParams",
    "coalescent_log_prob",
]
