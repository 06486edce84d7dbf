"""De novo mutation model: P(child haplotype | parent haplotype).

Capability-equivalent to the reference's DeNovoModel
(src/core/models/mutation/denovo_model.{hpp,cpp}) with its heavy memoisation.
The reference scores via a pair-HMM alignment between haplotype sequences
with mutation priors; here haplotypes carry their explicit variant sets, so
for haplotypes over the same region the transition probability is the
product of per-difference mutation priors over the symmetric difference
(equivalent for non-overlapping explicit variants; HMM-based scoring of
arbitrary sequences is the refinement path for haplotypes from different
builds).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

from ..types.haplotypes import Haplotype


@dataclass(frozen=True)
class DeNovoParams:
    snv_prior: float = 1.3e-8       # denovo-snv-prior default
    indel_prior: float = 1e-9       # denovo-indel-prior default


class DeNovoModel:
    def __init__(self, params: DeNovoParams | None = None):
        self.params = params or DeNovoParams()
        self._cache: dict[tuple[int, int], float] = {}
        self._context = None          # lazy ContextIndelModel over the parent
        self._context_key = None

    def ln_probability(self, child_idx: int, parent_idx: int,
                       haplotypes: list[Haplotype]) -> float:
        """ln P(child haplotype | parent haplotype) by haplotype index."""
        key = (child_idx, parent_idx)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        child = haplotypes[child_idx]
        parent = haplotypes[parent_idx]
        cs = set(child.variants)
        ps = set(parent.variants)
        lnp = 0.0
        for v in cs.symmetric_difference(ps):
            if v.is_indel():
                # repeat-context, size-dependent indel prior (the reference
                # scores via its IndelMutationModel context; indel_mutation.py
                # reproduces that model)
                ctx = self._context_for(parent)
                lnp += math.log(max(ctx.indel_probability(
                    v.begin - parent.begin, max(v.indel_size(), 1)), 1e-300))
            else:
                lnp += math.log(self.params.snv_prior)
        self._cache[key] = lnp
        return lnp

    def _context_for(self, parent: Haplotype):
        key = id(parent)
        if self._context_key != key:
            from .indel_mutation import ContextIndelModel, IndelMutationParams
            self._context = ContextIndelModel(
                parent.sequence,
                IndelMutationParams(indel_mutation_prior=self.params.indel_prior))
            self._context_key = key
        return self._context


__all__ = ["DeNovoModel", "DeNovoParams"]
