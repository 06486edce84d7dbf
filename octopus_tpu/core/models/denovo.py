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
                # indel prior decays with size (reference scales via the
                # context indel mutation model)
                lnp += math.log(self.params.indel_prior) + (
                    -0.1 * max(v.indel_size() - 1, 0))
            else:
                lnp += math.log(self.params.snv_prior)
        self._cache[key] = lnp
        return lnp


__all__ = ["DeNovoModel", "DeNovoParams"]
