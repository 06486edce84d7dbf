"""Single-cell caller over clone phylogenies.

Capability-equivalent to the reference's CellCaller + SingleCellModel
(src/core/callers/cell_caller.cpp, single_cell_model.hpp:27-142,
phylogeny.hpp): enumerates small clone phylogenies (founder germline
genotype, optionally extended by somatic-haplotype child clones), infers
per-cell clone assignments with an EM mixture, and compares phylogeny
posteriors; somatic calls carry the clone structure.

Phylogeny enumeration here covers sizes 1-2 (founder / founder+child);
deeper trees follow the same structure scoring and are the scale-out path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..hapgen.generator import group_exclusive_sites
from ..models.denovo import DeNovoModel, DeNovoParams
from ..models.genotype_likelihoods import genotype_log_likelihoods_np
from ..models.individual import logsumexp
from ..types.genotypes import generate_all_genotypes
from .base import (
    ActiveRegionContext,
    BaseCallerConfig,
    CallerBase,
    SiteCall,
    phred_not,
)


@dataclass
class CellCallerConfig(BaseCallerConfig):
    max_phylogeny_size: int = 2
    somatic_snv_prior: float = 1e-4
    somatic_indel_prior: float = 1e-5
    max_founders: int = 10
    em_iterations: int = 30
    clone_prior_penalty: float = math.log(1e-3)   # per extra clone


class CellCaller(CallerBase):
    def _infer_and_call(self, ctx: ActiveRegionContext) -> list[SiteCall]:
        cfg = self.config
        n_cells = len(ctx.lnL)
        H = len(ctx.haplotypes)
        genotypes = generate_all_genotypes(H, cfg.ploidy)
        log_priors = ctx.prior_model.evaluate_many(genotypes)
        cell_liks = np.stack([genotype_log_likelihoods_np(ctx.lnL[c], genotypes)
                              for c in range(n_cells)])        # (cells, G)
        pooled = log_priors + cell_liks.sum(axis=0)
        top_g = np.argsort(pooled)[::-1][:cfg.max_founders]
        denovo = DeNovoModel(DeNovoParams(cfg.somatic_snv_prior, cfg.somatic_indel_prior))

        structures = []      # (founder_gi, somatic_h | None, score, cell_assignments)
        for gi in top_g:
            g = genotypes[gi]
            # size-1 phylogeny: all cells are the founder clone
            score1 = log_priors[gi] + cell_liks[:, gi].sum()
            structures.append((int(gi), None, score1, np.zeros(n_cells, int)))
            if cfg.max_phylogeny_size < 2:
                continue
            for h in range(H):
                if h in g:
                    continue
                lp_som = max(denovo.ln_probability(h, int(x), ctx.haplotypes)
                             for x in g)
                child = np.sort(np.concatenate([g, [h]]))
                child_lik = np.stack([
                    genotype_log_likelihoods_np(ctx.lnL[c], child[None, :])[0]
                    for c in range(n_cells)])
                score, assign = self._em_two_clone(cell_liks[:, gi], child_lik,
                                                   cfg.em_iterations)
                score += log_priors[gi] + lp_som + cfg.clone_prior_penalty
                structures.append((int(gi), h, score, assign))
        scores = np.asarray([s[2] for s in structures])
        log_post = scores - logsumexp(scores)
        best = structures[int(np.argmax(log_post))]
        founder_gi, somatic_h, _, assign = best
        founder = genotypes[founder_gi]

        called = []
        info_of = {}
        for vi, v in enumerate(ctx.variants):
            has_v = ctx.contains[vi]
            # posterior over structures where the variant is present anywhere
            present = np.asarray([
                has_v[genotypes[s[0]]].any() or (s[1] is not None and has_v[s[1]])
                for s in structures])
            phred = phred_not(log_post[~present])
            in_best = has_v[founder].any() or (somatic_h is not None and has_v[somatic_h])
            if phred >= self.config.min_variant_posterior_phred and in_best:
                called.append((v, phred))
                if not has_v[founder].any() and somatic_h is not None and has_v[somatic_h]:
                    info_of[v] = {"SOMATIC": True,
                                  "CELLS": int(assign.sum())}
        if not called:
            return []
        site_groups = group_exclusive_sites([v for v, _ in called])
        quality_of = {v: q for v, q in called}
        site_alleles = self.make_site_alleles(ctx, site_groups)
        out = []
        for si, group in enumerate(site_groups):
            hap_allele = site_alleles[si]
            gts = []
            for c in range(len(ctx.lnL)):
                if somatic_h is not None and assign[c] == 1:
                    members = list(founder) + [somatic_h]
                else:
                    members = list(founder)
                gts.append([int(hap_allele[h]) for h in members])
            info = {}
            for v in group:
                info.update(info_of.get(v, {}))
            out.append(SiteCall(
                begin=min(v.begin for v in group),
                end=max(v.end for v in group),
                alts=list(group),
                quality=max(quality_of[v] for v in group),
                genotypes=gts,
                genotype_qualities=[quality_of[group[0]]] * len(gts),
                phase_set=group[0].begin,
                alt_qualities=[quality_of[v] for v in group],
                info=info,
            ))
        return out

    @staticmethod
    def _em_two_clone(founder_lik: np.ndarray, child_lik: np.ndarray,
                      iterations: int) -> tuple[float, np.ndarray]:
        """EM over per-cell clone assignment; returns (evidence, MAP assign)."""
        n = len(founder_lik)
        pi = 0.5
        for _ in range(iterations):
            a = np.log(max(pi, 1e-12)) + child_lik
            b = np.log(max(1 - pi, 1e-12)) + founder_lik
            m = np.maximum(a, b)
            r = np.exp(a - m) / (np.exp(a - m) + np.exp(b - m))
            new_pi = float(r.mean())
            if abs(new_pi - pi) < 1e-6:
                pi = new_pi
                break
            pi = new_pi
        a = np.log(max(pi, 1e-12)) + child_lik
        b = np.log(max(1 - pi, 1e-12)) + founder_lik
        per_cell = np.logaddexp(a, b)
        return float(per_cell.sum()), (a > b).astype(int)


__all__ = ["CellCaller", "CellCallerConfig"]
