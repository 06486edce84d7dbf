"""Population (multi-sample joint germline) caller.

Capability-equivalent to the reference's PopulationCaller
(src/core/callers/population_caller.cpp).  Two model modes as in the
reference (population_model.hpp:23-71):

* independent: per-sample IndividualModel posteriors (the reference's
  IndependentPopulationModel); joint variant posterior combines samples as
  P(no alt anywhere) = prod_s P_s(no alt);
* exact joint (small cohorts): joint genotype combinations scored with a
  shared-haplotype coalescent prior over the union of sample genotypes,
  capped by max_genotype_combinations via per-sample top-k pre-pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import product

import numpy as np

from ..hapgen.generator import group_exclusive_sites
from ..models.individual import IndividualModel, logsumexp
from ..tools.phaser import Phaser, PhaserConfig
from ..types.genotypes import generate_all_genotypes
from .base import (
    ActiveRegionContext,
    BaseCallerConfig,
    CallerBase,
    SiteCall,
    phred_not,
)


@dataclass
class PopulationCallerConfig(BaseCallerConfig):
    joint_model: bool = True
    max_genotype_combinations: int = 10000
    max_joint_samples: int = 5        # exact joint only for small cohorts


class PopulationCaller(CallerBase):
    def __init__(self, reference, contig: str,
                 config: PopulationCallerConfig | None = None):
        super().__init__(reference, contig, config or PopulationCallerConfig())

    def _infer_and_call(self, ctx: ActiveRegionContext) -> list[SiteCall]:
        cfg = self.config
        n_samples = len(ctx.lnL)
        genotypes = generate_all_genotypes(len(ctx.haplotypes), cfg.ploidy)
        model = IndividualModel(_Prior(ctx.prior_model), use_device=cfg.use_device)
        latents = [model.evaluate(genotypes, ctx.lnL[s]) for s in range(n_samples)]
        if (cfg.joint_model and 1 < n_samples <= cfg.max_joint_samples):
            return self._call_joint(ctx, genotypes, latents)
        return self._call_independent(ctx, genotypes, latents)

    # -- independent mode --------------------------------------------------

    def _call_independent(self, ctx, genotypes, latents) -> list[SiteCall]:
        cfg = self.config
        n_samples = len(latents)
        map_gts = [genotypes[int(np.argmax(l.log_posteriors))] for l in latents]
        called = []
        for vi, v in enumerate(ctx.variants):
            g_has = ctx.contains[vi][genotypes].any(axis=1)
            # ln P(no alt in sample s)
            ln_no = [min(logsumexp(l.log_posteriors[~g_has]), 0.0) if (~g_has).any() else -np.inf
                     for l in latents]
            total_phred = -sum(ln_no) / np.log(10) * 10
            in_a_map = any(ctx.contains[vi][mg].any() for mg in map_gts)
            if total_phred >= cfg.min_variant_posterior_phred and in_a_map:
                called.append((v, total_phred))
        if not called:
            return []
        site_groups = group_exclusive_sites([v for v, _ in called])
        quality_of = {v: q for v, q in called}
        site_alleles = self.make_site_alleles(ctx, site_groups)
        # phase per sample 0 for PS grouping (shared sites)
        phase_sets = Phaser(PhaserConfig(min_phase_quality=self.config.min_phase_score)).phase(site_alleles, genotypes, latents[0].posteriors)
        site_ps = {}
        site_pq = {}
        for ps in phase_sets:
            b = min(site_groups[si][0].begin for si in ps.site_indices)
            for si in ps.site_indices:
                site_ps[si] = b
                site_pq[si] = ps.quality
        out = []
        for si, group in enumerate(site_groups):
            hap_allele = site_alleles[si]
            gts, gqs = [], []
            for s, l in enumerate(latents):
                gt = [int(hap_allele[h]) for h in map_gts[s]]
                site_gt = np.sort(hap_allele[genotypes], axis=1)
                matches = (site_gt == np.sort(np.asarray(gt))).all(axis=1)
                gqs.append(phred_not(l.log_posteriors[~matches]))
                gts.append(gt)
            out.append(SiteCall(
                begin=min(v.begin for v in group),
                end=max(v.end for v in group),
                alts=list(group),
                quality=max(quality_of[v] for v in group),
                genotypes=gts,
                genotype_qualities=gqs,
                phase_set=site_ps.get(si, group[0].begin),
                phase_quality=site_pq.get(si),
                alt_qualities=[quality_of[v] for v in group],
            ))
        return out

    # -- exact joint mode --------------------------------------------------

    def _call_joint(self, ctx, genotypes, latents) -> list[SiteCall]:
        """Joint posterior over per-sample genotype combinations.

        p(g_1..g_S) propto prior_pop(union haplotypes) * prod_s p(reads_s|g_s)
        with per-sample top-k pruning to respect max_genotype_combinations
        (population_model.cpp's reduction strategy).
        """
        cfg = self.config
        n_samples = len(latents)
        G = len(genotypes)
        k = max(2, int(round(cfg.max_genotype_combinations ** (1.0 / n_samples))))
        k = min(k, G)
        tops = [np.argsort(l.log_priors + l.log_likelihoods)[::-1][:k] for l in latents]
        combos = list(product(*tops))
        joint_scores = np.empty(len(combos))
        prior_cache: dict[tuple, float] = {}
        independent_priors = getattr(self.config,
                                     "use_independent_genotype_priors", False)
        for ci, combo in enumerate(combos):
            if independent_priors:
                # --use-independent-genotype-priors: per-sample genotype
                # priors instead of the shared-haplotype population prior
                # (cli.md:1157-1163; population caller prior model switch)
                lp = sum(latents[s].log_priors[g] for s, g in enumerate(combo))
            else:
                # joint prior: coalescent over the union of haplotypes across
                # samples (captures shared variation); likelihoods independent
                hap_union = tuple(sorted(set(int(h) for g in combo
                                             for h in genotypes[g])))
                lp = prior_cache.get(hap_union)
                if lp is None:
                    lp = ctx.prior_model.evaluate_indices(np.asarray(hap_union))
                    prior_cache[hap_union] = lp
            joint_scores[ci] = lp + sum(
                latents[s].log_likelihoods[g] for s, g in enumerate(combo))
        joint_scores -= logsumexp(joint_scores)
        joint_post = np.exp(joint_scores)
        map_combo = combos[int(np.argmax(joint_scores))]
        map_gts = [genotypes[g] for g in map_combo]
        combo_arr = np.asarray(combos)                     # (C, S)
        called = []
        for vi, v in enumerate(ctx.variants):
            g_has = ctx.contains[vi][genotypes].any(axis=1)   # (G,)
            combo_has = g_has[combo_arr].any(axis=1)          # (C,)
            phred = phred_not(joint_scores[~combo_has])
            in_map = any(ctx.contains[vi][mg].any() for mg in map_gts)
            if phred >= cfg.min_variant_posterior_phred and in_map:
                called.append((v, phred))
        if not called:
            return []
        site_groups = group_exclusive_sites([v for v, _ in called])
        quality_of = {v: q for v, q in called}
        site_alleles = self.make_site_alleles(ctx, site_groups)
        phase_sets = Phaser(PhaserConfig(min_phase_quality=self.config.min_phase_score)).phase(site_alleles, genotypes, latents[0].posteriors)
        site_ps = {}
        site_pq = {}
        for ps in phase_sets:
            b = min(site_groups[si][0].begin for si in ps.site_indices)
            for si in ps.site_indices:
                site_ps[si] = b
                site_pq[si] = ps.quality
        out = []
        for si, group in enumerate(site_groups):
            hap_allele = site_alleles[si]
            gts, gqs = [], []
            for s in range(n_samples):
                gt = [int(hap_allele[h]) for h in map_gts[s]]
                sig = np.sort(np.asarray(gt))
                sample_site_gt = np.sort(hap_allele[genotypes[combo_arr[:, s]]], axis=1)
                matches = (sample_site_gt == sig).all(axis=1)
                gqs.append(phred_not(joint_scores[~matches]))
                gts.append(gt)
            out.append(SiteCall(
                begin=min(v.begin for v in group),
                end=max(v.end for v in group),
                alts=list(group),
                quality=max(quality_of[v] for v in group),
                genotypes=gts,
                genotype_qualities=gqs,
                phase_set=site_ps.get(si, group[0].begin),
                phase_quality=site_pq.get(si),
                alt_qualities=[quality_of[v] for v in group],
            ))
        return out


class _Prior:
    def __init__(self, model):
        self.model = model

    def evaluate_many(self, genotypes: np.ndarray) -> np.ndarray:
        return self.model.evaluate_many(genotypes)


__all__ = ["PopulationCaller", "PopulationCallerConfig"]
