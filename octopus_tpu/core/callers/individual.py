"""Individual (single-sample germline) caller.

Capability-equivalent to the reference's IndividualCaller
(src/core/callers/individual_caller.cpp) driving the generic caller loop
(caller.cpp:411-533) for one sample:

candidates -> active regions -> haplotype enumeration -> device likelihood
matrix -> genotype posteriors (coalescent prior x mixture likelihood) ->
variant + genotype calls:

* variant posterior: phred of the total posterior mass of genotypes NOT
  containing the alt allele (individual_caller.cpp:242-266),
* called iff posterior >= min threshold and the alt is in the MAP genotype,
* per-site genotype call and GQ from the posterior mass of genotypes whose
  allele multiset at the site matches the MAP chunk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ...basics.phred import LN10_DIV_10
from ...basics.reads import ReadBatch
from ..hapgen.generator import (
    enumerate_haplotypes,
    group_exclusive_sites,
    propose_active_regions,
)
from ..likelihood.likelihood_array import HaplotypeLikelihoodArray, LikelihoodConfig
from ..models.coalescent import CoalescentModel, CoalescentParams
from ..models.individual import IndividualModel, logsumexp
from ..types.genotypes import generate_all_genotypes
from ..types.haplotypes import Haplotype
from ..types.variants import Variant
from ..vargen.cigar_scanner import CigarScanner, ScannerOptions


@dataclass
class CallerConfig:
    ploidy: int = 2
    min_variant_posterior_phred: float = 0.1      # min-variant-posterior default
    max_haplotypes: int = 200
    snp_heterozygosity: float = 0.001
    indel_heterozygosity: float = 0.0001
    haplotype_pad: int = 30                        # region expansion around sites
    likelihood: LikelihoodConfig = field(default_factory=LikelihoodConfig)
    scanner: ScannerOptions = field(default_factory=ScannerOptions)
    use_device: bool = True


@dataclass
class SiteCall:
    """One called site (possibly multi-allelic)."""

    begin: int
    end: int
    alts: list[Variant]             # the called variants at this site
    quality: float                  # phred posterior of any alt at the site
    genotype: list[int]             # per-haplotype allele index (0=ref)
    genotype_quality: float
    phase_set: int                  # region begin of the phase group
    alt_qualities: list[float]      # per alt allele phred posterior
    sample: int = 0


class IndividualCaller:
    def __init__(self, reference, contig: str, config: CallerConfig | None = None):
        self.reference = reference
        self.contig = contig
        self.config = config or CallerConfig()

    # -- pipeline ----------------------------------------------------------

    def call(self, region_begin: int, region_end: int,
             reads: ReadBatch) -> list[SiteCall]:
        cfg = self.config
        scanner = CigarScanner(self.reference, self.contig, cfg.scanner)
        scanner.add_reads(0, reads)
        candidates = scanner.generate(region_begin, region_end)
        if not candidates:
            return []
        calls: list[SiteCall] = []
        for begin, end, variants in propose_active_regions(candidates):
            calls.extend(self._call_active_region(begin, end, variants, reads))
        calls.sort(key=lambda c: (c.begin, c.end))
        return calls

    def _call_active_region(self, begin: int, end: int,
                            variants: list[Variant],
                            reads: ReadBatch) -> list[SiteCall]:
        cfg = self.config
        pad = cfg.likelihood.max_indel_error
        active_reads = reads.overlapping(begin, end)
        if len(active_reads) == 0:
            return []
        hap_begin = min(int(active_reads.begins.min()), begin) - (pad + cfg.haplotype_pad)
        hap_end = max(int(active_reads.ends.max()), end) + (pad + cfg.haplotype_pad)
        hap_begin = max(hap_begin, 0)
        hap_end = min(hap_end, self.reference.contig_size(self.contig))
        fetch = lambda b, e: self.reference.fetch_codes(self.contig, b, e)
        haplotypes = enumerate_haplotypes(hap_begin, hap_end, variants, fetch,
                                          cfg.max_haplotypes)
        if len(haplotypes) < 2:
            return []
        # likelihoods
        lik = HaplotypeLikelihoodArray(cfg.likelihood)
        lik.populate([active_reads], [h.sequence for h in haplotypes], hap_begin,
                     substitution_masks=[h.substitution_mask() for h in haplotypes])
        lnL = lik.sample_matrix(0)
        # genotype model
        ref_hap = next((h for h in haplotypes if not h.variants), None)
        if ref_hap is None:
            ref_hap = Haplotype.build(hap_begin, hap_end, [], fetch)
        prior_model = CoalescentModel(
            ref_hap,
            CoalescentParams(cfg.snp_heterozygosity, cfg.indel_heterozygosity),
            indel_error_model=lik._indel_model,
        )
        prior_model.prime(haplotypes)
        genotypes = generate_all_genotypes(len(haplotypes), cfg.ploidy)
        model = IndividualModel(prior_model, use_device=cfg.use_device)
        latents = model.evaluate(genotypes, lnL)
        return self._make_calls(haplotypes, genotypes, latents, variants, begin)

    # -- calling -----------------------------------------------------------

    def _make_calls(self, haplotypes, genotypes, latents, variants,
                    phase_set: int) -> list[SiteCall]:
        cfg = self.config
        log_post = latents.log_posteriors
        map_idx = int(np.argmax(log_post))
        map_genotype = genotypes[map_idx]
        # containment matrix: contains[v][h]
        contains = np.zeros((len(variants), len(haplotypes)), dtype=bool)
        for vi, v in enumerate(variants):
            for hi, h in enumerate(haplotypes):
                contains[vi, hi] = h.contains(v)
        min_post = cfg.min_variant_posterior_phred
        # variant posteriors
        called: list[tuple[Variant, float]] = []
        for vi, v in enumerate(variants):
            g_has = contains[vi][genotypes].any(axis=1)
            phred = _phred_not(log_post[~g_has])
            if phred >= min_post and contains[vi][map_genotype].any():
                called.append((v, phred))
        if not called:
            return []
        # group called variants into exclusive site groups for GT emission
        site_groups = group_exclusive_sites([v for v, _ in called])
        quality_of = {v: q for v, q in called}
        out: list[SiteCall] = []
        for group in site_groups:
            out.append(self._call_site(group, quality_of, haplotypes, genotypes,
                                       map_genotype, log_post, contains,
                                       variants, phase_set))
        return out

    def _call_site(self, group, quality_of, haplotypes, genotypes, map_genotype,
                   log_post, contains, variants, phase_set) -> SiteCall:
        begin = min(v.begin for v in group)
        end = max(v.end for v in group)
        # per-haplotype allele index at this site (0 = ref, i+1 = group[i])
        hap_allele = np.zeros(len(haplotypes), dtype=np.int32)
        for gi, v in enumerate(group):
            hap_allele[contains[variants.index(v)]] = gi + 1
        gt = [int(hap_allele[h]) for h in map_genotype]
        # genotype quality: posterior mass of genotypes with the same allele
        # multiset at the site
        site_gt = np.sort(hap_allele[genotypes], axis=1)
        called_sig = np.sort(np.asarray(gt))
        matches = (site_gt == called_sig).all(axis=1)
        gq = _phred_not(log_post[~matches])
        site_quality = max(quality_of[v] for v in group)
        return SiteCall(
            begin=begin, end=end,
            alts=list(group),
            quality=site_quality,
            genotype=gt,
            genotype_quality=gq,
            phase_set=phase_set,
            alt_qualities=[quality_of[v] for v in group],
        )


def _phred_not(log_posts: np.ndarray) -> float:
    """phred(P(none of these)) from log posteriors of the complement set."""
    if len(log_posts) == 0:
        return math.inf
    lse = min(logsumexp(log_posts), 0.0)
    return -lse / LN10_DIV_10


__all__ = ["IndividualCaller", "CallerConfig", "SiteCall"]
