"""Stateful haplotype generation with lagging, holdout and backtracking.

Capability-equivalent to the reference's HaplotypeGenerator
(src/core/tools/hapgen/haplotype_generator.{hpp,cpp}:60-160): a GenomeWalker
steps active regions over the candidate stream; a beam of variant paths (the
HaplotypeTree role) is extended with each window's site groups and carries
lagged state across windows for phasing.  Density control mirrors the
reference's mechanisms and limits:

* holdout (--haplotype-holdout-threshold, --max-holdout-depth): when a
  window's raw option product exceeds the threshold, the densest site groups
  are deferred to a holdout stack and re-introduced one at a time against
  the pruned beam;
* overflow (--haplotype-overflow): a hard cap — windows that still overflow
  are split (backtrack 'moderate'+) or their excess paths likelihood-pruned
  (backtrack 'none', the reference CLI default);
* lagging (--lagging-level): paths are trimmed to the variants overlapping
  the next window plus an indicator budget, keeping cross-window phase.

TPU design note: the beam is host-side (tiny, irregular); every pruning
decision is scored by one batched device likelihood round, so the device
sees fixed-shape work regardless of tree shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..types.haplotypes import Haplotype
from ..types.variants import Variant
from .beam import _prune_paths
from .generator import group_exclusive_sites
from .walker import GenomeWalker, Step, WalkerConfig


@dataclass
class GeneratorLimits:
    """Mirrors HaplotypeGenerator::Policies + CLI defaults
    (haplotype_generator.hpp:44-52, option_parser.cpp:450-479)."""

    target: int = 200                 # --max-haplotypes
    holdout: int = 2500               # --haplotype-holdout-threshold
    overflow: int = 200000            # --haplotype-overflow
    max_holdout_depth: int = 20
    lagging_level: str = "moderate"
    extension_level: str = "moderate"
    backtrack_level: str = "none"


@dataclass
class HaplotypePacket:
    haplotypes: list[Haplotype]
    active_begin: int
    active_end: int
    variants: list[Variant]           # candidates represented in this packet
    n_indicators: int                 # lagged carry-over count
    held_out: list[Variant]           # deferred (re-introduced next packets)


class HaplotypeGenerator:
    def __init__(self, candidates: list[Variant], ref_fetch, reads_by_sample,
                 limits: GeneratorLimits | None = None, likelihood_config=None,
                 pad: int = 40):
        self.limits = limits or GeneratorLimits()
        self.ref_fetch = ref_fetch
        self.reads_by_sample = reads_by_sample
        self.likelihood_config = likelihood_config
        self.pad = pad
        self._walker = GenomeWalker(candidates, WalkerConfig(
            lagging_level=self.limits.lagging_level,
            extension_level=self.limits.extension_level))
        self._lagged_paths: list[tuple[Variant, ...]] = [()]
        self._holdout_stack: list[list[Variant]] = []
        # raw (haplotype, read) score memo shared across pruning rounds
        self._score_cache: dict = {}

    def done(self) -> bool:
        return self._walker.done() and not self._holdout_stack

    def generate(self) -> HaplotypePacket | None:
        """Next haplotype packet, or None when the stream is exhausted."""
        lim = self.limits
        held: list[Variant] = []
        if self._holdout_stack:
            # re-introduce one held-out group against the lagged beam
            group = self._holdout_stack.pop()
            step = Step(min(v.begin for v in group),
                        max(v.end for v in group) + 1, group, 0)
        else:
            step = self._walker.walk()
            if step is None:
                return None
        lagged_vars = [v for p in self._lagged_paths for v in p]
        begin = min([step.begin] + [v.begin for v in lagged_vars])
        end = max([step.end, begin + 1] + [v.end + 1 for v in lagged_vars])
        # Haplotypes must span every overlapping read plus the HMM band pad,
        # or the likelihood model cannot score the read (the reference skips
        # such regions via ShortHaplotypeError, caller.cpp:1182-1188; we
        # expand instead so the read still fits).
        lo, hi = begin, end
        for b in self.reads_by_sample:
            ov = b.overlapping(begin, end)
            if len(ov):
                lo = min(lo, int(ov.begins.min()))
                hi = max(hi, int(ov.ends.max()))
        hmm_pad = (self.likelihood_config.max_indel_error
                   if self.likelihood_config is not None else 8)
        # deletions shrink the haplotype sequence; reserve slack for the
        # worst-case path so hap_len >= read_len + 2*band still holds
        del_slack = sum(max(0, (v.end - v.begin) - len(v.alt))
                        for v in set(lagged_vars) | set(step.included))
        region_begin = max(lo - (hmm_pad + self.pad), 0)
        region_end = hi + hmm_pad + self.pad + del_slack

        fresh = step.included[step.n_indicators:] if not self._holdout_stack \
            else step.included
        groups = group_exclusive_sites(fresh)
        # holdout: defer densest groups while the raw product exceeds the
        # holdout threshold (haplotype_generator.cpp holdout stack)
        n_paths = max(len(self._lagged_paths), 1)
        product = n_paths
        for g in groups:
            product *= len(g) + 1
        # only dense site piles are held out — wide-but-sparse windows are
        # handled by likelihood beam pruning to `target` instead
        depth = 0
        while product > lim.holdout and len(groups) > 1 \
                and depth < lim.max_holdout_depth \
                and max(len(g) for g in groups) >= 3:
            k = int(np.argmax([len(g) for g in groups]))
            product //= (len(groups[k]) + 1)
            self._holdout_stack.append(groups[k])
            held.extend(groups[k])
            del groups[k]
            depth += 1
        if product > lim.overflow:
            if lim.backtrack_level != "none" and len(groups) > 1:
                # backtrack: push the right half of the window back
                half = len(groups) // 2
                for g in groups[half:]:
                    self._holdout_stack.append(g)
                    held.extend(g)
                groups = groups[:half]

        # pruning rounds only need the reads overlapping this packet
        local_reads = [b.overlapping(region_begin, region_end)
                       for b in self.reads_by_sample]
        paths = list(self._lagged_paths)
        for group in groups:
            opts: list[Variant | None] = [None] + list(group)
            if len(paths) * len(opts) > lim.target and len(paths) > 1:
                keep = max(lim.target // len(opts), 2)
                paths = _prune_paths(paths, region_begin, region_end,
                                     self.ref_fetch, local_reads,
                                     keep, self.likelihood_config,
                                     self._score_cache)
            new_paths = []
            for p in paths:
                for v in opts:
                    if v is None:
                        new_paths.append(p)
                    elif not p or _compatible(p, v):
                        new_paths.append(_insert(p, v))
            paths = new_paths
        if len(paths) > lim.target:
            paths = _prune_paths(paths, region_begin, region_end,
                                 self.ref_fetch, local_reads,
                                 lim.target, self.likelihood_config,
                                 self._score_cache)
        variants = sorted({v for p in paths for v in p} | set(fresh),
                          key=lambda v: (v.begin, v.end, v.alt))
        haplotypes = [Haplotype.build(region_begin, region_end, p, self.ref_fetch)
                      for p in paths]
        packet = HaplotypePacket(haplotypes, begin, end,
                                 variants, step.n_indicators, held)
        self._lag(paths, end)
        return packet

    def remove(self, discarded_paths: set) -> None:
        """Filter feedback: drop lagged paths the caller filtered out
        (HaplotypeTree::prune_unique equivalent)."""
        self._lagged_paths = [p for p in self._lagged_paths
                              if p not in discarded_paths] or [()]

    # -- internals -----------------------------------------------------------

    def _lag(self, paths, window_end: int) -> None:
        """Trim paths to the lag-relevant suffix and dedup (lagging)."""
        if self.limits.lagging_level == "none":
            self._lagged_paths = [()]
            return
        lag_span = {"conservative": 150, "moderate": 350,
                    "optimistic": 700, "aggressive": 1500}[self.limits.lagging_level]
        cutoff = window_end - lag_span
        seen = set()
        lagged = []
        for p in paths:
            suffix = tuple(v for v in p if v.end > cutoff)
            if suffix not in seen:
                seen.add(suffix)
                lagged.append(suffix)
        self._lagged_paths = lagged[: self.limits.target] or [()]


def _compatible(path: tuple, v: Variant) -> bool:
    return all(x.end <= v.begin or v.end <= x.begin
               or (x.begin == x.end == v.begin) or (v.begin == v.end == x.begin)
               for x in path) and not any(
                   x.begin == v.begin and x.end == v.end and x.alt == v.alt
                   for x in path)


def _insert(path: tuple, v: Variant) -> tuple:
    out = list(path)
    out.append(v)
    out.sort(key=lambda x: (x.begin, x.end))
    return tuple(out)


__all__ = ["HaplotypeGenerator", "GeneratorLimits", "HaplotypePacket"]
