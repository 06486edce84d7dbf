"""GenomeWalker: step active regions over a candidate-variant stream.

Capability-equivalent to the reference's GenomeWalker
(src/core/tools/hapgen/genome_walker.{hpp,cpp}): given the sorted candidate
stream and the previous active region, propose the next region subject to an
inclusion budget and indicator (carry-over) / extension policies.  The
indicator policy mirrors the lagging levels: higher lagging carries more of
the previous window's candidates into the next (for cross-window phasing);
the extension policy bounds how far past the last included candidate the
region extends.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..types.variants import Variant

#: candidates carried over from the previous window per lagging level
_INDICATOR_BUDGET = {"none": 0, "conservative": 2, "moderate": 4,
                     "optimistic": 8, "aggressive": 16}
#: bases of extension past the last included candidate per extension level
_EXTENSION = {"minimal": 10, "conservative": 25, "moderate": 60,
              "aggressive": 150, "unlimited": 1 << 30}


@dataclass
class WalkerConfig:
    max_included: int = 16            # new candidate groups per window
    lagging_level: str = "moderate"
    extension_level: str = "moderate"
    max_region_size: int = 30000


@dataclass
class Step:
    begin: int
    end: int
    included: list        # candidates of this window (indicators first)
    n_indicators: int     # how many lead candidates are carried over


class GenomeWalker:
    def __init__(self, candidates: list[Variant], config: WalkerConfig | None = None):
        self.candidates = sorted(candidates, key=lambda v: (v.begin, v.end))
        self.config = config or WalkerConfig()
        self._next = 0                 # first not-yet-included candidate
        self._prev_included: list[Variant] = []

    def done(self) -> bool:
        return self._next >= len(self.candidates)

    def walk(self) -> Step | None:
        """Propose the next active region, or None when exhausted."""
        if self.done():
            return None
        cfg = self.config
        indicators = self._prev_included[-_INDICATOR_BUDGET[cfg.lagging_level]:] \
            if self._prev_included else []
        take = cfg.max_included
        fresh = []
        first_begin = self.candidates[self._next].begin
        while self._next < len(self.candidates) and len(fresh) < take:
            v = self.candidates[self._next]
            if v.begin - first_begin > cfg.max_region_size:
                break
            fresh.append(v)
            self._next += 1
        included = indicators + fresh
        begin = min(v.begin for v in included)
        last_end = max(v.end for v in included)
        end = last_end + _EXTENSION[cfg.extension_level]
        self._prev_included = fresh
        return Step(begin, max(end, begin + 1), included, len(indicators))


__all__ = ["GenomeWalker", "WalkerConfig", "Step"]
