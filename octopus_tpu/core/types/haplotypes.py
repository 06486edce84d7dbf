"""Haplotypes: a reference window with a set of variants applied.

Capability-equivalent to the reference's Haplotype
(src/core/types/haplotype.hpp:50-145): immutable, knows its region, its
explicit variants, its full sequence, a CIGAR vs the reference (used for the
SNV error model's substitution mask), and supports contains(variant) /
difference queries.  The dense integer id the reference adds via
IndexedHaplotype is implicit here — haplotypes live in lists and device code
uses list indices.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from ...basics import cigar as cg
from .variants import Variant


@dataclass(frozen=True)
class Haplotype:
    """region [begin, end) of a contig + sorted non-overlapping variants."""

    begin: int
    end: int
    variants: tuple[Variant, ...]
    _sequence: np.ndarray = field(repr=False, compare=False)
    _cigar: np.ndarray = field(repr=False, compare=False)

    @staticmethod
    def build(begin: int, end: int, variants, ref_fetch) -> "Haplotype":
        """Apply sorted, non-overlapping variants to reference [begin, end).

        ref_fetch(begin, end) -> base codes.
        """
        variants = tuple(sorted(variants, key=lambda v: (v.begin, v.end)))
        parts: list[np.ndarray] = []
        cig: list[list[int]] = []

        def push(length: int, op: int) -> None:
            if length <= 0:
                return
            if cig and cig[-1][1] == op:
                cig[-1][0] += length
            else:
                cig.append([length, op])

        pos = begin
        for v in variants:
            if v.begin < pos or v.end > end:
                raise ValueError(f"variant {v} outside/overlapping haplotype build")
            if v.begin > pos:
                parts.append(ref_fetch(pos, v.begin))
                push(v.begin - pos, cg.EQ)
            ref_len, alt_len = v.end - v.begin, len(v.alt)
            parts.append(v.alt_codes)
            common = min(ref_len, alt_len)
            push(common, cg.X if common else cg.EQ)
            if alt_len > ref_len:
                push(alt_len - ref_len, cg.I)
            elif ref_len > alt_len:
                push(ref_len - alt_len, cg.D)
            pos = v.end
        if pos < end:
            parts.append(ref_fetch(pos, end))
            push(end - pos, cg.EQ)
        seq = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        cigar = np.asarray(cig, np.int32).reshape(-1, 2)
        return Haplotype(begin, end, variants, seq, cigar)

    @property
    def sequence(self) -> np.ndarray:
        return self._sequence

    @property
    def cigar(self) -> np.ndarray:
        """CIGAR vs the reference over [begin, end) with =/X/I/D ops."""
        return self._cigar

    def __len__(self) -> int:
        return len(self._sequence)

    def __hash__(self) -> int:
        return hash((self.begin, self.end, self.variants))

    def contains(self, variant: Variant) -> bool:
        return variant in self._variant_set

    @cached_property
    def _variant_set(self) -> frozenset:
        return frozenset(self.variants)

    def substitution_mask(self) -> np.ndarray:
        """Bool mask over the haplotype sequence marking substituted bases
        (used by the SNV error model; mirrors make_substitution_mask in
        repeat_based_snv_error_model.cpp)."""
        out = np.zeros(len(self._sequence), dtype=bool)
        i = 0
        for length, op in self._cigar:
            if cg.CONSUMES_QUERY[op]:
                if op == cg.X:
                    out[i:i + length] = True
                i += length
        return out

    def difference(self, other: "Haplotype") -> list[Variant]:
        """Variants in self but not in other."""
        return [v for v in self.variants if not other.contains(v)]


__all__ = ["Haplotype"]
