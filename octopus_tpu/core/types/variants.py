"""Alleles and variants.

Capability-equivalent to the reference's Allele/Variant
(src/core/types/allele.hpp, variant.hpp) including left-alignment /
normalisation utilities.  Sequences are base-code uint8 arrays; positions are
contig-local half-open intervals.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from ...basics.sequence import decode_sequence


@dataclass(frozen=True)
class Allele:
    """A replacement sequence over [begin, end) of the contig."""

    begin: int
    end: int
    seq: bytes          # base codes as bytes (hashable)

    @staticmethod
    def make(begin: int, end: int, codes: np.ndarray | bytes) -> "Allele":
        if isinstance(codes, np.ndarray):
            codes = codes.astype(np.uint8).tobytes()
        return Allele(begin, end, codes)

    @property
    def codes(self) -> np.ndarray:
        return np.frombuffer(self.seq, dtype=np.uint8)

    @property
    def ref_span(self) -> int:
        return self.end - self.begin

    def __len__(self) -> int:
        return len(self.seq)

    def __str__(self) -> str:
        return f"{self.begin}-{self.end}:{decode_sequence(self.codes)}"


@dataclass(frozen=True, order=True)
class Variant:
    """Ref allele -> alt allele at one site."""

    begin: int
    end: int            # end of the reference allele
    ref: bytes
    alt: bytes

    @staticmethod
    def make(begin: int, ref_codes, alt_codes) -> "Variant":
        if isinstance(ref_codes, np.ndarray):
            ref_codes = ref_codes.astype(np.uint8).tobytes()
        if isinstance(alt_codes, np.ndarray):
            alt_codes = alt_codes.astype(np.uint8).tobytes()
        return Variant(begin, begin + len(ref_codes), ref_codes, alt_codes)

    @property
    def ref_codes(self) -> np.ndarray:
        return np.frombuffer(self.ref, dtype=np.uint8)

    @property
    def alt_codes(self) -> np.ndarray:
        return np.frombuffer(self.alt, dtype=np.uint8)

    @property
    def alt_allele(self) -> Allele:
        return Allele(self.begin, self.end, self.alt)

    @property
    def ref_allele(self) -> Allele:
        return Allele(self.begin, self.end, self.ref)

    def is_snv(self) -> bool:
        return len(self.ref) == 1 and len(self.alt) == 1

    def is_mnv(self) -> bool:
        return len(self.ref) == len(self.alt) and len(self.ref) > 1

    def is_insertion(self) -> bool:
        return len(self.alt) > len(self.ref)

    def is_deletion(self) -> bool:
        return len(self.alt) < len(self.ref)

    def is_indel(self) -> bool:
        return len(self.ref) != len(self.alt)

    def indel_size(self) -> int:
        return abs(len(self.alt) - len(self.ref))

    def __str__(self) -> str:
        return (f"{self.begin}:{decode_sequence(self.ref_codes)}"
                f">{decode_sequence(self.alt_codes)}")


def left_align(variant: Variant, ref_fetch, min_begin: int = 0) -> Variant:
    """Shift a pure indel left over repeated sequence (VCF normalisation).

    ref_fetch(begin, end) -> base codes.  Mirrors the reference's
    left-alignment utilities (src/core/types/variant.cpp).
    """
    ref = variant.ref_codes
    alt = variant.alt_codes
    begin = variant.begin
    # trim common suffix
    while len(ref) and len(alt) and ref[-1] == alt[-1] and (len(ref) > 1 or len(alt) > 1):
        ref, alt = ref[:-1], alt[:-1]
    # trim common prefix
    while len(ref) > 1 and len(alt) > 1 and ref[0] == alt[0]:
        ref, alt = ref[1:], alt[1:]
        begin += 1
    if (len(ref) == 0) != (len(alt) == 0):
        # pure indel: rotate left while the trailing base of the longer
        # allele equals the base preceding the site
        while begin > min_begin:
            prev = ref_fetch(begin - 1, begin)
            if len(prev) == 0:
                break
            b = int(prev[0])
            longer = ref if len(ref) else alt
            if int(longer[-1]) != b:
                break
            longer = np.concatenate(([b], longer[:-1])).astype(np.uint8)
            if len(ref):
                ref = longer
            else:
                alt = longer
            begin -= 1
    return Variant.make(begin, np.asarray(ref, np.uint8), np.asarray(alt, np.uint8))


__all__ = ["Allele", "Variant", "left_align"]
