"""Genomic interval primitives.

Equivalent in capability to the reference's ``GenomicRegion``/``ContigRegion``
(reference: src/basics/genomic_region.hpp, src/basics/contig_region.hpp) and
the interval algebra of src/concepts/mappable.hpp — but implemented as two
frozen dataclasses plus free functions, with numpy-vectorised versions of the
overlap algebra for use on batches (the TPU build operates on arrays of
intervals, not object graphs).

Half-open 0-based coordinates [begin, end) throughout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np


@dataclass(frozen=True, order=True)
class ContigRegion:
    """An interval on an unnamed contig: [begin, end)."""

    begin: int
    end: int

    def __post_init__(self) -> None:
        if self.begin > self.end:
            raise ValueError(f"ContigRegion begin {self.begin} > end {self.end}")

    def __len__(self) -> int:
        return self.end - self.begin

    @property
    def size(self) -> int:
        return self.end - self.begin

    def is_empty(self) -> bool:
        return self.begin == self.end

    def overlaps(self, other: "ContigRegion") -> bool:
        return overlaps(self, other)

    def contains(self, other: "ContigRegion") -> bool:
        return contains(self, other)


@dataclass(frozen=True, order=True)
class GenomicRegion:
    """A named-contig interval: contig:[begin, end)."""

    contig: str
    begin: int
    end: int

    def __post_init__(self) -> None:
        if self.begin > self.end:
            raise ValueError(f"GenomicRegion begin {self.begin} > end {self.end}")

    def __len__(self) -> int:
        return self.end - self.begin

    @property
    def size(self) -> int:
        return self.end - self.begin

    @property
    def contig_region(self) -> ContigRegion:
        return ContigRegion(self.begin, self.end)

    def is_empty(self) -> bool:
        return self.begin == self.end

    def __str__(self) -> str:
        return f"{self.contig}:{self.begin}-{self.end}"

    def overlaps(self, other: "GenomicRegion") -> bool:
        return self.contig == other.contig and overlaps(self, other)

    def contains(self, other: "GenomicRegion") -> bool:
        return self.contig == other.contig and contains(self, other)

    def with_begin(self, begin: int) -> "GenomicRegion":
        return GenomicRegion(self.contig, begin, self.end)

    def with_end(self, end: int) -> "GenomicRegion":
        return GenomicRegion(self.contig, self.begin, end)


RegionLike = ContigRegion | GenomicRegion


def _same_contig(lhs: RegionLike, rhs: RegionLike) -> bool:
    lc = getattr(lhs, "contig", None)
    rc = getattr(rhs, "contig", None)
    return lc is None or rc is None or lc == rc


# ---------------------------------------------------------------------------
# Scalar interval algebra (reference: src/concepts/mappable.hpp free functions)
# ---------------------------------------------------------------------------

def overlaps(lhs: RegionLike, rhs: RegionLike) -> bool:
    """True iff intervals share at least one position, or an empty interval
    abuts/lies within the other (mirrors the reference's convention that empty
    regions overlap regions they are inside of)."""
    if not _same_contig(lhs, rhs):
        return False
    if lhs.begin == lhs.end or rhs.begin == rhs.end:
        # Empty interval: overlaps iff its point is inside [begin, end] of other
        p, q = (lhs, rhs) if lhs.begin == lhs.end else (rhs, lhs)
        return q.begin <= p.begin <= q.end
    return lhs.begin < rhs.end and rhs.begin < lhs.end


def contains(outer: RegionLike, inner: RegionLike) -> bool:
    return _same_contig(outer, inner) and outer.begin <= inner.begin and inner.end <= outer.end


def are_adjacent(lhs: RegionLike, rhs: RegionLike) -> bool:
    return _same_contig(lhs, rhs) and (lhs.end == rhs.begin or rhs.end == lhs.begin)


def begins_before(lhs: RegionLike, rhs: RegionLike) -> bool:
    return lhs.begin < rhs.begin


def ends_before(lhs: RegionLike, rhs: RegionLike) -> bool:
    return lhs.end < rhs.end


def is_before(lhs: RegionLike, rhs: RegionLike) -> bool:
    """lhs entirely before rhs (no overlap)."""
    return _same_contig(lhs, rhs) and lhs.end <= rhs.begin and lhs.begin != rhs.begin


def overlap_size(lhs: RegionLike, rhs: RegionLike) -> int:
    if not _same_contig(lhs, rhs):
        return 0
    return max(0, min(lhs.end, rhs.end) - max(lhs.begin, rhs.begin))


def intervening_region(lhs: RegionLike, rhs: RegionLike):
    """The gap between two non-overlapping regions (empty if adjacent)."""
    if overlaps(lhs, rhs):
        raise ValueError("intervening_region: regions overlap")
    lo, hi = (lhs, rhs) if lhs.begin <= rhs.begin else (rhs, lhs)
    return _make_like(lhs, lo.end, hi.begin)


def _make_like(template: RegionLike, begin: int, end: int) -> RegionLike:
    if isinstance(template, GenomicRegion):
        return GenomicRegion(template.contig, begin, end)
    return ContigRegion(begin, end)


def encompassing_region(regions: Iterable[RegionLike]) -> RegionLike:
    regions = list(regions)
    if not regions:
        raise ValueError("encompassing_region: empty input")
    first = regions[0]
    begin = min(r.begin for r in regions)
    end = max(r.end for r in regions)
    return _make_like(first, begin, end)


def closed_region(lhs: RegionLike, rhs: RegionLike) -> RegionLike:
    return _make_like(lhs, min(lhs.begin, rhs.begin), max(lhs.end, rhs.end))


def expand(region: RegionLike, lhs: int, rhs: int | None = None) -> RegionLike:
    """Expand (or shrink with negative amounts) a region on both sides."""
    if rhs is None:
        rhs = lhs
    begin = max(0, region.begin - lhs)
    end = max(begin, region.end + rhs)
    return _make_like(region, begin, end)


def shift(region: RegionLike, amount: int) -> RegionLike:
    return _make_like(region, region.begin + amount, region.end + amount)


def left_overhang_size(lhs: RegionLike, rhs: RegionLike) -> int:
    return max(0, rhs.begin - lhs.begin)


def right_overhang_size(lhs: RegionLike, rhs: RegionLike) -> int:
    return max(0, lhs.end - rhs.end)


def head_region(region: RegionLike, n: int = 0) -> RegionLike:
    return _make_like(region, region.begin, min(region.end, region.begin + n))


def tail_region(region: RegionLike, n: int = 0) -> RegionLike:
    return _make_like(region, max(region.begin, region.end - n), region.end)


# ---------------------------------------------------------------------------
# Vectorised interval algebra over arrays of [begin, end) pairs.
# The batch building blocks used by the read pipeline / candidate scanner;
# replaces the reference's iterator-range algorithms
# (src/utils/mappable_algorithms.hpp) with sorted-array searchsorted queries.
# ---------------------------------------------------------------------------

def overlap_mask(begins: np.ndarray, ends: np.ndarray, region_begin: int, region_end: int) -> np.ndarray:
    """Boolean mask of intervals overlapping [region_begin, region_end)."""
    return (begins < region_end) & (ends > region_begin)


def contained_mask(begins: np.ndarray, ends: np.ndarray, region_begin: int, region_end: int) -> np.ndarray:
    return (begins >= region_begin) & (ends <= region_end)


def overlap_range_sorted(begins_sorted: np.ndarray, max_span: int, region_begin: int, region_end: int) -> tuple[int, int]:
    """Candidate index range [lo, hi) of intervals (sorted by begin) that may
    overlap the query, given the maximum interval span in the set.

    This is the array equivalent of the reference's O(log n) overlap_range on
    a MappableFlatSet: anything beginning in [region_begin - max_span,
    region_end) is a candidate; callers then apply `overlap_mask`.
    """
    lo = int(np.searchsorted(begins_sorted, region_begin - max_span, side="left"))
    hi = int(np.searchsorted(begins_sorted, region_end, side="left"))
    return lo, hi


__all__ = [
    "ContigRegion",
    "GenomicRegion",
    "overlaps",
    "contains",
    "are_adjacent",
    "begins_before",
    "ends_before",
    "is_before",
    "overlap_size",
    "intervening_region",
    "encompassing_region",
    "closed_region",
    "expand",
    "shift",
    "left_overhang_size",
    "right_overhang_size",
    "head_region",
    "tail_region",
    "overlap_mask",
    "contained_mask",
    "overlap_range_sorted",
]
