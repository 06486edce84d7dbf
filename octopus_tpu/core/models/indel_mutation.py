"""Repeat-context indel mutation model — bit-exact vs the reference tables.

Equivalent to the reference's IndelMutationModel
(src/core/models/mutation/indel_mutation_model.{hpp,cpp}).  The gap-open
enrichment and gap-extension tables are the reference's own generated
arrays (src/core/models/mutation/indel_mutation_model_config.hpp, derived
from Montgomery et al. Genome Research 2013), dumped bit-for-bit by
tests/golden/golden_indel_table.cpp (which compiles the reference header in
place) into resources/indel_tables.npz and loaded here.

Semantics mirrored line-for-line:

- ``calculate_gap_open_prior`` (indel_mutation_model.cpp:17-25):
  ``min(base_prior * enrichment[period][num_periods], 1.0)`` with period
  clamped to 10 and num_periods to 30.
- ``calculate_gap_extend_prior`` (:27-36): ``max(open_prior,
  extension[period][num_periods][gap])`` with num_periods clamped to 50 and
  gap to 100; the floor uses the UNclamped open prior.
- The constructor precomputes cells for period 0..max_period and
  periodicity 0..max_periodicity, clamping ``open`` at
  ``max_open_probability`` and ``extend`` at ``max_extend_probability``
  (:40-56).
- ``evaluate`` marks only the FIRST period of each tandem tract with the
  enriched state (:89-97) and keeps the max-open state per position.
- ``calculate_indel_probability(pos, len) = open[pos] *
  prod(extend[pos][1..len-1])`` (:117-123).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


_TABLES_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))), "resources",
    "indel_tables.npz")

_tables = np.load(_TABLES_PATH)
# (11, 31): enrichment_model[period][num_periods]
ENRICHMENT_TABLE = np.ascontiguousarray(_tables["enrichment"])
# (11, 51, 101): extension_model[period][num_periods][current_gap]
EXTENSION_TABLE = np.ascontiguousarray(_tables["extension"])
del _tables


@dataclass(frozen=True)
class IndelMutationParams:
    indel_mutation_prior: float = 1e-4
    max_period: int = 10
    max_periodicity: int = 50
    max_indel_length: int = 50
    max_open_probability: float = 0.9
    max_extend_probability: float = 1.0


def enrichment(period: int, num_periods: int) -> float:
    """Gap-open enrichment factor for a repeat context (table lookup)."""
    if period <= 0 or num_periods <= 0:
        return 1.0
    p = min(period, ENRICHMENT_TABLE.shape[0] - 1)
    n = min(num_periods, ENRICHMENT_TABLE.shape[1] - 1)
    return float(ENRICHMENT_TABLE[p, n])


def gap_open_prior(base_prior: float, period: int, num_periods: int,
                   max_open: float = 1.0) -> float:
    """calculate_gap_open_prior; pass max_open to apply the cell clamp."""
    return min(base_prior * enrichment(period, num_periods), 1.0, max_open)


def extension_probability(period: int, num_periods: int, gap: int,
                          open_prior: float = 0.0) -> float:
    """calculate_gap_extend_prior: table value floored at the open prior."""
    p = min(max(period, 0), EXTENSION_TABLE.shape[0] - 1)
    n = min(max(num_periods, 0), EXTENSION_TABLE.shape[1] - 1)
    g = min(max(gap, 0), EXTENSION_TABLE.shape[2] - 1)
    return max(open_prior, float(EXTENSION_TABLE[p, n, g]))


class ContextIndelModel:
    """Per-position indel mutation probabilities over a reference chunk.

    Exposes ``gap_open`` (n,) and ``gap_extend`` (n, max_indel_length)
    float64 arrays mirroring IndelMutationModel::ContextIndelModel.
    """

    def __init__(self, ref_codes: np.ndarray,
                 params: IndelMutationParams | None = None):
        self.params = params = params or IndelMutationParams()
        n = len(ref_codes)
        # Precompute model cells exactly as the reference ctor (:40-56).
        P, N, L = params.max_period + 1, params.max_periodicity + 1, \
            params.max_indel_length
        periods = np.minimum(np.arange(N), ENRICHMENT_TABLE.shape[1] - 1)
        open_prior = np.minimum(
            params.indel_mutation_prior
            * ENRICHMENT_TABLE[:P][:, periods], 1.0)           # (P, N) unclamped
        cell_open = np.minimum(open_prior, params.max_open_probability)
        ext = EXTENSION_TABLE[:P, :N, :L]                       # (P, N, L)
        cell_extend = np.minimum(np.maximum(ext, open_prior[:, :, None]),
                                 params.max_extend_probability)
        self._cell_open = cell_open
        self._cell_extend = cell_extend
        base_open = cell_open[0, 0]
        self.gap_open = np.full(n, base_open, np.float64)
        self.gap_extend = np.broadcast_to(cell_extend[0, 0], (n, L)).copy()
        self.period = np.zeros(n, np.int32)
        self.num_periods = np.zeros(n, np.int32)
        from ...utils.tandem import extract_exact_tandem_repeats_arrays
        reps = extract_exact_tandem_repeats_arrays(
            ref_codes, 1, min(params.max_period, 5))
        if len(reps):
            # vectorised form of the sequential update loop: each position
            # ends with the max open probability among covering tracts
            # (ties -> the earliest tract, as the sequential `<` check
            # never overwrites an equal value); only the first period of
            # each tract carries the enriched state (:89-97)
            pos0 = reps[:, 0].astype(np.int64)
            per = reps[:, 2].astype(np.int64)
            num = np.minimum(reps[:, 1] // reps[:, 2],
                             params.max_periodicity).astype(np.int64)
            keep = num >= 1
            pos0, per, num = pos0[keep], per[keep], num[keep]
            span = np.minimum(pos0 + per, n) - pos0
            rep_of = np.repeat(np.arange(len(pos0)), span)
            pos = (np.arange(int(span.sum()))
                   - np.repeat(np.cumsum(span) - span, span)
                   + pos0[rep_of])
            open_p = cell_open[per, num][rep_of]
            order = np.lexsort((rep_of, -open_p, pos))
            _, first = np.unique(pos[order], return_index=True)
            win = order[first]
            win = win[open_p[win] > base_open]
            if len(win):
                idx = pos[win]
                wrep = rep_of[win]
                self.gap_open[idx] = open_p[win]
                self.gap_extend[idx] = cell_extend[per[wrep], num[wrep]]
                self.period[idx] = per[wrep]
                self.num_periods[idx] = num[wrep]

    def indel_probability(self, pos: int, length: int) -> float:
        """P(indel of `length` bases at `pos`) = open * prod extensions."""
        pos = min(max(pos, 0), len(self.gap_open) - 1)
        L = self.gap_extend.shape[1]
        stop = min(length, L)
        return float(self.gap_open[pos]
                     * np.prod(self.gap_extend[pos, 1:stop]))


__all__ = ["IndelMutationParams", "ContextIndelModel", "enrichment",
           "gap_open_prior", "extension_probability", "ENRICHMENT_TABLE",
           "EXTENSION_TABLE"]
