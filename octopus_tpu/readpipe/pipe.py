"""Read preprocessing: transforms -> filters -> downsampling.

Capability-equivalent to the reference's ReadPipe
(src/readpipe/read_pipe.{hpp,cpp}) with the default chain built by
option_collation.cpp make_read_pipe/make_read_filterer/make_read_transformers:

prefilter transforms: base-quality capping, soft-clip boundary masking;
filters: valid qualities, well-formed CIGAR, mapped, MQ >= 5, >= 20 bases of
quality >= 20, not duplicate (5'-position + cigar definition), not marked
duplicate/QC-fail, no secondary/supplementary;
downsampling: coverage-targeted above 1000x down to 500x.

Everything operates on ReadBatch columns; no per-read python in the hot
paths except the duplicate grouping (hash-grouped numpy).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..basics import cigar as cg
from ..basics.reads import (
    FLAG_DUPLICATE,
    FLAG_QC_FAIL,
    FLAG_REVERSE,
    FLAG_SECONDARY,
    FLAG_SUPPLEMENTARY,
    FLAG_UNMAPPED,
    ReadBatch,
)


@dataclass
class ReadPipeConfig:
    max_base_quality: int | None = None        # cap (max-base-quality)
    mask_soft_clipped_boundary_bases: int = 2
    min_mapping_quality: int = 5
    good_base_quality: int = 20
    min_good_bases: int = 20
    allow_marked_duplicates: bool = False
    allow_octopus_duplicates: bool = False
    allow_qc_fails: bool = False
    allow_secondary: bool = False
    allow_supplementary: bool = False
    downsample_above: int = 1000
    downsample_target: int = 500
    disable_preprocessing: bool = False


@dataclass
class ReadPipeReport:
    """Mirrors ReadPipe::Report (read_pipe.hpp:42-48)."""

    raw_depth: int = 0
    filtered_depth: int = 0
    downsampled_depth: int = 0
    n_raw: int = 0
    n_filtered: int = 0
    n_downsampled: int = 0


class ReadPipe:
    def __init__(self, config: ReadPipeConfig | None = None, seed: int = 42):
        self.config = config or ReadPipeConfig()
        self._rng = np.random.default_rng(seed)

    def process(self, batch: ReadBatch) -> tuple[ReadBatch, ReadPipeReport]:
        report = ReadPipeReport(n_raw=len(batch))
        if len(batch) == 0:
            return batch, report
        if not self.config.disable_preprocessing:
            batch = self._transform(batch)
        batch = batch.take(self._filter_mask(batch))
        report.n_filtered = len(batch)
        if not self.config.disable_preprocessing:
            batch = self._downsample(batch)
        report.n_downsampled = len(batch)
        return batch, report

    # -- transforms --------------------------------------------------------

    def _transform(self, batch: ReadBatch) -> ReadBatch:
        cfg = self.config
        quals = batch.quals.copy()
        if cfg.max_base_quality is not None:
            np.minimum(quals, cfg.max_base_quality, out=quals)
        if cfg.mask_soft_clipped_boundary_bases > 0:
            self._mask_soft_clip_boundaries(batch, quals, cfg.mask_soft_clipped_boundary_bases)
        batch.quals = quals
        return batch

    @staticmethod
    def _mask_soft_clip_boundaries(batch: ReadBatch, quals: np.ndarray, boundary: int) -> None:
        """Zero qualities of soft-clipped bases plus `boundary` adjacent
        aligned bases (MaskSoftClippedBoundraryBases)."""
        for i in range(len(batch)):
            cigar = batch.cigar(i)
            if len(cigar) == 0 or not (cigar[:, 1] == cg.S).any():
                continue
            left, right = cg.soft_clip_sizes(cigar)
            o = batch.seq_offsets[i]
            L = batch.seq_offsets[i + 1] - o
            if left:
                quals[o:o + min(left + boundary, L)] = 0
            if right:
                start = max(L - right - boundary, 0)
                quals[o + start:o + L] = 0

    # -- filters -----------------------------------------------------------

    def _filter_mask(self, batch: ReadBatch) -> np.ndarray:
        cfg = self.config
        n = len(batch)
        keep = np.ones(n, bool)
        flags = batch.flags
        keep &= (flags & FLAG_UNMAPPED) == 0
        # well-formed cigar: nonzero ops and query span == seq length
        lens = batch.lengths()
        qspans = np.zeros(n, np.int64)
        op_read = np.repeat(np.arange(n), np.diff(batch.cigar_offsets))
        consumes = cg.CONSUMES_QUERY[batch.cigar_ops[:, 1]]
        np.add.at(qspans, op_read, np.where(consumes, batch.cigar_ops[:, 0], 0))
        keep &= qspans == lens
        keep &= np.diff(batch.cigar_offsets) > 0
        if cfg.disable_preprocessing:
            return keep
        keep &= batch.mapq >= cfg.min_mapping_quality
        # sufficient good-quality bases
        good = np.zeros(n, np.int64)
        read_of_base = np.repeat(np.arange(n), lens)
        np.add.at(good, read_of_base, (batch.quals >= cfg.good_base_quality).astype(np.int64))
        keep &= good >= cfg.min_good_bases
        if not cfg.allow_marked_duplicates:
            keep &= (flags & FLAG_DUPLICATE) == 0
        if not cfg.allow_qc_fails:
            keep &= (flags & FLAG_QC_FAIL) == 0
        if not cfg.allow_secondary:
            keep &= (flags & FLAG_SECONDARY) == 0
        if not cfg.allow_supplementary:
            keep &= (flags & FLAG_SUPPLEMENTARY) == 0
        if not cfg.allow_octopus_duplicates:
            keep &= self._not_duplicate_mask(batch, keep)
        return keep

    @staticmethod
    def _not_duplicate_mask(batch: ReadBatch, candidate: np.ndarray) -> np.ndarray:
        """Five-prime position + cigar duplicate definition: among reads with
        identical (5' position, strand, cigar, mate begin), keep the one with
        the highest base-quality sum."""
        n = len(batch)
        lens = batch.lengths()
        read_of_base = np.repeat(np.arange(n), lens)
        qsums = np.zeros(n, np.int64)
        np.add.at(qsums, read_of_base, batch.quals.astype(np.int64))
        is_rev = batch.is_reverse()
        five_prime = np.where(is_rev, batch.ends, batch.begins)
        mate = batch.mate_begins if batch.mate_begins is not None else np.zeros(n, np.int64)
        # group key: hash of (five_prime, strand, cigar bytes, mate)
        keys = {}
        keep = np.ones(n, bool)
        for i in np.flatnonzero(candidate):
            i = int(i)
            key = (int(five_prime[i]), bool(is_rev[i]),
                   batch.cigar(i).tobytes(), int(mate[i]))
            best = keys.get(key)
            if best is None:
                keys[key] = i
            elif qsums[i] > qsums[best]:
                keep[best] = False
                keys[key] = i
            else:
                keep[i] = False
        return keep

    # -- downsampling ------------------------------------------------------

    def _downsample(self, batch: ReadBatch) -> ReadBatch:
        """Coverage-targeted random downsampling (src/readpipe/downsampling):
        while any position exceeds `downsample_above`, remove random reads
        covering the deepest positions until max depth <= target."""
        cfg = self.config
        if len(batch) == 0:
            return batch
        lo = int(batch.begins.min())
        hi = int(batch.ends.max())
        cov = np.zeros(hi - lo + 1, np.int64)
        np.add.at(cov, batch.begins - lo, 1)
        np.add.at(cov, batch.ends - lo, -1)
        cov = np.cumsum(cov)
        if cov.max() <= cfg.downsample_above:
            return batch
        keep = np.ones(len(batch), bool)
        order = self._rng.permutation(len(batch))
        for i in order:
            peak = cov.max()
            if peak <= cfg.downsample_target:
                break
            b, e = int(batch.begins[i]) - lo, int(batch.ends[i]) - lo
            if cov[b:e].max() >= cfg.downsample_target:
                keep[i] = False
                cov[b:e] -= 1
        return batch.take(keep)


__all__ = ["ReadPipe", "ReadPipeConfig", "ReadPipeReport"]
