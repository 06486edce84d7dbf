"""Structure-of-arrays read batches.

The TPU-native replacement for the reference's ``AlignedRead`` object vectors
(src/basics/aligned_read.hpp:32-170).  Reads live in flat numpy arrays with
per-read offset tables (ragged layout); every read-pipeline stage (filters,
transforms, downsampling, candidate scanning) operates on whole batches with
vectorised ops, and the likelihood layer pads slices of these arrays into
fixed device buckets.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Iterable, Sequence

import numpy as np

from . import cigar as cg
from .genomic_region import GenomicRegion
from .sequence import encode_sequence

# BAM flag bits
FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST_OF_PAIR = 0x40
FLAG_SECOND_OF_PAIR = 0x80
FLAG_SECONDARY = 0x100
FLAG_QC_FAIL = 0x200
FLAG_DUPLICATE = 0x400
FLAG_SUPPLEMENTARY = 0x800


@dataclass
class ReadBatch:
    """A batch of aligned reads on one contig (SoA, ragged)."""

    contig: str
    # per-read scalars
    begins: np.ndarray        # int64 (n,) 0-based leftmost ref position
    ends: np.ndarray          # int64 (n,) exclusive ref end (from cigar)
    mapq: np.ndarray          # uint8 (n,)
    flags: np.ndarray         # uint16 (n,)
    # ragged sequence/qualities
    seq: np.ndarray           # uint8 flat base codes
    quals: np.ndarray         # uint8 flat base qualities
    seq_offsets: np.ndarray   # int64 (n+1,) into seq/quals
    # ragged cigars
    cigar_ops: np.ndarray     # int32 (total_ops, 2) [length, op]
    cigar_offsets: np.ndarray # int64 (n+1,) into cigar_ops
    # mate / template info
    mate_begins: np.ndarray | None = None   # int64 (n,), -1 if none
    mate_same_contig: np.ndarray | None = None  # bool (n,)
    template_lengths: np.ndarray | None = None  # int32 (n,)
    names: list[str] | None = None
    name_hashes: np.ndarray | None = None   # uint64 (n,) for duplicate/linking logic
    # optional raw BAM aux/tag bytes (BamFile.fetch(keep_aux=True))
    aux: np.ndarray | None = None            # uint8 flat aux bytes
    aux_offsets: np.ndarray | None = None    # int64 (n+1,) into aux

    def __len__(self) -> int:
        return len(self.begins)

    @property
    def n_reads(self) -> int:
        return len(self.begins)

    def read_length(self, i: int) -> int:
        return int(self.seq_offsets[i + 1] - self.seq_offsets[i])

    def lengths(self) -> np.ndarray:
        return np.diff(self.seq_offsets)

    def sequence(self, i: int) -> np.ndarray:
        return self.seq[self.seq_offsets[i]:self.seq_offsets[i + 1]]

    def qualities(self, i: int) -> np.ndarray:
        return self.quals[self.seq_offsets[i]:self.seq_offsets[i + 1]]

    def cigar(self, i: int) -> np.ndarray:
        return self.cigar_ops[self.cigar_offsets[i]:self.cigar_offsets[i + 1]]

    def is_reverse(self) -> np.ndarray:
        return (self.flags & FLAG_REVERSE) != 0

    def tag(self, i: int, name: str):
        """Parse one BAM aux tag of read i (None when absent or aux not
        retained); mirrors AlignedRead::annotation (aligned_read.hpp)."""
        if self.aux is None:
            return None
        raw = self.aux[self.aux_offsets[i]:self.aux_offsets[i + 1]].tobytes()
        want = name.encode()
        off = 0
        while off + 3 <= len(raw):
            tag = raw[off:off + 2]
            typ = raw[off + 2:off + 3]
            off += 3
            val, off = _parse_aux_value(raw, off, typ)
            if off is None:
                return None
            if tag == want:
                return val
        return None

    def region(self, i: int) -> GenomicRegion:
        return GenomicRegion(self.contig, int(self.begins[i]), int(self.ends[i]))

    # -- batch ops ---------------------------------------------------------

    def take(self, index: np.ndarray) -> "ReadBatch":
        """Select reads by integer index array (or boolean mask)."""
        index = np.asarray(index)
        if index.dtype == bool:
            index = np.flatnonzero(index)
        # contiguous-run fast path (the common case for overlapping() on
        # begin-sorted batches): sliced memcpy instead of ragged gathers
        n = len(index)
        if n and int(index[-1]) - int(index[0]) + 1 == n \
                and (n == 1 or np.all(np.diff(index) == 1)):
            return self._take_slice(int(index[0]), int(index[-1]) + 1)
        # ragged gathers
        lens = self.lengths()
        new_lens = lens[index]
        new_seq_offsets = np.zeros(len(index) + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_seq_offsets[1:])
        gather_seq = _ragged_gather_index(self.seq_offsets, index, new_seq_offsets)
        clens = np.diff(self.cigar_offsets)[index]
        new_cigar_offsets = np.zeros(len(index) + 1, dtype=np.int64)
        np.cumsum(clens, out=new_cigar_offsets[1:])
        gather_cig = _ragged_gather_index(self.cigar_offsets, index, new_cigar_offsets)
        aux = aux_offsets = None
        if self.aux is not None:
            alens = np.diff(self.aux_offsets)[index]
            aux_offsets = np.zeros(len(index) + 1, dtype=np.int64)
            np.cumsum(alens, out=aux_offsets[1:])
            aux = self.aux[_ragged_gather_index(self.aux_offsets, index, aux_offsets)]
        return ReadBatch(
            contig=self.contig,
            begins=self.begins[index],
            ends=self.ends[index],
            mapq=self.mapq[index],
            flags=self.flags[index],
            seq=self.seq[gather_seq],
            quals=self.quals[gather_seq],
            seq_offsets=new_seq_offsets,
            cigar_ops=self.cigar_ops[gather_cig],
            cigar_offsets=new_cigar_offsets,
            mate_begins=None if self.mate_begins is None else self.mate_begins[index],
            mate_same_contig=None if self.mate_same_contig is None else self.mate_same_contig[index],
            template_lengths=None if self.template_lengths is None else self.template_lengths[index],
            names=None if self.names is None else [self.names[int(i)] for i in index],
            name_hashes=None if self.name_hashes is None else self.name_hashes[index],
            aux=aux,
            aux_offsets=aux_offsets,
        )

    def _take_slice(self, i0: int, i1: int) -> "ReadBatch":
        """take() for a contiguous index run [i0, i1): copied slices."""
        s0, s1 = int(self.seq_offsets[i0]), int(self.seq_offsets[i1])
        c0, c1 = int(self.cigar_offsets[i0]), int(self.cigar_offsets[i1])
        aux = aux_offsets = None
        if self.aux is not None:
            a0, a1 = int(self.aux_offsets[i0]), int(self.aux_offsets[i1])
            aux = self.aux[a0:a1].copy()
            aux_offsets = self.aux_offsets[i0:i1 + 1] - a0
        opt = lambda a: None if a is None else a[i0:i1].copy()
        return ReadBatch(
            contig=self.contig,
            begins=self.begins[i0:i1].copy(),
            ends=self.ends[i0:i1].copy(),
            mapq=self.mapq[i0:i1].copy(),
            flags=self.flags[i0:i1].copy(),
            seq=self.seq[s0:s1].copy(),
            quals=self.quals[s0:s1].copy(),
            seq_offsets=self.seq_offsets[i0:i1 + 1] - s0,
            cigar_ops=self.cigar_ops[c0:c1].copy(),
            cigar_offsets=self.cigar_offsets[i0:i1 + 1] - c0,
            mate_begins=opt(self.mate_begins),
            mate_same_contig=opt(self.mate_same_contig),
            template_lengths=opt(self.template_lengths),
            names=None if self.names is None else self.names[i0:i1],
            name_hashes=opt(self.name_hashes),
            aux=aux,
            aux_offsets=aux_offsets,
        )

    def overlapping(self, begin: int, end: int) -> "ReadBatch":
        return self.take((self.begins < end) & (self.ends > begin))

    def sorted_by_begin(self) -> "ReadBatch":
        order = np.lexsort((self.ends, self.begins))
        if np.array_equal(order, np.arange(len(order))):
            return self
        return self.take(order)

    def max_quality(self) -> int:
        return int(self.quals.max()) if len(self.quals) else 0

    @staticmethod
    def empty(contig: str = "") -> "ReadBatch":
        return ReadBatch(
            contig=contig,
            begins=np.zeros(0, np.int64),
            ends=np.zeros(0, np.int64),
            mapq=np.zeros(0, np.uint8),
            flags=np.zeros(0, np.uint16),
            seq=np.zeros(0, np.uint8),
            quals=np.zeros(0, np.uint8),
            seq_offsets=np.zeros(1, np.int64),
            cigar_ops=np.zeros((0, 2), np.int32),
            cigar_offsets=np.zeros(1, np.int64),
        )

    @staticmethod
    def concatenate(batches: Sequence["ReadBatch"]) -> "ReadBatch":
        batches = [b for b in batches if len(b)]
        if not batches:
            return ReadBatch.empty()
        contig = batches[0].contig
        seq_offsets = _concat_offsets([b.seq_offsets for b in batches])
        cigar_offsets = _concat_offsets([b.cigar_offsets for b in batches])
        have_names = all(b.names is not None for b in batches)
        return ReadBatch(
            contig=contig,
            begins=np.concatenate([b.begins for b in batches]),
            ends=np.concatenate([b.ends for b in batches]),
            mapq=np.concatenate([b.mapq for b in batches]),
            flags=np.concatenate([b.flags for b in batches]),
            seq=np.concatenate([b.seq for b in batches]),
            quals=np.concatenate([b.quals for b in batches]),
            seq_offsets=seq_offsets,
            cigar_ops=np.concatenate([b.cigar_ops for b in batches]),
            cigar_offsets=cigar_offsets,
            mate_begins=_cat_optional([b.mate_begins for b in batches]),
            mate_same_contig=_cat_optional([b.mate_same_contig for b in batches]),
            template_lengths=_cat_optional([b.template_lengths for b in batches]),
            names=[n for b in batches for n in b.names] if have_names else None,
            name_hashes=_cat_optional([b.name_hashes for b in batches]),
            aux=_cat_optional([b.aux for b in batches]),
            aux_offsets=(_concat_offsets([b.aux_offsets for b in batches])
                         if all(b.aux_offsets is not None for b in batches) else None),
        )


import struct as _struct

_AUX_SCALAR = {b"c": ("b", 1), b"C": ("B", 1), b"s": ("<h", 2), b"S": ("<H", 2),
               b"i": ("<i", 4), b"I": ("<I", 4), b"f": ("<f", 4), b"A": ("c", 1)}


def _parse_aux_value(raw: bytes, off: int, typ: bytes):
    """Value + next offset for one BAM aux field body; (None, None) on a
    malformed record."""
    if typ in _AUX_SCALAR:
        fmt, size = _AUX_SCALAR[typ]
        if off + size > len(raw):
            return None, None
        v = _struct.unpack_from(fmt, raw, off)[0]
        if typ == b"A":
            v = v.decode("latin-1")
        return v, off + size
    if typ in (b"Z", b"H"):
        end = raw.find(b"\x00", off)
        if end < 0:
            return None, None
        return raw[off:end].decode("latin-1"), end + 1
    if typ == b"B":
        if off + 5 > len(raw):
            return None, None
        sub = raw[off:off + 1]
        count = _struct.unpack_from("<I", raw, off + 1)[0]
        fmt, size = _AUX_SCALAR[sub]
        start = off + 5
        if start + count * size > len(raw):
            return None, None
        vals = list(_struct.unpack_from("<" + fmt.lstrip("<") * count, raw, start))
        return vals, start + count * size
    return None, None


def _ragged_gather_index(old_offsets: np.ndarray, index: np.ndarray, new_offsets: np.ndarray) -> np.ndarray:
    """Flat gather indices selecting ragged rows `index` from a flat array."""
    total = int(new_offsets[-1])
    out = np.empty(total, dtype=np.int64)
    starts = old_offsets[index]
    lens = old_offsets[index + 1] - starts
    # vectorised ragged range: out = starts repeated + intra-row arange
    if total:
        row_of = np.repeat(np.arange(len(index)), lens)
        intra = np.arange(total) - np.repeat(new_offsets[:-1], lens)
        out = starts[row_of] + intra
    return out


def _concat_offsets(offsets_list: list[np.ndarray]) -> np.ndarray:
    sizes = [o[-1] for o in offsets_list]
    base = np.cumsum([0] + sizes[:-1])
    parts = [offsets_list[0]]
    for off, b in zip(offsets_list[1:], base[1:]):
        parts.append(off[1:] + b)
    return np.concatenate(parts)


def _cat_optional(arrays):
    if any(a is None for a in arrays):
        return None
    return np.concatenate(arrays)


def make_read_batch(
    contig: str,
    reads: Iterable[tuple[int, str, str, Sequence[int], int, int]],
) -> ReadBatch:
    """Convenience constructor from python tuples
    (begin, cigar_text, seq_text, quals, mapq, flags) — used by tests and
    synthetic-data generation."""
    begins, cigars, seqs, quals, mapqs, flags = [], [], [], [], [], []
    for begin, cigar_text, seq_text, q, mq, fl in reads:
        begins.append(begin)
        cigars.append(cg.parse_cigar(cigar_text))
        seqs.append(encode_sequence(seq_text))
        quals.append(np.asarray(q, dtype=np.uint8))
        mapqs.append(mq)
        flags.append(fl)
    n = len(begins)
    seq_offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=seq_offsets[1:])
    cigar_offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(c) for c in cigars], out=cigar_offsets[1:])
    begins_arr = np.asarray(begins, dtype=np.int64)
    ends_arr = begins_arr + np.asarray([cg.reference_span(c) for c in cigars], dtype=np.int64)
    return ReadBatch(
        contig=contig,
        begins=begins_arr,
        ends=ends_arr,
        mapq=np.asarray(mapqs, dtype=np.uint8),
        flags=np.asarray(flags, dtype=np.uint16),
        seq=np.concatenate(seqs) if seqs else np.zeros(0, np.uint8),
        quals=np.concatenate(quals) if quals else np.zeros(0, np.uint8),
        seq_offsets=seq_offsets,
        cigar_ops=np.concatenate(cigars) if cigars else np.zeros((0, 2), np.int32),
        cigar_offsets=cigar_offsets,
    )


__all__ = [
    "ReadBatch",
    "make_read_batch",
    "FLAG_PAIRED", "FLAG_PROPER_PAIR", "FLAG_UNMAPPED", "FLAG_MATE_UNMAPPED",
    "FLAG_REVERSE", "FLAG_MATE_REVERSE", "FLAG_FIRST_OF_PAIR", "FLAG_SECOND_OF_PAIR",
    "FLAG_SECONDARY", "FLAG_QC_FAIL", "FLAG_DUPLICATE", "FLAG_SUPPLEMENTARY",
]
