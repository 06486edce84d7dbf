"""Reference genome access (FASTA + .fai), with an LRU region cache.

Capability-equivalent to the reference's Fasta/CachingFasta/ReferenceGenome
stack (src/io/reference/, caching_fasta.hpp:45-98): random region access via
the .fai index, an LRU byte-budgeted cache of recently fetched blocks, and an
in-memory variant used as the mocking seam (test/mock/mock_reference.hpp).

Sequences are returned as uint8 base-code arrays (see basics.sequence); the
text form is available via decode_sequence.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass
from typing import Mapping, Protocol

import numpy as np

from ..basics.genomic_region import GenomicRegion
from ..basics.sequence import encode_sequence


class ReferenceReader(Protocol):
    """The polymorphic seam equivalent to the reference's ReferenceReader."""

    def contig_names(self) -> list[str]: ...
    def contig_size(self, contig: str) -> int: ...
    def fetch(self, contig: str, begin: int, end: int) -> np.ndarray: ...


@dataclass
class _FaiEntry:
    length: int
    offset: int
    line_bases: int
    line_width: int


class IndexedFasta:
    """Random access to a FASTA file via its .fai index.

    Builds the index on the fly if the .fai is missing (equivalent to
    `samtools faidx`).
    """

    def __init__(self, path: str | os.PathLike):
        from ..errors import MalformedFileError, MissingFileError
        self.path = str(path)
        if not os.path.exists(self.path):
            raise MissingFileError(self.path, "reference FASTA",
                                   where="IndexedFasta")
        with open(self.path, "rb") as fh:
            magic = fh.read(2)
        if magic == b"\x1f\x8b":
            raise MalformedFileError(
                self.path, "reference FASTA",
                detail="the file is gzip-compressed", where="IndexedFasta",
                help="decompress the reference (bgzip -d / gunzip) — random "
                     "access needs the plain-text FASTA plus its .fai")
        fai = self.path + ".fai"
        try:
            if not os.path.exists(fai):
                _write_fai(self.path, fai)
            self._index: "OrderedDict[str, _FaiEntry]" = OrderedDict()
            with open(fai) as fh:
                for line in fh:
                    name, length, offset, line_bases, line_width = line.split("\t")[:5]
                    self._index[name] = _FaiEntry(
                        int(length), int(offset), int(line_bases), int(line_width)
                    )
        except ValueError as e:
            raise MalformedFileError(self.path, "reference FASTA",
                                     detail=str(e),
                                     where="IndexedFasta") from None
        if not self._index:
            raise MalformedFileError(
                self.path, "reference FASTA",
                detail="no sequences found", where="IndexedFasta")
        self._fh = open(self.path, "rb")
        import threading
        self._io_lock = threading.Lock()

    def contig_names(self) -> list[str]:
        return list(self._index)

    def contig_size(self, contig: str) -> int:
        return self._index[contig].length

    def fetch(self, contig: str, begin: int, end: int) -> np.ndarray:
        entry = self._index[contig]
        begin = max(0, begin)
        end = min(end, entry.length)
        if end <= begin:
            return np.zeros(0, dtype=np.uint8)
        first_line = begin // entry.line_bases
        last_line = (end - 1) // entry.line_bases
        file_begin = entry.offset + first_line * entry.line_width + begin % entry.line_bases
        file_end = entry.offset + last_line * entry.line_width + (end - 1) % entry.line_bases + 1
        with self._io_lock:
            self._fh.seek(file_begin)
            raw = np.frombuffer(self._fh.read(file_end - file_begin), dtype=np.uint8)
        # strip newlines/CR
        raw = raw[(raw != 10) & (raw != 13)]
        return encode_sequence(raw.tobytes())

    def close(self) -> None:
        self._fh.close()


def _write_fai(fasta_path: str, fai_path: str) -> None:
    entries = []
    with open(fasta_path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        line_bases = 0
        line_width = 0
        pos = 0
        for line in fh:
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, line_bases, line_width))
                name = line[1:].split()[0].decode()
                pos += len(line)
                offset = pos
                length = 0
                line_bases = 0
                line_width = 0
            else:
                stripped = line.rstrip(b"\r\n")
                if name is None:
                    raise ValueError(f"Malformed FASTA {fasta_path}: data before header")
                if line_bases == 0:
                    line_bases = len(stripped)
                    line_width = len(line)
                length += len(stripped)
                pos += len(line)
        if name is not None:
            entries.append((name, length, offset, line_bases, line_width))
    with open(fai_path, "w") as out:
        for name, length, offset, line_bases, line_width in entries:
            out.write(f"{name}\t{length}\t{offset}\t{line_bases}\t{line_width}\n")


class InMemoryReference:
    """In-memory ReferenceReader — the mocking seam for tests."""

    def __init__(self, contigs: Mapping[str, str | np.ndarray]):
        self._contigs: dict[str, np.ndarray] = {}
        for name, seq in contigs.items():
            self._contigs[name] = (
                encode_sequence(seq) if isinstance(seq, (str, bytes)) else np.asarray(seq, np.uint8)
            )

    def contig_names(self) -> list[str]:
        return list(self._contigs)

    def contig_size(self, contig: str) -> int:
        return len(self._contigs[contig])

    def fetch(self, contig: str, begin: int, end: int) -> np.ndarray:
        seq = self._contigs[contig]
        return seq[max(0, begin):min(end, len(seq))]


class ReferenceGenome:
    """Cached reference access.

    LRU cache over fixed-size blocks with a byte budget, mirroring the
    reference's CachingFasta behaviour (fetch hits are served from cache;
    over-budget blocks are evicted least-recently-used).
    """

    BLOCK = 1 << 16  # 64 kb blocks

    def __init__(self, reader: ReferenceReader, max_cache_bytes: int = 256 << 20):
        import threading
        self._reader = reader
        self._max_cache_bytes = max_cache_bytes
        self._cache: "OrderedDict[tuple[str, int], np.ndarray]" = OrderedDict()
        self._cached_bytes = 0
        self._sizes = {c: reader.contig_size(c) for c in reader.contig_names()}
        self._lock = threading.Lock()   # ThreadsafeFasta equivalent

    @property
    def name(self) -> str:
        return os.path.basename(getattr(self._reader, "path", "in-memory"))

    def contig_names(self) -> list[str]:
        return list(self._sizes)

    def contig_size(self, contig: str) -> int:
        return self._sizes[contig]

    def has_contig(self, contig: str) -> bool:
        return contig in self._sizes

    def contig_region(self, contig: str) -> GenomicRegion:
        return GenomicRegion(contig, 0, self._sizes[contig])

    def fetch(self, region: GenomicRegion) -> np.ndarray:
        return self.fetch_codes(region.contig, region.begin, region.end)

    def fetch_codes(self, contig: str, begin: int, end: int) -> np.ndarray:
        begin = max(0, begin)
        end = min(end, self._sizes[contig])
        if end <= begin:
            return np.zeros(0, dtype=np.uint8)
        first_block = begin // self.BLOCK
        last_block = (end - 1) // self.BLOCK
        parts = []
        for block in range(first_block, last_block + 1):
            parts.append(self._block(contig, block))
        whole = parts[0] if len(parts) == 1 else np.concatenate(parts)
        lo = begin - first_block * self.BLOCK
        return whole[lo:lo + (end - begin)]

    def _block(self, contig: str, block: int) -> np.ndarray:
        key = (contig, block)
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                self._cache.move_to_end(key)
                return hit
        data = self._reader.fetch(contig, block * self.BLOCK, (block + 1) * self.BLOCK)
        with self._lock:
            self._cache[key] = data
            self._cached_bytes += data.nbytes
            while self._cached_bytes > self._max_cache_bytes and len(self._cache) > 1:
                _, evicted = self._cache.popitem(last=False)
                self._cached_bytes -= evicted.nbytes
        return data


__all__ = ["ReferenceGenome", "IndexedFasta", "InMemoryReference", "ReferenceReader"]
