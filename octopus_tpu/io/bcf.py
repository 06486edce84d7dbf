"""BCF 2.2 reading and writing (htslib-free).

Capability-equivalent to the reference's HtslibBcfFacade
(src/io/variant/htslib_bcf_facade.cpp): binary VCF records in a BGZF
container with header string dictionaries and typed values. Records convert
to/from this package's VcfRecord (string-oriented, io/vcf.py), with types
taken from the header's INFO/FORMAT declarations and GT encoded per spec.

Format summary (hts-specs VCFv4.3 BCF2.2):
  magic "BCF\\2\\2"; uint32 l_text; header text (NUL-terminated).
  record: uint32 l_shared, l_indiv;
    shared: int32 rid, pos(0-based), rlen; float qual (0x7F800001 = missing);
            uint32 n_allele<<16 | n_info; uint32 n_fmt<<24 | n_sample;
            typed ID str, typed allele strs, typed FILTER int vector,
            n_info x (typed int key, typed value);
    indiv:  n_fmt x (typed int key, typed value array, per-sample stride).
  typed descriptor byte: len<<4 | type, len 15 -> following typed int length;
  types: 1=int8 2=int16 3=int32 5=float 7=char.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .bgzf import BgzfWriter, BGZF_EOF
from .vcf import VcfHeader, VcfRecord, MISSING

_INT8_MISSING = -128
_INT16_MISSING = -32768
_INT32_MISSING = -2147483648
_FLOAT_MISSING = struct.unpack("<f", struct.pack("<I", 0x7F800001))[0]
_FLOAT_MISSING_BITS = 0x7F800001
_FLOAT_EOV_BITS = 0x7F800002


# ---------------------------------------------------------------------------
# typed value encoding
# ---------------------------------------------------------------------------

def _typed_descriptor(n: int, btype: int) -> bytes:
    if n < 15:
        return bytes([(n << 4) | btype])
    return bytes([(15 << 4) | btype]) + _typed_int(n)


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([(1 << 4) | 1]) + struct.pack("<b", v)
    if -32000 <= v <= 32767:
        return bytes([(1 << 4) | 2]) + struct.pack("<h", v)
    return bytes([(1 << 4) | 3]) + struct.pack("<i", v)


def _typed_ints(vals: list[int | None]) -> bytes:
    """Typed vector of ints; None encodes the missing value."""
    concrete = [v for v in vals if v is not None]
    lo = min(concrete, default=0)
    hi = max(concrete, default=0)
    if -120 <= lo and hi <= 127:
        btype, fmt, miss = 1, "<b", _INT8_MISSING
    elif -32000 <= lo and hi <= 32767:
        btype, fmt, miss = 2, "<h", _INT16_MISSING
    else:
        btype, fmt, miss = 3, "<i", _INT32_MISSING
    out = bytearray(_typed_descriptor(len(vals), btype))
    for v in vals:
        out += struct.pack(fmt, miss if v is None else v)
    return bytes(out)


def _typed_floats(vals: list[float | None]) -> bytes:
    out = bytearray(_typed_descriptor(len(vals), 5))
    for v in vals:
        if v is None:
            out += struct.pack("<I", _FLOAT_MISSING_BITS)
        else:
            out += struct.pack("<f", v)
    return bytes(out)


def _typed_str(s: str) -> bytes:
    b = s.encode()
    return _typed_descriptor(len(b), 7) + b


class _Cursor:
    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes, off: int = 0):
        self.buf = buf
        self.off = off

    def _scalar(self, btype: int):
        if btype == 1:
            v = struct.unpack_from("<b", self.buf, self.off)[0]
            self.off += 1
            return None if v == _INT8_MISSING else v
        if btype == 2:
            v = struct.unpack_from("<h", self.buf, self.off)[0]
            self.off += 2
            return None if v == _INT16_MISSING else v
        if btype == 3:
            v = struct.unpack_from("<i", self.buf, self.off)[0]
            self.off += 4
            return None if v == _INT32_MISSING else v
        if btype == 5:
            bits = struct.unpack_from("<I", self.buf, self.off)[0]
            self.off += 4
            if bits in (_FLOAT_MISSING_BITS, _FLOAT_EOV_BITS):
                return None
            return struct.unpack("<f", struct.pack("<I", bits))[0]
        raise ValueError(f"bad BCF scalar type {btype}")

    def typed(self):
        """Decode one typed value -> (list | str, btype)."""
        desc = self.buf[self.off]
        self.off += 1
        btype = desc & 0xF
        n = desc >> 4
        if n == 15:
            n_val, _ = self.typed()
            n = int(n_val[0])
        if btype == 0:
            return [], 0
        if btype == 7:
            s = self.buf[self.off:self.off + n].decode()
            self.off += n
            return s, 7
        return [self._scalar(btype) for _ in range(n)], btype


# ---------------------------------------------------------------------------
# header dictionaries
# ---------------------------------------------------------------------------

class _Dicts:
    def __init__(self, header: VcfHeader):
        self.header = header
        self.strings: list[str] = []
        self.string_idx: dict[str, int] = {}
        self.contigs: list[str] = []
        self.contig_idx: dict[str, int] = {}
        self.info_type: dict[str, str] = {}
        self.format_type: dict[str, str] = {}
        self._add_string("PASS")
        for line in header.to_lines():
            if line.startswith("##contig="):
                fields = _structured(line)
                name = fields.get("ID")
                if name is not None:
                    idx = fields.get("IDX")
                    self._add_contig(name, int(idx) if idx else None)
            elif line.startswith(("##INFO=", "##FORMAT=", "##FILTER=")):
                fields = _structured(line)
                name = fields.get("ID")
                if name is None:
                    continue
                idx = fields.get("IDX")
                self._add_string(name, int(idx) if idx else None)
                if line.startswith("##INFO="):
                    self.info_type[name] = fields.get("Type", "String")
                elif line.startswith("##FORMAT="):
                    self.format_type[name] = fields.get("Type", "String")

    def _add_string(self, s: str, idx: int | None = None) -> int:
        if s in self.string_idx:
            return self.string_idx[s]
        if idx is None:
            idx = len(self.strings)
        while len(self.strings) <= idx:
            self.strings.append("")
        self.strings[idx] = s
        self.string_idx[s] = idx
        return idx

    def _add_contig(self, s: str, idx: int | None = None) -> int:
        if s in self.contig_idx:
            return self.contig_idx[s]
        if idx is None:
            idx = len(self.contigs)
        while len(self.contigs) <= idx:
            self.contigs.append("")
        self.contigs[idx] = s
        self.contig_idx[s] = idx
        return idx


def _structured(line: str) -> dict:
    body = line.partition("=<")[2].rstrip(">")
    out: dict[str, str] = {}
    key = val = ""
    state = "key"
    in_quotes = False
    for ch in body:
        if state == "key":
            if ch == "=":
                state = "val"
            else:
                key += ch
        else:
            if ch == '"':
                in_quotes = not in_quotes
            elif ch == "," and not in_quotes:
                out[key] = val
                key, val, state = "", "", "key"
            else:
                val += ch
    if key:
        out[key] = val
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class BcfWriter:
    def __init__(self, path: str, header: VcfHeader):
        self.header = header
        self._dicts = _Dicts(header)
        self._bgzf = BgzfWriter(path)
        text = "\n".join(header.to_lines()) + "\n\x00"
        tb = text.encode()
        self._bgzf.write(b"BCF\x02\x02" + struct.pack("<I", len(tb)) + tb)
        self._samples = header.samples

    def write(self, rec: VcfRecord) -> None:
        d = self._dicts
        rid = d.contig_idx.get(rec.chrom)
        if rid is None:
            rid = d._add_contig(rec.chrom)
        shared = bytearray()
        shared += struct.pack("<i", rid)
        shared += struct.pack("<i", rec.pos - 1)
        shared += struct.pack("<i", max(len(rec.ref), 1))
        if rec.qual is None:
            shared += struct.pack("<I", _FLOAT_MISSING_BITS)
        else:
            shared += struct.pack("<f", float(rec.qual))
        alleles = [rec.ref] + list(rec.alts)
        info_items = list(rec.info.items())
        shared += struct.pack("<I", (len(alleles) << 16) | (len(info_items) & 0xFFFF))
        n_sample = len(rec.sample_values)
        fmt_keys = list(rec.format_keys)
        shared += struct.pack("<I", (len(fmt_keys) << 24) | (n_sample & 0xFFFFFF))
        shared += _typed_str(rec.id or "")
        for a in alleles:
            shared += _typed_str(a)
        filt = [d.string_idx.get(f, d._add_string(f))
                for f in (rec.filters or [])]
        shared += _typed_ints(filt)
        for k, v in info_items:
            shared += _typed_int(d.string_idx.get(k, d._add_string(k)))
            shared += self._encode_info(k, v)
        indiv = bytearray()
        for k in fmt_keys:
            indiv += _typed_int(d.string_idx.get(k, d._add_string(k)))
            indiv += self._encode_format(k, rec)
        self._bgzf.write(struct.pack("<II", len(shared), len(indiv))
                         + bytes(shared) + bytes(indiv))

    def _encode_info(self, key: str, v) -> bytes:
        t = self._dicts.info_type.get(key, "String")
        if v is True or t == "Flag":
            return _typed_descriptor(0, 0)
        parts = (list(v) if isinstance(v, (list, tuple))
                 else str(v).split(","))
        if t == "Integer":
            return _typed_ints([None if str(x) == MISSING else int(float(x))
                                for x in parts])
        if t == "Float":
            return _typed_floats([None if str(x) == MISSING else float(x)
                                  for x in parts])
        if t == "Character" or t == "String":
            return _typed_str(",".join(str(x) for x in parts))
        return _typed_str(str(v))

    def _encode_format(self, key: str, rec: VcfRecord) -> bytes:
        vals = [sv.get(key, MISSING) for sv in rec.sample_values]
        if key == "GT":
            encoded = []
            width = 1
            for g in vals:
                s = str(g)
                phased = "|" in s
                alleles = s.replace("|", "/").split("/")
                row = []
                for i, a in enumerate(alleles):
                    if a in (".", ""):
                        row.append(0)     # missing allele -> 0x00
                    else:
                        row.append(((int(a) + 1) << 1) | (1 if phased and i > 0 else 0))
                encoded.append(row)
                width = max(width, len(row))
            out = bytearray(_typed_descriptor(width, 1))
            for row in encoded:
                row = row + [-127] * (width - len(row))   # EOV padding (0x81)
                out += struct.pack(f"<{width}b", *row)
            return bytes(out)
        t = self._dicts.format_type.get(key, "String")
        split = [str(v).split(",") for v in vals]
        width = max((len(s) for s in split), default=1)
        # the typed descriptor of a FORMAT array gives the PER-SAMPLE width;
        # n_sample blocks of `width` values follow
        if t == "Integer":
            rows = []
            for s in split:
                row = [None if x == MISSING or x == "" else int(float(x)) for x in s]
                rows.append(row + [None] * (width - len(row)))
            flat = [x for row in rows for x in row]
            concrete = [v for v in flat if v is not None]
            lo, hi = min(concrete, default=0), max(concrete, default=0)
            if -120 <= lo and hi <= 127:
                btype, fmt, miss = 1, "<b", _INT8_MISSING
            elif -32000 <= lo and hi <= 32767:
                btype, fmt, miss = 2, "<h", _INT16_MISSING
            else:
                btype, fmt, miss = 3, "<i", _INT32_MISSING
            out = bytearray(_typed_descriptor(width, btype))
            for v in flat:
                out += struct.pack(fmt, miss if v is None else v)
            return bytes(out)
        if t == "Float":
            rows = []
            for s in split:
                row = [None if x == MISSING or x == "" else float(x) for x in s]
                rows.append(row + [None] * (width - len(row)))
            out = bytearray(_typed_descriptor(width, 5))
            for row in rows:
                for v in row:
                    out += (struct.pack("<I", _FLOAT_MISSING_BITS) if v is None
                            else struct.pack("<f", v))
            return bytes(out)
        # String: fixed-width char matrix padded with NULs
        strs = [str(v) for v in vals]
        w = max((len(s) for s in strs), default=1)
        out = bytearray(_typed_descriptor(w, 7))
        for s in strs:
            out += s.encode().ljust(w, b"\x00")
        return bytes(out)

    def close(self) -> None:
        self._bgzf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class BcfReader:
    def __init__(self, path: str):
        self.path = path
        data = _inflate_all(path)
        if data[:5] != b"BCF\x02\x02":
            raise ValueError(f"{path}: not BCF 2.2")
        (l_text,) = struct.unpack_from("<I", data, 5)
        text = data[9:9 + l_text].split(b"\x00")[0].decode()
        self.header = VcfHeader.parse(text.rstrip("\n").split("\n"))
        self._dicts = _Dicts(self.header)
        self._data = data
        self._start = 9 + l_text

    def records(self) -> list["VcfRecord"]:
        return list(self)

    def __iter__(self):
        data = self._data
        off = self._start
        d = self._dicts
        n_samples = len(self.header.samples)
        while off + 8 <= len(data):
            l_shared, l_indiv = struct.unpack_from("<II", data, off)
            off += 8
            cur = _Cursor(data, off)
            rid, pos, rlen = struct.unpack_from("<3i", data, cur.off)
            cur.off += 12
            qual_bits = struct.unpack_from("<I", data, cur.off)[0]
            qual = (None if qual_bits in (_FLOAT_MISSING_BITS, _FLOAT_EOV_BITS)
                    else struct.unpack("<f", struct.pack("<I", qual_bits))[0])
            if qual is not None:
                # shortest faithful decimal of the stored float32: a QUAL
                # written as 289.22 must re-serialise as 289.22, not the
                # float64 expansion 289.2200012207 (htslib prints %g too)
                qual = float(f"{qual:.6g}")
            cur.off += 4
            packed1, packed2 = struct.unpack_from("<II", data, cur.off)
            cur.off += 8
            n_allele = packed1 >> 16
            n_info = packed1 & 0xFFFF
            n_fmt = packed2 >> 24
            n_sample = packed2 & 0xFFFFFF
            vid, _ = cur.typed()
            alleles = []
            for _ in range(n_allele):
                a, _ = cur.typed()
                alleles.append(a if isinstance(a, str) else "")
            filt, _ = cur.typed()
            filters = [d.strings[int(f)] for f in filt if f is not None]
            info: dict = {}
            for _ in range(n_info):
                key_v, _ = cur.typed()
                key = d.strings[int(key_v[0])]
                val, btype = cur.typed()
                if btype == 0:
                    info[key] = True
                elif btype == 7:
                    info[key] = val
                else:
                    vals = [x for x in val if x is not None]
                    info[key] = ",".join(_fmt_num(x) for x in vals)
            fmt_keys: list[str] = []
            sample_values: list[dict] = [dict() for _ in range(n_sample)]
            cur2 = _Cursor(data, off + l_shared)
            for _ in range(n_fmt):
                key_v, _ = cur2.typed()
                key = d.strings[int(key_v[0])]
                fmt_keys.append(key)
                desc = cur2.buf[cur2.off]
                cur2.off += 1
                btype = desc & 0xF
                n = desc >> 4
                if n == 15:
                    n_val, _ = cur2.typed()
                    n = int(n_val[0])
                for s in range(n_sample):
                    if btype == 7:
                        raw = cur2.buf[cur2.off:cur2.off + n]
                        cur2.off += n
                        sample_values[s][key] = raw.rstrip(b"\x00").decode()
                    elif key == "GT":
                        parts = []
                        phased = False
                        for j in range(n):
                            v = cur2._scalar(btype)
                            if v is None or v == 0:
                                if v == 0 and j == 0:
                                    parts.append(".")
                                continue
                            iv = int(v)
                            if iv in (-127, -32767, -2147483647):  # EOV
                                continue
                            if j > 0:
                                phased = bool(iv & 1)
                            parts.append(str((iv >> 1) - 1))
                        sep = "|" if phased else "/"
                        sample_values[s][key] = sep.join(parts) if parts else "."
                    else:
                        vals = [cur2._scalar(btype) for _ in range(n)]
                        vals = [v for v in vals if v is not None
                                and not (btype == 1 and v == -127)
                                and not (btype == 2 and v == -32767)
                                and not (btype == 3 and v == -2147483647)]
                        sample_values[s][key] = ",".join(_fmt_num(v) for v in vals) \
                            if vals else MISSING
            off += l_shared + l_indiv
            yield VcfRecord(
                chrom=d.contigs[rid] if rid < len(d.contigs) else str(rid),
                pos=pos + 1,
                id=vid if isinstance(vid, str) else "",
                ref=alleles[0] if alleles else "N",
                alts=alleles[1:],
                qual=qual,
                filters=filters,
                info=info,
                format_keys=fmt_keys,
                sample_values=sample_values,
            )


def _fmt_num(v) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _inflate_all(path: str) -> bytes:
    out = []
    with open(path, "rb") as fh:
        raw = fh.read()
    pos = 0
    while pos + 18 <= len(raw):
        bsize = struct.unpack_from("<H", raw, pos + 16)[0] + 1
        out.append(zlib.decompress(raw[pos + 18:pos + bsize - 8], -15))
        pos += bsize
    return b"".join(out)


__all__ = ["BcfWriter", "BcfReader"]
