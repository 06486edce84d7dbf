"""VCF 4.3 reading/writing.

Capability-equivalent to the reference's VCF stack (src/io/variant/):
VcfRecord/VcfHeader with builders, text and bgzipped output, a plain-text
parser, and the merge/sort utilities used to stitch per-region temp outputs
(vcf_utils.hpp:33-47).  Spec constants follow VCFv4.3 (vcf_spec.hpp).
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass, field

from .bgzf import BgzfWriter, BgzfReader

VCF_VERSION = "VCFv4.3"
MISSING = "."


@dataclass
class VcfHeader:
    file_format: str = VCF_VERSION
    infos: list[dict] = field(default_factory=list)
    formats: list[dict] = field(default_factory=list)
    filters: list[dict] = field(default_factory=list)
    contigs: list[tuple[str, int]] = field(default_factory=list)
    samples: list[str] = field(default_factory=list)
    other_lines: list[str] = field(default_factory=list)

    def add_info(self, id_, number, type_, description):
        self.infos.append(dict(ID=id_, Number=number, Type=type_, Description=description))

    def add_format(self, id_, number, type_, description):
        self.formats.append(dict(ID=id_, Number=number, Type=type_, Description=description))

    def add_filter(self, id_, description):
        self.filters.append(dict(ID=id_, Description=description))

    def to_lines(self) -> list[str]:
        lines = [f"##fileformat={self.file_format}"]
        lines.extend(self.other_lines)
        for c, ln in self.contigs:
            lines.append(f"##contig=<ID={c},length={ln}>")
        for f in self.filters:
            lines.append(f'##FILTER=<ID={f["ID"]},Description="{f["Description"]}">')
        for i in self.infos:
            lines.append(
                f'##INFO=<ID={i["ID"]},Number={i["Number"]},Type={i["Type"]},'
                f'Description="{i["Description"]}">')
        for f in self.formats:
            lines.append(
                f'##FORMAT=<ID={f["ID"]},Number={f["Number"]},Type={f["Type"]},'
                f'Description="{f["Description"]}">')
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
        if self.samples:
            cols += ["FORMAT"] + self.samples
        lines.append("\t".join(cols))
        return lines

    @staticmethod
    def parse(lines: list[str]) -> "VcfHeader":
        h = VcfHeader()
        for line in lines:
            line = line.rstrip("\n")
            if line.startswith("##fileformat="):
                h.file_format = line.split("=", 1)[1]
            elif line.startswith("##contig="):
                fields = _parse_structured(line)
                h.contigs.append((fields.get("ID", "?"), int(fields.get("length", 0))))
            elif line.startswith("##INFO="):
                h.infos.append(_parse_structured(line))
            elif line.startswith("##FORMAT="):
                h.formats.append(_parse_structured(line))
            elif line.startswith("##FILTER="):
                h.filters.append(_parse_structured(line))
            elif line.startswith("##"):
                h.other_lines.append(line)
            elif line.startswith("#CHROM"):
                cols = line.split("\t")
                if len(cols) > 9:
                    h.samples = cols[9:]
        return h


def _parse_structured(line: str) -> dict:
    body = line[line.index("<") + 1:line.rindex(">")]
    out = {}
    key = val = ""
    in_quotes = False
    state = "key"
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


@dataclass
class VcfRecord:
    chrom: str
    pos: int                 # 1-based
    id: str
    ref: str
    alts: list[str]
    qual: float | None
    filters: list[str]
    info: dict
    format_keys: list[str] = field(default_factory=list)
    sample_values: list[dict] = field(default_factory=list)

    def to_line(self) -> str:
        qual = MISSING if self.qual is None else f"{self.qual:.10g}"
        filt = ";".join(self.filters) if self.filters else MISSING
        info_parts = []
        for k, v in self.info.items():
            if v is True:
                info_parts.append(k)
            elif isinstance(v, (list, tuple)):
                info_parts.append(f"{k}={','.join(_fmt(x) for x in v)}")
            else:
                info_parts.append(f"{k}={_fmt(v)}")
        info = ";".join(info_parts) if info_parts else MISSING
        cols = [self.chrom, str(self.pos), self.id or MISSING, self.ref,
                ",".join(self.alts) if self.alts else MISSING, qual, filt, info]
        if self.format_keys:
            cols.append(":".join(self.format_keys))
            for sv in self.sample_values:
                cols.append(":".join(_fmt(sv.get(k, MISSING)) for k in self.format_keys))
        return "\t".join(cols)

    @staticmethod
    def parse(line: str) -> "VcfRecord":
        cols = line.rstrip("\n").split("\t")
        info: dict = {}
        if cols[7] != MISSING:
            for part in cols[7].split(";"):
                if "=" in part:
                    k, v = part.split("=", 1)
                    info[k] = v
                else:
                    info[part] = True
        rec = VcfRecord(
            chrom=cols[0], pos=int(cols[1]),
            id="" if cols[2] == MISSING else cols[2],
            ref=cols[3],
            alts=[] if cols[4] == MISSING else cols[4].split(","),
            qual=None if cols[5] == MISSING else float(cols[5]),
            filters=[] if cols[6] == MISSING else cols[6].split(";"),
            info=info,
        )
        if len(cols) > 8:
            rec.format_keys = cols[8].split(":")
            for sv in cols[9:]:
                vals = sv.split(":")
                rec.sample_values.append(
                    {k: v for k, v in zip(rec.format_keys, vals)})
        return rec


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return ",".join(_fmt(x) for x in v)
    return str(v)


class VcfWriter:
    def __init__(self, path: str | None, header: VcfHeader):
        self.path = path
        self.header = header
        self._bcf = None
        if path is None:
            import sys
            self._fh = sys.stdout
            self._bgzf = None
        elif str(path).endswith(".bcf"):
            from .bcf import BcfWriter
            self._bcf = BcfWriter(str(path), header)
            self._fh = None
            self._bgzf = None
            return
        elif str(path).endswith(".gz"):
            self._bgzf = BgzfWriter(str(path))
            self._fh = None
        else:
            self._fh = open(path, "w")
            self._bgzf = None
        self._write_text("\n".join(header.to_lines()) + "\n")

    def _write_text(self, text: str) -> None:
        if self._bgzf is not None:
            self._bgzf.write(text.encode())
        else:
            self._fh.write(text)

    def write(self, record: VcfRecord) -> None:
        if self._bcf is not None:
            self._bcf.write(record)
            return
        self._write_text(record.to_line() + "\n")

    def close(self) -> None:
        if self._bcf is not None:
            self._bcf.close()
        elif self._bgzf is not None:
            self._bgzf.close()
        elif self._fh is not None and self.path is not None:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class VcfReader:
    def __init__(self, path: str):
        self.path = str(path)
        if self.path.endswith(".bcf") or _is_bcf(self.path):
            from .bcf import BcfReader
            self._bcf = BcfReader(self.path)
            self.header = self._bcf.header
            self._body = None
            return
        self._bcf = None
        if self.path.endswith(".gz"):
            try:
                raw = BgzfReader(self.path).read_all()
            except ValueError:
                raw = gzip.open(self.path, "rb").read()
            text = raw.decode()
        else:
            text = open(self.path).read()
        lines = text.splitlines()
        header_lines = [l for l in lines if l.startswith("#")]
        self.header = VcfHeader.parse(header_lines)
        self._body = [l for l in lines if l and not l.startswith("#")]

    def __iter__(self):
        if self._bcf is not None:
            yield from self._bcf
            return
        for line in self._body:
            yield VcfRecord.parse(line)

    def records(self) -> list[VcfRecord]:
        return list(self)


def _is_bcf(path: str) -> bool:
    """Detect a BCF payload behind any extension (magic inside BGZF)."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(18)
        if head[:2] != b"\x1f\x8b":
            return False
        import zlib as _z
        with open(path, "rb") as fh:
            raw = fh.read(1 << 16)
        bsize = int.from_bytes(raw[16:18], "little") + 1
        data = _z.decompress(raw[18:bsize - 8], -15)
        return data[:5] == b"BCF\x02\x02"
    except Exception:
        return False


def merge_sorted(paths: list[str], out_path: str, header: VcfHeader,
                 contig_order: list[str]) -> None:
    """Concatenate per-region VCFs into one sorted output (the reference's
    vcf_utils::merge for non-overlapping region shards)."""
    order = {c: i for i, c in enumerate(contig_order)}
    records: list[VcfRecord] = []
    for p in paths:
        records.extend(VcfReader(p).records())
    records.sort(key=lambda r: (order.get(r.chrom, 1 << 30), r.pos, r.ref))
    with VcfWriter(out_path, header) as w:
        for r in records:
            w.write(r)


__all__ = [
    "VcfHeader",
    "VcfRecord",
    "VcfWriter",
    "VcfReader",
    "merge_sorted",
    "VCF_VERSION",
    "MISSING",
]
