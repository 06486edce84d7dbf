"""Standalone call-set-refinement pass (--filter-vcf).

Capability-equivalent to the reference's filter-request mode
(octopus.cpp:1432-1471 run_csr with --filter-vcf): annotate and re-filter an
existing VCF against the read data without re-calling.
"""

from __future__ import annotations

import sys

import numpy as np

from .basics.reads import ReadBatch
from .basics.sequence import encode_sequence
from .core.callers.base import SiteCall
from .core.csr.measures import compute_measures
from .core.csr.threshold import ThresholdFilter
from .core.types.variants import Variant
from .io.fasta import IndexedFasta, ReferenceGenome
from .io.read_manager import ReadManager
from .io.vcf import VcfReader, VcfWriter
from .readpipe.buffered import BufferedReadPipe
from .readpipe.pipe import ReadPipe


def run_filter_vcf(args) -> int:
    reference = ReferenceGenome(IndexedFasta(args.reference))
    manager = ReadManager(args.reads, reference=reference)
    reader = VcfReader(args.filter_vcf)
    header = reader.header
    threshold = ThresholdFilter(args.filter_expression) if args.filter_expression \
        else ThresholdFilter()
    forest = None
    if getattr(args, "forest_model", None):
        from .core.csr.random_forest import ForestCsr
        forest = ForestCsr(
            args.forest_model, getattr(args, "somatic_forest_model", None),
            getattr(args, "min_forest_quality", 3.0),
            use_somatic_forest_for_refcalls=not getattr(
                args, "use_germline_forest_for_somatic_normals", False))
        if not any(f.get("ID") == "RF" for f in header.filters):
            header.add_filter("RF", "Random forest filtered")
        header.add_format("RFGQ", "1", "Float", "Random forest call quality")
    for fid in threshold.filter_ids():
        if not any(f.get("ID") == fid for f in header.filters):
            header.add_filter(fid, f"Threshold filter {fid}")
    writer = VcfWriter(args.output, header)
    # buffered pipe with call-region hints (octopus.cpp:1446-1453 run_csr)
    buffered = BufferedReadPipe(manager, ReadPipe(), max_fetch_size=200_000)
    hints = [(r.chrom, r.pos - 1, r.pos) for r in VcfReader(args.filter_vcf)]
    buffered.hint([(c, max(b - 500, 0), e + 500) for c, b, e in hints])
    n = 0
    for rec in reader:
        contig = rec.chrom
        pos0 = rec.pos - 1
        got = buffered.fetch(contig, max(pos0 - 500, 0), pos0 + 500)
        parts = [b for b in got.values() if len(b)]
        batch = ReadBatch.concatenate(parts).sorted_by_begin() if parts \
            else ReadBatch.empty(contig)
        call = _record_to_call(rec)
        facets = None
        if len(batch):
            # per-record facet bundle: HMM read assignments feed the
            # support measures, as run_csr's FacetFactory does
            # (octopus.cpp:1432-1471, facet_factory.hpp:28-79)
            from .core.csr.facets import FacetBlock, FacetBundle
            facets = FacetBundle(FacetBlock(
                contig=contig, begin=call.begin,
                end=max(call.end, call.begin + 1),
                variants=[call.alts[0]] if call.alts else [],
                genotypes=[[call.genotypes[0] if call.genotypes else [0, 0]]],
                reads_by_sample=[batch], samples=["pooled"],
                reference=reference,
                ploidy=max(len(call.genotypes[0]), 1)
                if call.genotypes else 2))
        pln = rec.info.get("PLN")
        measures = compute_measures(call, batch, facets=facets,
                                    phase_length=int(pln) if pln else None)
        somatic = bool(rec.info.get("SOMATIC"))
        # refcall records: no real ALT (is_refcall.cpp semantics)
        refcall = not rec.alts or all(a in (".", "<NON_REF>")
                                      for a in rec.alts)
        failed = threshold.classify(measures, somatic=somatic,
                                    refcall=refcall)
        if forest is not None:
            rf_fails, rfgq = forest.classify_q(measures, somatic=somatic,
                                               refcall=refcall)
            failed.extend(rf_fails)
            for sv in rec.sample_values:
                sv["RFGQ"] = round(float(rfgq), 2)
            if "RFGQ" not in rec.format_keys:
                rec.format_keys.append("RFGQ")
        rec.filters = failed if failed else ["PASS"]
        writer.write(rec)
        n += 1
    writer.close()
    print(f"octopus-tpu: filtered {n} records", file=sys.stderr)
    return 0


def _record_to_call(rec) -> SiteCall:
    pos0 = rec.pos - 1
    ref_codes = encode_sequence(rec.ref)
    alts = []
    for alt in rec.alts or ["."]:
        if alt in (".", "*") or alt.startswith("<"):
            alts.append(Variant.make(pos0, ref_codes, ref_codes))
            continue
        alt_codes = encode_sequence(alt)
        b = pos0
        r, a = ref_codes, alt_codes
        while len(r) and len(a) and r[0] == a[0] and (len(r) > 1 or len(a) > 1):
            r, a = r[1:], a[1:]
            b += 1
        alts.append(Variant.make(b, r, a))
    gt = [0, 0]
    gq = 0.0
    if rec.sample_values:
        sv = rec.sample_values[0]
        gt_str = sv.get("GT", "0/0").replace("|", "/")
        try:
            gt = [int(x) for x in gt_str.split("/") if x != "."] or [0, 0]
        except ValueError:
            gt = [0, 0]
        try:
            gq = float(sv.get("GQ", 0))
        except (TypeError, ValueError):
            gq = 0.0
    info = dict(rec.info)
    for key in ("MP", "PP"):           # numeric INFO fields used in measures
        if key in info:
            try:
                info[key] = float(info[key])
            except (TypeError, ValueError):
                del info[key]
    mps = None
    if rec.sample_values:              # FORMAT MP (per-sample model posterior)
        try:
            mps = [float(sv["MP"]) for sv in rec.sample_values if "MP" in sv]
        except (TypeError, ValueError):
            mps = None
        if not mps:
            mps = None
    return SiteCall(
        begin=min(v.begin for v in alts),
        end=max(v.end for v in alts),
        alts=alts,
        quality=rec.qual if rec.qual is not None else 0.0,
        genotypes=[gt],
        genotype_qualities=[gq],
        phase_set=pos0,
        alt_qualities=[rec.qual or 0.0] * len(alts),
        info=info,
        model_posteriors=mps,
    )


__all__ = ["run_filter_vcf"]
