"""SiteCall -> VCF record conversion.

Capability-equivalent to the reference's VcfRecordFactory
(src/core/tools/vcf_record_factory.cpp): allele normalisation to a common
site region, indel anchor bases, phased GT with PS phase sets, QUAL/GQ
emission, and `*` spanning-allele semantics for sites inside an upstream
deletion (vcf_record_factory.cpp `*`-allele logic; VCFv4.3 section 1.6.1,
website/docs/guides/advanced/vcf.md).
"""

from __future__ import annotations

import math

from ...basics.sequence import decode_sequence
from ...io.vcf import VcfHeader, VcfRecord
from ..callers.individual import SiteCall


def make_vcf_header(reference, contigs: list[str], samples: list[str]) -> VcfHeader:
    h = VcfHeader()
    h.other_lines.append("##source=octopus-tpu")
    for c in contigs:
        h.contigs.append((c, reference.contig_size(c)))
    h.add_info("DP", "1", "Integer", "Combined read depth")
    h.add_info("NS", "1", "Integer", "Number of samples with data")
    h.add_info("MP", "1", "Float", "Model posterior")
    h.add_info("PP", "1", "Float", "Call posterior probability")
    h.add_info("MQ", "1", "Float", "RMS mapping quality")
    h.add_info("SOMATIC", "0", "Flag", "Somatic mutation call")
    h.add_info("DENOVO", "0", "Flag", "De novo mutation call")
    h.add_info("CLONES", "1", "Integer", "Inferred clone count")
    h.add_filter("PASS", "All filters passed")
    h.add_format("GT", "1", "String", "Genotype")
    h.add_format("GQ", "1", "Integer", "Conditional genotype quality (phred)")
    h.add_format("DP", "1", "Integer", "Read depth")
    h.add_format("MQ", "1", "Integer", "RMS mapping quality")
    h.add_format("PS", "1", "String", "Phase set")
    h.add_format("PQ", "1", "Integer", "Phase quality (phred)")
    h.add_format("MP", "1", "Float", "Per-sample model posterior (phred)")
    h.samples = list(samples)
    return h


def site_call_to_record(call: SiteCall, contig: str, reference,
                        n_samples: int = 1) -> VcfRecord:
    """Build one (possibly multi-allelic) VCF record from a site call."""
    begin, end = call.begin, call.end
    ref_codes = reference.fetch_codes(contig, begin, end)
    ref_str = decode_sequence(ref_codes)
    # normalise each alt to span the common site region [begin, end)
    alt_strs: list[str] = []
    for v in call.alts:
        prefix = ref_str[:v.begin - begin]
        suffix = ref_str[len(ref_str) - (end - v.end):] if end > v.end else ""
        alt_strs.append(prefix + decode_sequence(v.alt_codes) + suffix)
    pos = begin + 1  # 1-based
    # VCF requires non-empty REF and ALT: add a left anchor base when any
    # allele is empty or lengths differ (indel sites)
    if any(len(a) == 0 for a in alt_strs) or len(ref_str) == 0 or any(
            len(a) != len(ref_str) for a in alt_strs):
        if begin > 0:
            anchor = decode_sequence(reference.fetch_codes(contig, begin - 1, begin))
            pos = begin  # anchor base position (1-based == begin)
            ref_str = anchor + ref_str
            alt_strs = [anchor + a for a in alt_strs]
    qual = None if math.isinf(call.quality) else round(min(call.quality, 1e6), 2)
    sample_values = []
    # PQ: phase-set quality capped at 100 (vcf_record_factory.cpp:680-681)
    pq = (None if call.phase_quality is None
          else int(round(min(call.phase_quality, 100.0))))
    mps = call.model_posteriors
    for s, gt_list in enumerate(call.genotypes):
        sv = {
            "GT": "|".join(str(a) for a in gt_list),
            "GQ": int(round(min(call.genotype_qualities[s], 99.0))),
            "PS": str(call.phase_set + 1),
        }
        if pq is not None:
            sv["PQ"] = pq
        if mps is not None:
            # per-sample model posterior (vcf_record_factory.cpp:684-690)
            sv["MP"] = round(mps[s if s < len(mps) else -1], 2)
        sample_values.append(sv)
    format_keys = (["GT", "GQ", "PS"] + (["PQ"] if pq is not None else [])
                   + (["MP"] if mps is not None else []))
    return VcfRecord(
        chrom=contig,
        pos=pos,
        id="",
        ref=ref_str,
        alts=alt_strs,
        qual=qual if qual is not None else 1e6,
        filters=["PASS"],
        info={},
        format_keys=format_keys,
        sample_values=sample_values,
    )


def annotate_read_stats(pairs: list, batches_by_sample: list) -> None:
    """INFO NS/DP/MQ and FORMAT DP/MQ from the calling reads
    (vcf_record_factory.cpp:654-677: NS = samples with coverage, DP =
    sum of per-sample max coverages over the record region, MQ = RMS
    mapping quality of overlapping reads)."""
    import numpy as np

    if not pairs:
        return
    lo = min(r.pos - 1 for _, r in pairs)
    hi = max(r.pos - 1 + len(r.ref) for _, r in pairs) + 1
    spans = []   # per sample: (depth_array, begins, ends, mapq) or None
    for b in batches_by_sample:
        if b is None or not len(b):
            spans.append(None)
            continue
        sel = (b.ends > lo) & (b.begins < hi)
        depth = np.zeros(hi - lo + 1, np.int64)
        np.add.at(depth, np.clip(b.begins[sel] - lo, 0, hi - lo), 1)
        np.add.at(depth, np.clip(b.ends[sel] - lo, 0, hi - lo), -1)
        depth = np.cumsum(depth)
        spans.append((depth, b.begins, b.ends, b.mapq))
    for call, rec in pairs:
        rb = rec.pos - 1
        re_ = rb + len(rec.ref)
        n_samples_with_cov = 0
        dp_total = 0
        sq_sum = 0.0
        n_mq = 0
        for s, sp in enumerate(spans):
            if sp is None:
                dp_s, mq_s = 0, None
            else:
                depth, begins, ends, mapq = sp
                seg = depth[max(rb - lo, 0):max(re_ - lo, 1)]
                dp_s = int(seg.max()) if len(seg) else 0
                over = (begins < re_) & (ends > rb)
                if over.any():
                    m = mapq[over].astype(np.float64)
                    mq_s = int(round(math.sqrt(float(np.mean(m * m)))))
                    sq_sum += float(np.sum(m * m))
                    n_mq += int(over.sum())
                else:
                    mq_s = None
            if dp_s > 0:
                n_samples_with_cov += 1
            dp_total += dp_s
            if s < len(rec.sample_values):
                sv = rec.sample_values[s]
                sv.setdefault("DP", dp_s)
                if mq_s is not None:
                    sv.setdefault("MQ", mq_s)
        rec.info.setdefault("NS", n_samples_with_cov)
        rec.info.setdefault("DP", dp_total)
        if n_mq:
            rec.info.setdefault("MQ", int(round(math.sqrt(sq_sum / n_mq))))
        for key in ("DP", "MQ"):
            if key not in rec.format_keys and any(
                    key in sv for sv in rec.sample_values):
                rec.format_keys.append(key)


def apply_spanning_alleles(pairs: list) -> None:
    """Rewrite downstream records inside called deletions with `*` alleles.

    pairs: position-ordered [(SiteCall, VcfRecord), ...] of one window.  For
    every haplotype slot carrying an upstream deletion that covers a later
    site (same phase set, so slot order is consistent), the later record
    gains a `*` alt and that slot's GT digit points at it
    (vcf_record_factory.cpp spanning-allele logic).
    """
    for i, (up_call, _up_rec) in enumerate(pairs):
        # deletion intervals per (sample, slot)
        del_spans = {}
        for s, gt in enumerate(up_call.genotypes):
            for k, allele in enumerate(gt):
                if allele > 0 and allele - 1 < len(up_call.alts):
                    v = up_call.alts[allele - 1]
                    if v.end - v.begin > len(v.alt_codes):   # net deletion
                        del_spans[(s, k)] = (v.begin, v.end)
        if not del_spans:
            continue
        for call, rec in (p for p in pairs[i + 1:]):
            if call.phase_set != up_call.phase_set:
                continue
            starred = []
            for (s, k), (db, de) in del_spans.items():
                if db < call.begin < de and s < len(call.genotypes) \
                        and k < len(call.genotypes[s]):
                    starred.append((s, k))
            if not starred:
                continue
            if "*" not in rec.alts:
                rec.alts.append("*")
            star_idx = rec.alts.index("*") + 1
            for s, k in starred:
                digits = rec.sample_values[s]["GT"].split("|")
                if k < len(digits):
                    digits[k] = str(star_idx)
                    rec.sample_values[s]["GT"] = "|".join(digits)


__all__ = ["make_vcf_header", "site_call_to_record", "apply_spanning_alleles"]
