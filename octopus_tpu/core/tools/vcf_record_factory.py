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
    h.add_info("MP", "1", "Float", "Model posterior")
    h.add_info("MQ", "1", "Float", "RMS mapping quality")
    h.add_info("SOMATIC", "0", "Flag", "Somatic mutation call")
    h.add_info("DENOVO", "0", "Flag", "De novo mutation call")
    h.add_info("CLONES", "1", "Integer", "Inferred clone count")
    h.add_filter("PASS", "All filters passed")
    h.add_format("GT", "1", "String", "Genotype")
    h.add_format("GQ", "1", "Integer", "Conditional genotype quality (phred)")
    h.add_format("DP", "1", "Integer", "Read depth")
    h.add_format("PS", "1", "String", "Phase set")
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
    for s, gt_list in enumerate(call.genotypes):
        sample_values.append({
            "GT": "|".join(str(a) for a in gt_list),
            "GQ": int(round(min(call.genotype_qualities[s], 99.0))),
            "PS": str(call.phase_set + 1),
        })
    return VcfRecord(
        chrom=contig,
        pos=pos,
        id="",
        ref=ref_str,
        alts=alt_strs,
        qual=qual if qual is not None else 1e6,
        filters=["PASS"],
        info={},
        format_keys=["GT", "GQ", "PS"],
        sample_values=sample_values,
    )


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
