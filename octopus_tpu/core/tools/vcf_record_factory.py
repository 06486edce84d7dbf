"""SiteCall -> VCF record conversion.

Capability-equivalent to the reference's VcfRecordFactory
(src/core/tools/vcf_record_factory.cpp): allele normalisation to a common
site region, indel anchor bases, phased GT with PS phase sets, QUAL/GQ
emission.  Spanning-allele (*) handling and refcall blocks are planned
refinements.
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


def _np(b: bytes):
    import numpy as np
    return np.frombuffer(b, dtype=np.uint8)


__all__ = ["make_vcf_header", "site_call_to_record"]
