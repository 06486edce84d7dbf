"""`*` spanning-allele semantics (vcf_record_factory.cpp; VCFv4.3 1.6.1)."""

import numpy as np

from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.core.callers.base import SiteCall
from octopus_tpu.core.tools.vcf_record_factory import (
    apply_spanning_alleles, site_call_to_record)
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def test_star_added_for_site_inside_deletion():
    ref = ReferenceGenome(InMemoryReference({"chr1": "ACGTACGTACGTACGTACGT"}))
    # het 5bp deletion at 4..9 on hap 1
    dele = Variant.make(4, encode_sequence("ACGTA"), encode_sequence(""))
    up = SiteCall(begin=4, end=9, alts=[dele], quality=100.0,
                  genotypes=[[0, 1]], genotype_qualities=[60.0],
                  phase_set=0, alt_qualities=[100.0])
    # SNV at 6 (inside the deletion) on hap 0
    snv = Variant.make(6, encode_sequence("G"), encode_sequence("C"))
    down = SiteCall(begin=6, end=7, alts=[snv], quality=80.0,
                    genotypes=[[1, 0]], genotype_qualities=[50.0],
                    phase_set=0, alt_qualities=[80.0])
    pairs = [(up, site_call_to_record(up, "chr1", ref)),
             (down, site_call_to_record(down, "chr1", ref))]
    apply_spanning_alleles(pairs)
    up_rec, down_rec = pairs[0][1], pairs[1][1]
    assert "*" not in up_rec.alts
    assert down_rec.alts == ["C", "*"]
    assert down_rec.sample_values[0]["GT"] == "1|2"


def test_no_star_across_phase_sets():
    ref = ReferenceGenome(InMemoryReference({"chr1": "ACGTACGTACGTACGTACGT"}))
    dele = Variant.make(4, encode_sequence("ACGTA"), encode_sequence(""))
    up = SiteCall(begin=4, end=9, alts=[dele], quality=100.0,
                  genotypes=[[0, 1]], genotype_qualities=[60.0],
                  phase_set=0, alt_qualities=[100.0])
    snv = Variant.make(6, encode_sequence("G"), encode_sequence("C"))
    down = SiteCall(begin=6, end=7, alts=[snv], quality=80.0,
                    genotypes=[[1, 0]], genotype_qualities=[50.0],
                    phase_set=7, alt_qualities=[80.0])
    pairs = [(up, site_call_to_record(up, "chr1", ref)),
             (down, site_call_to_record(down, "chr1", ref))]
    apply_spanning_alleles(pairs)
    assert "*" not in pairs[1][1].alts


def test_insertion_does_not_star():
    ref = ReferenceGenome(InMemoryReference({"chr1": "ACGTACGTACGTACGTACGT"}))
    ins = Variant.make(4, encode_sequence(""), encode_sequence("TTTTT"))
    up = SiteCall(begin=4, end=4, alts=[ins], quality=100.0,
                  genotypes=[[0, 1]], genotype_qualities=[60.0],
                  phase_set=0, alt_qualities=[100.0])
    snv = Variant.make(6, encode_sequence("G"), encode_sequence("C"))
    down = SiteCall(begin=6, end=7, alts=[snv], quality=80.0,
                    genotypes=[[1, 0]], genotype_qualities=[50.0],
                    phase_set=0, alt_qualities=[80.0])
    pairs = [(up, site_call_to_record(up, "chr1", ref)),
             (down, site_call_to_record(down, "chr1", ref))]
    apply_spanning_alleles(pairs)
    assert "*" not in pairs[1][1].alts
