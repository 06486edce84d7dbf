"""Composite candidate variant generation.

Capability-equivalent to the reference's VariantGenerator composite
(src/core/tools/vargen/variant_generator.{hpp,cpp}) aggregating CigarScanner,
LocalReassembler, RepeatScanner and VcfExtractor proposals with merge+dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ...basics.reads import ReadBatch
from ..types.variants import Variant, left_align
from .assembler import AssemblerOptions, LocalReassembler
from .repeat_scanner import RepeatScanner, RepeatScannerOptions
from .cigar_scanner import CigarScanner, ScannerOptions
from .randomiser import Randomiser, RandomiserOptions


@dataclass
class VariantGeneratorConfig:
    scanner: ScannerOptions = field(default_factory=ScannerOptions)
    use_pileup_scanner: bool = True       # --disable-pileup-candidate-generator
    use_assembler: bool = False
    assembler: AssemblerOptions = field(default_factory=AssemblerOptions)
    use_repeat_scanner: bool = True
    repeat_scanner: RepeatScannerOptions = field(default_factory=RepeatScannerOptions)
    use_randomiser: bool = False          # test/stress candidate injection
    randomiser: RandomiserOptions = field(default_factory=RandomiserOptions)
    source_vcf: str | None = None         # --source-candidates
    min_source_quality: float | None = None   # --min-source-candidate-quality
    # --use-filtered-source-candidates: keep FILTER-failed source records
    # (vcf_extractor.hpp Options::extract_filtered; default drops them)
    use_filtered_source: bool = False
    max_variant_size: int = 2000


class VariantGenerator:
    def __init__(self, reference, contig: str,
                 config: VariantGeneratorConfig | None = None):
        self.reference = reference
        self.contig = contig
        self.config = config or VariantGeneratorConfig()
        self._scanner = CigarScanner(reference, contig, self.config.scanner)
        self._assembler = (LocalReassembler(reference, contig, self.config.assembler)
                           if self.config.use_assembler else None)
        self._repeat_scanner = (RepeatScanner(reference, contig, self.config.repeat_scanner)
                                if self.config.use_repeat_scanner else None)
        self._randomiser = (Randomiser(reference, contig, self.config.randomiser)
                            if self.config.use_randomiser else None)
        self._batches: list[tuple[int, ReadBatch]] = []

    def add_reads(self, sample: int, batch: ReadBatch) -> None:
        self._scanner.add_reads(sample, batch)
        if self._randomiser is not None:
            self._randomiser.add_reads(sample, batch)
        if self._assembler is not None or self._repeat_scanner is not None:
            self._batches.append((sample, batch))

    def generate(self, begin: int, end: int) -> list[Variant]:
        # all indels are left-aligned before dedup: generators observe the
        # same event at different anchors inside repeats (CIGAR placement vs
        # assembly alignment), and two representations of one haplotype must
        # not both reach the model (they would split posterior mass; the
        # reference dedups by haplotype sequence, haplotype.cpp operator==)
        fetch = lambda b, e: self.reference.fetch_codes(self.contig, b, e)

        def norm(v: Variant) -> Variant:
            return left_align(v, fetch) if v.is_indel() else v

        out: dict[Variant, None] = {}
        if self.config.use_pileup_scanner:
            for v in self._scanner.generate(begin, end):
                out.setdefault(norm(v))
        if self._assembler is not None:
            for sample, batch in self._batches:
                for v in self._assembler.generate(batch, begin, end):
                    if v.end - v.begin <= max(self.config.max_variant_size,
                                              self.config.assembler.max_variant_size):
                        out.setdefault(norm(v))
        if self._repeat_scanner is not None:
            for sample, batch in self._batches:
                for v in self._repeat_scanner.generate(batch, begin, end):
                    out.setdefault(norm(v))
        if self._randomiser is not None:
            for v in self._randomiser.generate(begin, end):
                out.setdefault(norm(v))
        if self.config.source_vcf:
            for v in self._from_source_vcf(begin, end):
                out.setdefault(norm(v))
        return sorted(out, key=lambda v: (v.begin, v.end, v.alt))

    def _from_source_vcf(self, begin: int, end: int) -> list[Variant]:
        """VcfExtractor equivalent (--source-candidates)."""
        from ...io.vcf import VcfReader
        from ...basics.sequence import encode_sequence
        out = []
        for rec in VcfReader(self.config.source_vcf):
            if rec.chrom != self.contig:
                continue
            if (not self.config.use_filtered_source
                    and rec.filters and rec.filters not in (["PASS"], ["."])):
                continue
            if (self.config.min_source_quality is not None
                    and (rec.qual is None or rec.qual < self.config.min_source_quality)):
                continue
            pos0 = rec.pos - 1
            if pos0 >= end or pos0 + len(rec.ref) <= begin:
                continue
            for alt in rec.alts:
                if alt.startswith("<") or alt == "*":
                    continue
                ref_codes = encode_sequence(rec.ref)
                alt_codes = encode_sequence(alt)
                # trim shared prefix (VCF anchors)
                b = pos0
                while len(ref_codes) and len(alt_codes) and ref_codes[0] == alt_codes[0] \
                        and (len(ref_codes) > 1 or len(alt_codes) > 1):
                    ref_codes, alt_codes = ref_codes[1:], alt_codes[1:]
                    b += 1
                out.append(Variant.make(b, ref_codes, alt_codes))
        return out

    def clear(self) -> None:
        self._scanner.clear()
        self._batches.clear()


__all__ = ["VariantGenerator", "VariantGeneratorConfig"]
