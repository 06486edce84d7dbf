"""Two-stage option system: declaration + collation.

Capability-equivalent to the reference's option_parser.cpp (~170 flags in
groups, --config file layering, --fast/--very-fast presets) and
option_collation.cpp (flat options -> constructed components).  Flag names
follow the reference CLI (website/docs/cli.md) so users can carry commands
across.
"""

from __future__ import annotations

import argparse
import shlex
from dataclasses import dataclass

from ..core.callers.base import BaseCallerConfig
from ..core.likelihood.likelihood_array import LikelihoodConfig
from ..core.vargen.assembler import AssemblerOptions
from ..core.vargen.cigar_scanner import ScannerOptions
from ..readpipe.pipe import ReadPipeConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="octopus-tpu",
        description="TPU-native haplotype-aware variant caller",
        fromfile_prefix_chars="@",
    )
    g = p.add_argument_group("general")
    g.add_argument("--version", action="store_true")
    g.add_argument("--config", help="config file with one option per line")
    g.add_argument("--threads", type=int, default=0)
    g.add_argument("--shard-index", type=int, default=None,
                   help="this host's shard (multi-host static striping)")
    g.add_argument("--num-shards", type=int, default=None)
    g.add_argument("--work-queue", action="store_true",
                   help="coordinate windows through the shared-FS work queue")
    g.add_argument("--fast", action="store_true",
                   help="preset: no assembler, smaller haplotype limits")
    g.add_argument("--very-fast", action="store_true")
    g.add_argument("--debug", action="store_true")
    g.add_argument("--trace", action="store_true")
    g.add_argument("--benchmark", action="store_true",
                   help="print phase timers at exit (reference BENCHMARK build)")

    io = p.add_argument_group("io")
    io.add_argument("-R", "--reference", required=False)
    io.add_argument("-I", "--reads", nargs="+")
    io.add_argument("-o", "--output")
    io.add_argument("-T", "--regions", nargs="*")
    io.add_argument("--regions-file")
    io.add_argument("--bamout", help="evidence BAM output path")
    io.add_argument("--source-candidates", help="VCF of candidate variants")
    io.add_argument("--pedigree", help="PED file for trio resolution")

    rp = p.add_argument_group("read preprocessing")
    rp.add_argument("--min-mapping-quality", type=int, default=5)
    rp.add_argument("--good-base-quality", type=int, default=20)
    rp.add_argument("--min-good-bases", type=int, default=20)
    rp.add_argument("--allow-marked-duplicates", action="store_true")
    rp.add_argument("--allow-octopus-duplicates", action="store_true")
    rp.add_argument("--allow-qc-fails", action="store_true")
    rp.add_argument("--allow-secondary-alignments", action="store_true")
    rp.add_argument("--allow-supplementary-alignments", action="store_true")
    rp.add_argument("--mask-soft-clipped-boundary-bases", type=int, default=2)
    rp.add_argument("--downsample-above", type=int, default=1000)
    rp.add_argument("--downsample-target", type=int, default=500)
    rp.add_argument("--disable-read-preprocessing", action="store_true")

    cand = p.add_argument_group("candidate variant discovery")
    cand.add_argument("--min-pileup-base-quality", type=int, default=20)
    cand.add_argument("--min-supporting-reads", type=int, default=None)
    cand.add_argument("--max-variant-size", type=int, default=2000)
    cand.add_argument("--force-pileup-candidates", action="store_true")
    cand.add_argument("--disable-assembly-candidate-generator", action="store_true")
    cand.add_argument("--kmer-sizes", type=int, nargs="+", default=[10, 15, 20])
    cand.add_argument("--max-bubbles", type=int, default=30)
    cand.add_argument("--min-bubble-score", type=float, default=2.0)
    cand.add_argument("--assembler-mask-base-quality", type=int, default=10)

    hap = p.add_argument_group("haplotype generation")
    hap.add_argument("--max-haplotypes", type=int, default=200)
    hap.add_argument("--haplotype-holdout-threshold", type=int, default=2500)

    caller = p.add_argument_group("calling")
    caller.add_argument("--caller", default="auto",
                        choices=["auto", "individual", "population", "trio",
                                 "cancer", "polyclone", "cell"])
    caller.add_argument("-P", "--organism-ploidy", type=int, default=2)
    caller.add_argument("--contig-ploidies", nargs="*",
                        help="per-contig overrides, e.g. chrY=1")
    caller.add_argument("--contig-ploidies-file")
    caller.add_argument("--min-variant-posterior", type=float, default=0.1)
    caller.add_argument("--snp-heterozygosity", type=float, default=0.001)
    caller.add_argument("--indel-heterozygosity", type=float, default=0.0001)
    caller.add_argument("--max-indel-errors", type=int, default=8)
    caller.add_argument("--sequence-error-model", default="PCR-FREE.HISEQ-2500")
    caller.add_argument("--normal-samples", nargs="*")
    caller.add_argument("--maternal-sample")
    caller.add_argument("--paternal-sample")
    caller.add_argument("--max-clones", type=int, default=3)
    caller.add_argument("--min-denovo-posterior", type=float, default=3.0)
    caller.add_argument("--somatic-snv-prior", type=float, default=1e-4)
    caller.add_argument("--denovo-snv-prior", type=float, default=1.3e-8)
    caller.add_argument("--refcall", nargs="?", const="BLOCKED", default=None,
                        choices=["BLOCKED", "POSITIONAL"],
                        help="emit reference confidence calls (gVCF)")

    filt = p.add_argument_group("call filtering")
    filt.add_argument("--disable-call-filtering", action="store_true")
    filt.add_argument("--filter-expression",
                      default=None, help="boolean measure expression")
    filt.add_argument("--filter-vcf",
                      help="filter an existing VCF instead of calling")
    filt.add_argument("--forest-model",
                      help="random forest .npz for RF filtering")

    return p


def parse_args_with_config(argv=None):
    parser = build_parser()
    args, extra = parser.parse_known_args(argv)
    if args.config:
        file_args = []
        with open(args.config) as fh:
            for line in fh:
                line = line.split("#")[0].strip()
                if not line:
                    continue
                if "=" in line and not line.startswith("-"):
                    k, _, v = line.partition("=")
                    file_args.extend([f"--{k.strip()}", *shlex.split(v)])
                else:
                    file_args.extend(shlex.split(line))
        # command line wins over config file: parse file first, then overlay
        args = parser.parse_args(file_args + (argv or []))
    if extra:
        parser.error(f"unrecognised arguments: {' '.join(extra)}")
    return args


@dataclass
class CollatedComponents:
    read_pipe: ReadPipeConfig
    caller: BaseCallerConfig
    caller_kind: str
    filter_expression: str | None


def collate(args) -> CollatedComponents:
    """Options -> component configs (option_collation.cpp equivalent)."""
    rp = ReadPipeConfig(
        min_mapping_quality=args.min_mapping_quality,
        good_base_quality=args.good_base_quality,
        min_good_bases=args.min_good_bases,
        allow_marked_duplicates=args.allow_marked_duplicates,
        allow_octopus_duplicates=args.allow_octopus_duplicates,
        allow_qc_fails=args.allow_qc_fails,
        allow_secondary=args.allow_secondary_alignments,
        allow_supplementary=args.allow_supplementary_alignments,
        mask_soft_clipped_boundary_bases=args.mask_soft_clipped_boundary_bases,
        downsample_above=args.downsample_above,
        downsample_target=args.downsample_target,
        disable_preprocessing=args.disable_read_preprocessing,
        assembler_enabled=not (args.disable_assembly_candidate_generator
                               or args.fast or args.very_fast),
    )
    scanner = ScannerOptions(
        snv_threshold=args.min_pileup_base_quality,
        max_variant_size=args.max_variant_size,
        use_misalignment_filter=not args.force_pileup_candidates,
        copy_number=args.organism_ploidy,
    )
    if args.min_supporting_reads is not None:
        scanner.inclusion = "threshold"
        scanner.min_observations = args.min_supporting_reads
    caller_kind = args.caller
    if caller_kind in ("auto",):
        if (args.maternal_sample and args.paternal_sample) or args.pedigree:
            caller_kind = "trio"
        elif args.normal_samples:
            caller_kind = "cancer"
    if caller_kind == "cancer":
        scanner.inclusion = "somatic"
    elif caller_kind == "cell":
        scanner.inclusion = "cell"
    use_assembler = not (args.disable_assembly_candidate_generator
                         or args.fast or args.very_fast)
    assembler = AssemblerOptions(
        kmer_sizes=tuple(args.kmer_sizes),
        max_bubbles=args.max_bubbles,
        min_bubble_score=args.min_bubble_score,
        mask_threshold=args.assembler_mask_base_quality,
        max_variant_size=max(args.max_variant_size, 5000),
    )
    likelihood = LikelihoodConfig(
        max_indel_error=args.max_indel_errors,
        error_model=args.sequence_error_model,
    )
    caller = BaseCallerConfig(
        ploidy=args.organism_ploidy,
        min_variant_posterior_phred=args.min_variant_posterior,
        max_haplotypes=args.max_haplotypes if not args.very_fast else 50,
        snp_heterozygosity=args.snp_heterozygosity,
        indel_heterozygosity=args.indel_heterozygosity,
        likelihood=likelihood,
        scanner=scanner,
        use_assembler=use_assembler,
        assembler=assembler,
        source_vcf=args.source_candidates,
    )
    return CollatedComponents(
        read_pipe=rp,
        caller=caller,
        caller_kind=caller_kind,
        filter_expression=(None if args.disable_call_filtering
                           else args.filter_expression),
    )


__all__ = ["build_parser", "parse_args_with_config", "collate", "CollatedComponents"]
