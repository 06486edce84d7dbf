"""Command-line entry point (``octopus-tpu``).

Grows toward capability parity with the reference's ~170-option CLI
(src/config/option_parser.cpp); options are added as the subsystems they
configure land.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="octopus-tpu",
        description="TPU-native haplotype-aware variant caller",
    )
    p.add_argument("--version", action="store_true", help="print version and exit")
    p.add_argument("-R", "--reference", help="reference FASTA (indexed)")
    p.add_argument("-I", "--reads", nargs="+", help="input BAM file(s)")
    p.add_argument("-o", "--output", help="output VCF path (default: stdout)")
    p.add_argument("-T", "--regions", nargs="*", help="regions to call (e.g. chr1:100-200)")
    p.add_argument("--caller", default="auto",
                   choices=["auto", "individual", "population", "trio", "cancer", "polyclone", "cell"])
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.version:
        from . import __version__
        print(f"octopus-tpu {__version__}")
        return 0
    if not args.reference or not args.reads:
        print("octopus-tpu: --reference and --reads are required to call variants", file=sys.stderr)
        return 2
    from .run import run_calling
    return run_calling(args)


if __name__ == "__main__":
    raise SystemExit(main())
