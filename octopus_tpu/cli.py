"""Command-line entry point (``octopus-tpu``).

Option surface follows the reference CLI (src/config/option_parser.cpp /
website/docs/cli.md); see octopus_tpu.config.options for the full flag set
and collation into components.
"""

from __future__ import annotations

import sys

from .config.options import build_parser, parse_args_with_config


def main(argv: list[str] | None = None) -> int:
    args = parse_args_with_config(argv)
    if args.version:
        from . import __version__
        print(f"octopus-tpu {__version__}")
        return 0
    if not args.reference or not (args.reads or args.reads_file):
        print("octopus-tpu: --reference and --reads are required to call variants",
              file=sys.stderr)
        return 2
    from .logging_.progress import init_logging
    init_logging(debug=bool(args.debug), trace=bool(args.trace),
                 log_file=args.trace or args.debug)
    if getattr(args, "filter_vcf", None):
        from .csr_run import run_filter_vcf
        return run_filter_vcf(args)
    from .run import run_calling
    return run_calling(args)


if __name__ == "__main__":
    raise SystemExit(main())
