"""Progress reporting + structured logging.

Capability-equivalent to the reference's ProgressMeter
(src/logging/progress_meter.hpp:21-78: percent complete + ETA by region
completion) and its Boost.Log severity pipeline (logging.hpp:35-58), built
on the standard logging module.
"""

from __future__ import annotations

import logging
import sys
import time

logger = logging.getLogger("octopus_tpu")


TRACE = 5     # below DEBUG: per-region posterior/haplotype dumps


def init_logging(debug: bool = False, trace: bool = False,
                 log_file: str | None = None) -> None:
    """Mirrors the reference's --debug/--trace log files
    (src/config/common.hpp DEBUG_MODE/TRACE_MODE + debug::print_* dumps):
    stderr stays at INFO; the log file carries DEBUG (or TRACE) records."""
    logging.addLevelName(TRACE, "TRACE")
    level = TRACE if trace else (logging.DEBUG if debug else logging.INFO)
    stderr_handler = logging.StreamHandler(sys.stderr)
    stderr_handler.setLevel(logging.INFO)
    handlers: list[logging.Handler] = [stderr_handler]
    if log_file:
        fh = logging.FileHandler(log_file, mode="w")
        fh.setLevel(level)
        handlers.append(fh)
    logging.basicConfig(
        level=level,
        format="[%(asctime)s] <%(levelname)s> %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        handlers=handlers,
        force=True,
    )


class ProgressMeter:
    """Percent + ETA over a known amount of genomic work."""

    def __init__(self, total_bases: int, report_interval_s: float = 10.0,
                 stream=sys.stderr):
        self.total = max(total_bases, 1)
        self.done = 0
        self.t0 = time.time()
        self.last_report = 0.0
        self.interval = report_interval_s
        self.stream = stream

    def advance(self, n_bases: int) -> None:
        self.done += n_bases
        now = time.time()
        if now - self.last_report >= self.interval or self.done >= self.total:
            self.last_report = now
            frac = min(self.done / self.total, 1.0)
            elapsed = now - self.t0
            eta = elapsed * (1 - frac) / frac if frac > 0 else float("inf")
            print(f"octopus-tpu progress: {100 * frac:5.1f}% "
                  f"(elapsed {_fmt(elapsed)}, ETA {_fmt(eta)})",
                  file=self.stream)


def _fmt(seconds: float) -> str:
    if seconds == float("inf"):
        return "-"
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h{m:02d}m"
    if m:
        return f"{m}m{s:02d}s"
    return f"{s}s"


__all__ = ["ProgressMeter", "init_logging", "logger"]
