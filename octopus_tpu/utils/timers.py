"""Phase timers.

Capability-equivalent to the reference's BENCHMARK-gated timers
(src/timers.hpp:13-23: init/likelihood/latents/calling/phasing/output) —
always available here (negligible overhead), reported per run when enabled.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
enabled = False


@contextmanager
def phase(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _totals[name] += time.perf_counter() - t0
        _counts[name] += 1


def report() -> str:
    lines = ["phase timers:"]
    for name in sorted(_totals, key=_totals.get, reverse=True):
        lines.append(f"  {name:<28} {_totals[name]:8.2f}s  ({_counts[name]} calls)")
    return "\n".join(lines)


def reset() -> None:
    _totals.clear()
    _counts.clear()


__all__ = ["phase", "report", "reset", "enabled"]
