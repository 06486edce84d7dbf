"""Exact tandem repeat finding on base-code arrays.

Capability-equivalent to the reference's vendored tandem library
(lib/tandem/tandem.hpp: extract_exact_tandem_repeats) which returns maximal
exact repeats (runs) with their position, total length, and period.  The
reference uses a suffix-array/LZ algorithm for periods > 3 and a direct scan
for periods <= 3; here a single vectorised numpy scan per period handles all
periods (max period is small — 3 for the SNV error model, 5 for the indel
error model — so the O(n * max_period) scan is fast and branch-free).

Semantics matched to the reference implementation:

* period 1 (homopolymers): maximal runs of one base, length >= 2.
* period p >= 2: maximal spans where s[i] == s[i+p], total length >= 2p,
  reported with their *primitive* period only (a homopolymer is not also
  reported as a dinucleotide repeat), mirroring the runs the reference's
  maximal-repetition algorithms produce.  Additionally, following the
  reference's scanner (lib/tandem/tandem.hpp:411-436), period-p repeats do
  not begin inside a run of equal characters: the start is advanced to the
  last position of any leading homopolymer run.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:  # native single-pass scanner (native/octopus_native.cpp:tandem_repeats)
    from octopus_tpu import _native
except ImportError:  # pragma: no cover
    _native = None


@dataclass(frozen=True)
class Repeat:
    pos: int
    length: int  # total span in bases (>= 2 * period)
    period: int


def find_homopolymers(codes: np.ndarray) -> list[Repeat]:
    n = len(codes)
    if n < 2:
        return []
    # run starts: positions where value changes
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    lens = ends - starts
    keep = lens >= 2
    return [Repeat(int(s), int(l), 1) for s, l in zip(starts[keep], lens[keep])]


def _find_period_runs(codes: np.ndarray, p: int) -> list[Repeat]:
    """Maximal spans with s[i] == s[i+p], span length >= 2p, primitive period p."""
    n = len(codes)
    if n < 2 * p:
        return []
    eq = codes[p:] == codes[:-p]  # eq[i] = s[i] == s[i+p], length n-p
    if not eq.any():
        return []
    # maximal True runs of eq
    padded = np.concatenate(([False], eq, [False]))
    d = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)  # eq-run [start, end)
    out: list[Repeat] = []
    for s, e in zip(starts, ends):
        length = (e - s) + p  # total bases spanned
        if length < 2 * p:
            continue
        pos = int(s)
        # Advance the start past a leading homopolymer run, as the reference
        # scanner anchors period-p repeats at the first position where
        # adjacent characters differ.  Keep at least 2 full periods.
        while (
            pos + 1 < int(e)
            and codes[pos] == codes[pos + 1]
            and (pos + 1 + 2 * p) <= int(e) + p
        ):
            pos += 1
        length = int(e) + p - pos
        if length < 2 * p:
            continue
        motif = codes[pos:pos + p]
        if _is_primitive(motif):
            out.append(Repeat(pos, int(length), p))
    return out


def _is_primitive(motif: np.ndarray) -> bool:
    # periods are tiny (<= 5): plain python beats numpy tile/compare here
    m = motif.tolist()
    p = len(m)
    for d in range(1, p):
        if p % d == 0 and all(m[k] == m[k % d] for k in range(p)):
            return False
    return True


def extract_exact_tandem_repeats(
    codes: np.ndarray, min_period: int = 1, max_period: int = 3
) -> list[Repeat]:
    """All maximal exact tandem repeats with primitive period in range,
    sorted by position."""
    if _native is not None:
        raw = _native.tandem_repeats(
            np.ascontiguousarray(codes, dtype=np.uint8).tobytes(),
            int(min_period), int(max_period))
        trip = np.frombuffer(raw, dtype=np.int32).reshape(-1, 3)
        return [Repeat(int(p), int(l), int(q)) for p, l, q in trip]
    out: list[Repeat] = []
    for p in range(max(1, min_period), max_period + 1):
        if p == 1:
            out.extend(find_homopolymers(codes))
        else:
            out.extend(_find_period_runs(codes, p))
    out.sort(key=lambda r: (r.pos, r.period))
    return out


__all__ = ["Repeat", "extract_exact_tandem_repeats", "find_homopolymers"]
