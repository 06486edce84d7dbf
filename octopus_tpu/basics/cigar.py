"""CIGAR strings as numpy (n_ops, 2) arrays of [length, opcode].

Opcodes follow the BAM specification order ``MIDNSHP=X`` (0..8); the
reference's CigarOperation flags (src/basics/cigar_string.hpp) map onto the
same alphabet.  All manipulation is vectorised; per-read python loops appear
only at the text boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# BAM opcodes
M, I, D, NSKIP, S, H, P, EQ, X = range(9)

OP_CHARS = "MIDNSHP=X"
_OP_FROM_CHAR = {c: i for i, c in enumerate(OP_CHARS)}

# op consumes query / reference (BAM spec table)
CONSUMES_QUERY = np.array([1, 1, 0, 0, 1, 0, 0, 1, 1], dtype=bool)
CONSUMES_REF = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=bool)


@dataclass(frozen=True)
class CigarOp:
    length: int
    op: int

    @property
    def char(self) -> str:
        return OP_CHARS[self.op]

    def __str__(self) -> str:
        return f"{self.length}{self.char}"


def parse_cigar(text: str) -> np.ndarray:
    """'3M1I10M' -> [[3,M],[1,I],[10,M]] int32 array."""
    if text in ("", "*"):
        return np.zeros((0, 2), dtype=np.int32)
    ops = []
    n = 0
    for ch in text:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            ops.append((n, _OP_FROM_CHAR[ch]))
            n = 0
    return np.asarray(ops, dtype=np.int32).reshape(-1, 2)


def cigar_to_string(cigar: np.ndarray) -> str:
    if len(cigar) == 0:
        return "*"
    return "".join(f"{int(l)}{OP_CHARS[int(o)]}" for l, o in cigar)


def reference_span(cigar: np.ndarray) -> int:
    """Number of reference bases consumed."""
    if len(cigar) == 0:
        return 0
    return int(cigar[CONSUMES_REF[cigar[:, 1]], 0].sum())


def query_span(cigar: np.ndarray) -> int:
    """Number of query (read sequence) bases consumed."""
    if len(cigar) == 0:
        return 0
    return int(cigar[CONSUMES_QUERY[cigar[:, 1]], 0].sum())


def is_well_formed(cigar: np.ndarray, seq_len: int) -> bool:
    if len(cigar) == 0:
        return False
    if (cigar[:, 0] <= 0).any():
        return False
    if (cigar[:, 1] > X).any():
        return False
    return query_span(cigar) == seq_len


def collapse_matches(cigar: np.ndarray) -> np.ndarray:
    """Fold =/X into M and merge adjacent same-op runs."""
    if len(cigar) == 0:
        return cigar
    ops = cigar[:, 1].copy()
    ops[(ops == EQ) | (ops == X)] = M
    out: list[list[int]] = []
    for length, op in zip(cigar[:, 0], ops):
        if out and out[-1][1] == op:
            out[-1][0] += int(length)
        else:
            out.append([int(length), int(op)])
    return np.asarray(out, dtype=np.int32).reshape(-1, 2)


def soft_clip_sizes(cigar: np.ndarray) -> tuple[int, int]:
    """(left, right) soft-clip lengths (ignoring hard clips)."""
    left = right = 0
    i = 0
    if i < len(cigar) and cigar[i, 1] == H:
        i += 1
    if i < len(cigar) and cigar[i, 1] == S:
        left = int(cigar[i, 0])
    j = len(cigar) - 1
    if j >= 0 and cigar[j, 1] == H:
        j -= 1
    if j >= 0 and cigar[j, 1] == S and (j != i or left == 0):
        right = int(cigar[j, 0])
    return left, right


def has_indel(cigar: np.ndarray) -> bool:
    return bool(np.isin(cigar[:, 1], (I, D)).any())


def expand_alignment(cigar: np.ndarray):
    """Yield (op, query_offset, ref_offset, length) walking the alignment."""
    q = r = 0
    for length, op in cigar:
        yield int(op), q, r, int(length)
        if CONSUMES_QUERY[op]:
            q += int(length)
        if CONSUMES_REF[op]:
            r += int(length)


__all__ = [
    "M", "I", "D", "NSKIP", "S", "H", "P", "EQ", "X",
    "OP_CHARS",
    "CONSUMES_QUERY", "CONSUMES_REF",
    "CigarOp",
    "parse_cigar",
    "cigar_to_string",
    "reference_span",
    "query_span",
    "is_well_formed",
    "collapse_matches",
    "soft_clip_sizes",
    "has_indel",
    "expand_alignment",
]
