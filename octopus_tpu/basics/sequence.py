"""DNA sequence encoding for device kernels.

The whole framework works on integer base codes (A=0, C=1, G=2, T=3, N=4 and
any other IUPAC code folded to N) stored as uint8 numpy arrays.  This is the
device-friendly analogue of the reference's std::string sequences; fixed small
codes keep comparisons and one-hot expansions cheap on the VPU.
"""

from __future__ import annotations

import numpy as np

A, C, G, T, N = 0, 1, 2, 3, 4

_ENCODE_LUT = np.full(256, N, dtype=np.uint8)
for _i, _b in enumerate("ACGT"):
    _ENCODE_LUT[ord(_b)] = _i
    _ENCODE_LUT[ord(_b.lower())] = _i

_DECODE_LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)

_COMPLEMENT_LUT = np.array([T, G, C, A, N], dtype=np.uint8)


def encode_sequence(seq: str | bytes) -> np.ndarray:
    """str/bytes -> uint8 codes (A=0 C=1 G=2 T=3, everything else N=4)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENCODE_LUT[raw]


def decode_sequence(codes: np.ndarray) -> str:
    return _DECODE_LUT[np.asarray(codes, dtype=np.uint8)].tobytes().decode("ascii")


def reverse_complement(codes: np.ndarray) -> np.ndarray:
    return _COMPLEMENT_LUT[codes[::-1]]


def encode_ascii_array(raw: np.ndarray) -> np.ndarray:
    """uint8 ASCII array -> base codes (vectorised; used by the BAM decoder)."""
    return _ENCODE_LUT[raw]


__all__ = [
    "A", "C", "G", "T", "N",
    "encode_sequence",
    "decode_sequence",
    "reverse_complement",
    "encode_ascii_array",
]
