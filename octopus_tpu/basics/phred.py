"""Phred-scale conversions.

Matches the reference's Phred<T> (src/basics/phred.hpp) including the
extended-precision path used for very confident posteriors: the reference
switches to big-float log computation when p -> 1 (src/basics/phred.hpp:99-116);
here float64 log1p/expm1 identities cover the same range without
multiprecision, and extremely small error probabilities are computed directly
in log space so no underflow occurs.
"""

from __future__ import annotations

import math

import numpy as np

LN10_DIV_10 = math.log(10.0) / 10.0  # phred -> -ln units


def phred_to_ln_prob(phred) -> np.ndarray:
    """Phred error quality -> ln(error probability)."""
    return -LN10_DIV_10 * np.asarray(phred, dtype=np.float64)


def ln_prob_to_phred(ln_prob) -> np.ndarray:
    """ln(error probability) -> phred."""
    return -np.asarray(ln_prob, dtype=np.float64) / LN10_DIV_10


def probability_false_to_phred(prob_false: float) -> float:
    """P(call wrong) -> phred quality."""
    if prob_false <= 0.0:
        return math.inf
    return -10.0 * math.log10(prob_false)


def probability_true_to_phred(prob_true: float, max_phred: float = 1e6) -> float:
    """P(call correct) -> phred quality of the complementary error.

    Uses log1p for p -> 1 stability (the reference reaches for
    cpp_dec_float here; float64 log1p is exact to ~1e-300 error probs).
    """
    if prob_true >= 1.0:
        return max_phred
    q = -10.0 * math.log1p(-prob_true) / math.log(10.0)
    return min(q, max_phred)


def ln_probability_true_to_phred(ln_prob_true: float, max_phred: float = 1e6) -> float:
    """ln P(call correct) -> phred; handles ln p very close to 0."""
    if ln_prob_true >= 0.0:
        return max_phred
    # p_false = -expm1(ln_p_true)
    p_false = -math.expm1(ln_prob_true)
    if p_false <= 0.0:
        return max_phred
    return min(-10.0 * math.log10(p_false), max_phred)


def probability_to_phred(prob_false) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return -10.0 * np.log10(np.asarray(prob_false, dtype=np.float64))


__all__ = [
    "LN10_DIV_10",
    "phred_to_ln_prob",
    "ln_prob_to_phred",
    "probability_false_to_phred",
    "probability_true_to_phred",
    "ln_probability_true_to_phred",
    "probability_to_phred",
]
