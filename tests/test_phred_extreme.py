"""Extreme-value phred parity (VERDICT round-1 weak #7).

The reference converts near-certain posteriors to QUAL with
boost::multiprecision::cpp_dec_float big-floats (src/basics/phred.hpp:99-116);
we use float64 log1p/expm1 identities. These tests pin our conversions
against 400-digit Decimal arithmetic (the same math the big-float does) for
QUALs well above phred 300."""

import math
from decimal import Decimal, getcontext

import numpy as np
import pytest

from octopus_tpu.basics.phred import (ln_probability_true_to_phred,
                                      probability_true_to_phred)
from octopus_tpu.core.callers.base import phred_not

getcontext().prec = 400
LN10 = Decimal(10).ln()


def decimal_phred_from_ln_true(ln_p_true: float) -> float:
    """phred(1 - exp(ln_p_true)) in 400-digit decimal arithmetic."""
    p_false = Decimal(1) - Decimal(ln_p_true).exp()
    return float(-10 * p_false.ln() / LN10)


@pytest.mark.parametrize("ln_p_true", [
    -0.1, -1e-3, -1e-6, -1e-10, -1e-14, -1e-30, -1e-60, -1e-100, -1e-300,
])
def test_ln_probability_true_to_phred_matches_bigfloat(ln_p_true):
    want = decimal_phred_from_ln_true(ln_p_true)
    got = ln_probability_true_to_phred(ln_p_true, max_phred=1e9)
    assert got == pytest.approx(want, rel=1e-9), (ln_p_true, got, want)


def test_phred_beyond_3000():
    # ln p_true = -1e-300 -> p_false ~ 1e-300 -> QUAL = 3000
    got = ln_probability_true_to_phred(-1e-300, max_phred=1e9)
    assert got == pytest.approx(3000.0, abs=1e-6)


@pytest.mark.parametrize("p_true", [0.9, 1 - 1e-6, 1 - 1e-12, 1 - 1e-15])
def test_probability_true_to_phred_matches_bigfloat(p_true):
    want = float(-10 * (Decimal(1) - Decimal(p_true)).ln() / LN10)
    got = probability_true_to_phred(p_true, max_phred=1e9)
    assert got == pytest.approx(want, rel=1e-9)


def test_phred_not_is_exact_in_log_space():
    """phred_not never forms 1-p, so it is exact far beyond float64's
    1-p resolution: the complement's log posterior IS the answer."""
    # complement set holds 3 genotypes each at ln prob -800 (p ~ 1e-348,
    # far below float64's subnormal range as a probability)
    lp = np.full(3, -800.0)
    want = -(math.log(3) - 800.0) / (math.log(10) / 10)
    assert phred_not(lp) == pytest.approx(want, rel=1e-12)
    assert phred_not(lp) > 3400
    assert phred_not(np.zeros(0)) == math.inf
