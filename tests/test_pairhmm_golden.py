"""Parity test: our banded DP vs the REFERENCE SSE2 pair-HMM kernel.

Compiles nothing itself — uses the harness binary built from
tests/golden/golden_pairhmm.cpp (which #includes the reference headers in
place).  Skipped when the binary is unavailable.
"""

import os
import subprocess

import numpy as np
import pytest

from octopus_tpu.core.likelihood import pairhmm_ref as ph

HARNESS = os.path.join(os.path.dirname(__file__), "golden", "golden_pairhmm")

pytestmark = pytest.mark.skipif(
    not os.path.exists(HARNESS), reason="golden harness not built"
)


def run_reference(cases, pad=8, nuc_prior=2):
    lines = []
    for truth_win, target, quals, opn, ext, mask, prior in cases:
        R, W = len(target), len(truth_win)
        lines.append(f"{R} {W} {pad} {nuc_prior}")
        lines.append(" ".join(map(str, target.tolist())))
        lines.append(" ".join(map(str, quals.tolist())))
        lines.append(" ".join(map(str, truth_win.tolist())))
        lines.append(" ".join(map(str, opn.tolist())))
        lines.append(" ".join(map(str, ext.tolist())))
        if mask is None:
            lines.append(" ".join(["-1"] + ["0"] * (W - 1)))
            lines.append(" ".join(["0"] * W))
        else:
            lines.append(" ".join(map(str, mask.tolist())))
            lines.append(" ".join(map(str, prior.tolist())))
    out = subprocess.run(
        [HARNESS], input="\n".join(lines) + "\n", capture_output=True, text=True, timeout=60
    )
    assert out.returncode == 0, out.stderr
    return [int(x) for x in out.stdout.split()]


def make_cases(seed, n, pad=8, with_snv=True, max_muts=5):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n):
        R = int(rng.integers(10, 120))
        W = R + 2 * pad - 1
        truth_win = rng.integers(0, 4, W).astype(np.int64)
        if rng.random() < 0.3:  # sprinkle Ns into some cases
            idx = rng.integers(0, W, max(1, W // 30))
            truth_win[idx] = 4
        start = int(np.clip(pad + rng.integers(-pad, pad + 1), 0, W - R))
        target = truth_win[start:start + R].copy()
        target[target == 4] = 0
        for _ in range(int(rng.integers(0, max_muts))):
            kind = rng.random()
            i = int(rng.integers(0, len(target)))
            if kind < 0.6:  # SNV
                target[i] = (target[i] + rng.integers(1, 4)) % 4
            elif kind < 0.8 and len(target) > 12:  # deletion in read
                dlen = int(rng.integers(1, 4))
                target = np.concatenate((target[:i], target[i + dlen:]))
            else:  # insertion in read
                ins = rng.integers(0, 4, int(rng.integers(1, 4)))
                target = np.concatenate((target[:i], ins, target[i:]))
        # keep read within window capacity: R' <= W - 2*pad + 1
        max_r = W - 2 * pad + 1
        target = target[:max_r]
        R2 = len(target)
        # regenerate window length to match exactly
        W2 = R2 + 2 * pad - 1
        truth_win2 = truth_win[:W2]
        quals = rng.integers(5, 60, R2).astype(np.int64)
        opn = rng.integers(10, 55, W2).astype(np.int64)
        ext = rng.integers(1, 10, W2).astype(np.int64)
        if with_snv:
            mask = rng.integers(0, 4, W2).astype(np.int64)
            prior = rng.integers(3, 50, W2).astype(np.int64)
        else:
            mask = prior = None
        cases.append((truth_win2, target, quals, opn, ext, mask, prior))
    return cases


@pytest.mark.parametrize("with_snv", [False, True])
def test_scores_match_reference_kernel(with_snv):
    cases = make_cases(seed=42 if with_snv else 7, n=120, with_snv=with_snv)
    want = run_reference(cases)
    assert len(want) == len(cases)
    for i, (case, ref_score) in enumerate(zip(cases, want)):
        truth_win, target, quals, opn, ext, mask, prior = case
        got = ph.banded_score(
            truth_win.astype(np.uint8),
            target.astype(np.uint8),
            quals.astype(np.uint8),
            opn.astype(np.int16),
            ext.astype(np.int16),
            None if mask is None else mask.astype(np.uint8),
            None if prior is None else prior.astype(np.int16),
            pad=8,
        )
        assert got == ref_score, f"case {i}: got {got}, reference {ref_score}"


def test_heavy_indel_cases_match():
    cases = make_cases(seed=1234, n=60, with_snv=True, max_muts=12)
    want = run_reference(cases)
    for i, (case, ref_score) in enumerate(zip(cases, want)):
        truth_win, target, quals, opn, ext, mask, prior = case
        got = ph.banded_score(
            truth_win.astype(np.uint8), target.astype(np.uint8), quals.astype(np.uint8),
            opn.astype(np.int16), ext.astype(np.int16),
            mask.astype(np.uint8), prior.astype(np.int16), pad=8,
        )
        assert got == ref_score, f"case {i}: got {got}, reference {ref_score}"


def make_long_indel_cases(seed, n, pad, indel_len_range=(9, 24)):
    """Cases with a single long indel, scorable only when the band (pad)
    is wide enough (simd_pair_hmm_wrapper.hpp band selection)."""
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n):
        R = int(rng.integers(60, 120))
        W = R + 2 * pad - 1
        truth_win = rng.integers(0, 4, W).astype(np.int64)
        start = pad
        target = truth_win[start:start + R].copy()
        dlen = int(rng.integers(*indel_len_range))
        i = int(rng.integers(5, R - dlen - 5))
        if rng.random() < 0.5:   # deletion of dlen truth bases in the read
            target = np.concatenate(
                (target[:i], truth_win[start + i + dlen:start + R]))
        else:                     # insertion of dlen novel bases
            ins = rng.integers(0, 4, dlen)
            target = np.concatenate((target[:i], ins, target[i:]))
        target = target[:W - 2 * pad + 1]
        R2 = len(target)
        W2 = R2 + 2 * pad - 1
        truth_win2 = truth_win[:W2]
        quals = rng.integers(25, 50, R2).astype(np.int64)
        opn = rng.integers(20, 45, W2).astype(np.int64)
        ext = rng.integers(1, 6, W2).astype(np.int64)
        mask = rng.integers(0, 4, W2).astype(np.int64)
        prior = rng.integers(3, 50, W2).astype(np.int64)
        cases.append((truth_win2, target, quals, opn, ext, mask, prior))
    return cases


@pytest.mark.parametrize("pad", [16, 32])
def test_wide_band_long_indels_match_reference(pad):
    """Bands 16/32 score long indels identically to the reference kernel
    (VERDICT round-1 item #5: adaptive band parity above pad 8)."""
    cases = (make_cases(seed=90 + pad, n=40, with_snv=True, pad=pad)
             + make_long_indel_cases(seed=91 + pad, n=40, pad=pad,
                                     indel_len_range=(9, pad + pad // 2)))
    want = run_reference(cases, pad=pad)
    assert len(want) == len(cases)
    for i, (case, ref_score) in enumerate(zip(cases, want)):
        truth_win, target, quals, opn, ext, mask, prior = case
        got = ph.banded_score(
            truth_win.astype(np.uint8), target.astype(np.uint8),
            quals.astype(np.uint8), opn.astype(np.int16),
            ext.astype(np.int16), mask.astype(np.uint8),
            prior.astype(np.int16), pad=pad,
        )
        assert got == ref_score, f"pad {pad} case {i}: {got} != {ref_score}"


@pytest.mark.parametrize("pad", [16])
def test_wide_band_xla_kernel_matches(pad):
    """The batched XLA scorer agrees with the golden DP at wide bands."""
    from octopus_tpu.core.likelihood.pairhmm_batch import pairhmm_scores_xla
    cases = make_long_indel_cases(seed=140, n=24, pad=pad)
    L = max(len(c[1]) for c in cases)
    W = L + 2 * pad - 1
    n = len(cases)
    tgt = np.full((n, L), 5, np.int64)
    qual = np.zeros((n, L), np.int64)
    win = np.full((n, W), 4, np.int64)
    opn = np.full((n, W), 64, np.int64)
    ext = np.full((n, W), 64, np.int64)
    msk = np.full((n, W), 5, np.int64)
    pri = np.zeros((n, W), np.int64)
    want = []
    for i, (tw, t, q, o, e, m, p) in enumerate(cases):
        r, w = len(t), len(tw)
        tgt[i, :r], qual[i, :r] = t, q
        win[i, :w], opn[i, :w], ext[i, :w], msk[i, :w], pri[i, :w] = tw, o, e, m, p
        want.append(ph.banded_score(
            tw.astype(np.uint8), t.astype(np.uint8), q.astype(np.uint8),
            o.astype(np.int16), e.astype(np.int16), m.astype(np.uint8),
            p.astype(np.int16), pad=pad))
    got = np.asarray(pairhmm_scores_xla(tgt, qual, win, opn, ext, msk, pri,
                                        pad=pad))
    assert got.tolist() == want
