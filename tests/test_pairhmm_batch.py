"""Batched device pair-HMM vs the numpy golden model."""

import os
import numpy as np
import pytest

from octopus_tpu.core.likelihood import pairhmm_ref as ph
from octopus_tpu.core.likelihood.pairhmm_batch import (
    PAD_CODE,
    pairhmm_scores_xla,
    pairhmm_scores_pallas_v2,
    pairhmm_scores_pallas_v8,
)


def make_batch(seed, B=16, pad=8, rmax=40):
    """Random ragged cases packed into a fixed (B, Rmax)/(B, Wmax) bucket."""
    rng = np.random.default_rng(seed)
    W = rmax + 2 * pad - 1
    tgt = np.full((B, rmax), PAD_CODE, np.int32)
    qual = np.zeros((B, rmax), np.int32)
    win = np.zeros((B, W), np.int32)
    opn = np.zeros((B, W), np.int32)
    ext = np.zeros((B, W), np.int32)
    mask = np.zeros((B, W), np.int32)
    prior = np.zeros((B, W), np.int32)
    cases = []
    for b in range(B):
        R = int(rng.integers(8, rmax + 1))
        truth_win = rng.integers(0, 4, W)
        if rng.random() < 0.3:
            truth_win[rng.integers(0, W, 2)] = 4
        start = int(np.clip(pad + rng.integers(-3, 4), 0, W - R))
        target = truth_win[start:start + R].copy()
        target[target == 4] = 0
        for _ in range(int(rng.integers(0, 5))):
            i = int(rng.integers(0, len(target)))
            r = rng.random()
            if r < 0.6:
                target[i] = (target[i] + rng.integers(1, 4)) % 4
            elif r < 0.8 and len(target) > 10:
                target = np.concatenate((target[:i], target[i + 2:]))
            else:
                target = np.concatenate((target[:i], rng.integers(0, 4, 1), target[i:]))
        target = target[:rmax]
        R = len(target)
        q = rng.integers(5, 60, R)
        o = rng.integers(10, 55, W)
        e = rng.integers(1, 10, W)
        m = rng.integers(0, 4, W)
        p = rng.integers(3, 50, W)
        tgt[b, :R] = target
        qual[b, :R] = q
        win[b], opn[b], ext[b], mask[b], prior[b] = truth_win, o, e, m, p
        cases.append((truth_win, target, q, o, e, m, p))
    return (tgt, qual, win, opn, ext, mask, prior), cases


def golden_scores(cases, pad=8):
    out = []
    for truth_win, target, q, o, e, m, p in cases:
        # window trimmed to this read's true length
        W = len(target) + 2 * pad - 1
        out.append(ph.banded_score(
            truth_win[:W].astype(np.uint8), target.astype(np.uint8), q.astype(np.uint8),
            o[:W].astype(np.int16), e[:W].astype(np.int16),
            m[:W].astype(np.uint8), p[:W].astype(np.int16), pad=pad,
        ))
    return np.asarray(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_xla_matches_numpy_golden(seed):
    batch, cases = make_batch(seed)
    got = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    want = golden_scores(cases)
    np.testing.assert_array_equal(got, want)


def test_xla_uniform_lengths():
    batch, cases = make_batch(seed=9, B=8, rmax=24)
    got = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    want = golden_scores(cases)
    np.testing.assert_array_equal(got, want)


def test_pallas_v2_interpret_matches_xla():
    batch, cases = make_batch(seed=4, B=128, rmax=32)
    want = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    got = np.asarray(pairhmm_scores_pallas_v2(*batch, pad=8, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [3, 8])
def test_pallas_v8_interpret_matches_xla(seed):
    batch, cases = make_batch(seed=seed, B=128, rmax=32)
    want = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    argsT = [np.ascontiguousarray(a.T) for a in batch]
    got = np.asarray(pairhmm_scores_pallas_v8(*argsT, pad=8, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [5, 9])
def test_pallas_v9_interpret_matches_xla(seed):
    from octopus_tpu.core.likelihood.pairhmm_batch import pairhmm_scores_pallas_v9
    batch, cases = make_batch(seed=seed, B=128, rmax=32)
    want = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    argsT = [np.ascontiguousarray(a.T) for a in batch]
    got = np.asarray(pairhmm_scores_pallas_v9(*argsT, pad=8, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [6, 11])
def test_pallas_v12_interpret_matches_xla(seed):
    """Grouped-chain production kernel: K=4 independent wavefronts per
    grid step; bit-identical to the XLA reference path."""
    from octopus_tpu.core.likelihood.pairhmm_batch import (
        LANES, V12_GROUPS, pairhmm_scores_pallas_v12)
    batch, cases = make_batch(seed=seed, B=LANES * V12_GROUPS, rmax=32)
    want = np.asarray(pairhmm_scores_xla(*batch, pad=8))
    argsT = [np.ascontiguousarray(a.T) for a in batch]
    got = np.asarray(pairhmm_scores_pallas_v12(*argsT, pad=8, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_kernel_dispatch_by_batch_size():
    from octopus_tpu.core.likelihood.pairhmm_batch import (
        _pallas_fn_for, pairhmm_scores_pallas_v9, pairhmm_scores_pallas_v12)
    assert _pallas_fn_for(2048) is pairhmm_scores_pallas_v12
    assert _pallas_fn_for(128) is pairhmm_scores_pallas_v9
    os.environ["OCTOPUS_TPU_KERNEL"] = "v9"
    try:
        assert _pallas_fn_for(2048) is pairhmm_scores_pallas_v9
    finally:
        del os.environ["OCTOPUS_TPU_KERNEL"]
