"""Tests for the host reference pair-HMM against a brute-force DP oracle."""

import numpy as np
import pytest

from octopus_tpu.basics.sequence import encode_sequence
from octopus_tpu.core.likelihood import pairhmm_ref as ph


def brute_force_banded(truth_win, target, quals, opn, ext, snv_mask, snv_prior,
                       nuc_prior=2, pad=8):
    """O(R*W) oracle with explicit band constraint — independent formulation
    over absolute (y, x) cells."""
    R = len(target)
    D = 2 * pad
    W = R + 2 * pad - 1
    INF = 1 << 29
    opn = np.asarray(opn, dtype=np.int64)
    ext = np.asarray(ext, dtype=np.int64)
    cm = ph.match_costs(target, quals, truth_win, snv_mask, snv_prior)
    M = np.full((R + 1, W + 1), INF, dtype=np.int64)
    I = np.full((R + 1, W + 1), INF, dtype=np.int64)
    Dl = np.full((R + 1, W + 1), INF, dtype=np.int64)
    for x in range(W + 1):
        if 0 <= x - 0 < D:
            M[0, x] = 0

    def m_for_gap(y, x):
        # gap ops may only start an alignment from ODD truth offsets
        # (parity quirk of the reference SIMD; see pairhmm_ref.banded_score)
        if y == 0 and x % 2 == 0:
            return INF
        return M[y, x]

    for y in range(R + 1):
        for x in range(W + 1):
            d = x - y
            if not (0 <= d < D):
                continue
            if y > 0 and x > 0:
                best = min(M[y - 1, x - 1], I[y - 1, x - 1], Dl[y - 1, x - 1])
                if best < INF:
                    M[y, x] = min(M[y, x], best + cm[y - 1, x - 1])
            if y > 0 and x >= 1:
                cand = min(m_for_gap(y - 1, x) + opn[x - 1],
                           I[y - 1, x] + ext[x - 1])
                if cand < INF:
                    I[y, x] = cand + nuc_prior
            if x > 0:
                cand = min(m_for_gap(y, x - 1) + opn[x - 1],
                           I[y, x - 1] + opn[x - 1],
                           Dl[y, x - 1] + ext[x - 1])
                Dl[y, x] = min(Dl[y, x], cand)
    return int(min(M[R].min(), I[R].min(), Dl[R].min()))


def random_case(rng, R=12, pad=4, with_snv=True):
    W = R + 2 * pad - 1
    truth_win = rng.integers(0, 4, W).astype(np.uint8)
    # target = noisy copy of the centre of the window
    start = pad + rng.integers(-2, 3)
    start = max(0, min(start, W - R))
    target = truth_win[start:start + R].copy()
    nmut = rng.integers(0, 4)
    for _ in range(nmut):
        i = rng.integers(0, R)
        target[i] = rng.integers(0, 4)
    quals = rng.integers(10, 45, R).astype(np.uint8)
    opn = rng.integers(20, 50, W).astype(np.int16)
    ext = rng.integers(2, 8, W).astype(np.int16)
    if with_snv:
        snv_mask = rng.integers(0, 4, W).astype(np.uint8)
        snv_prior = rng.integers(5, 40, W).astype(np.int16)
    else:
        snv_mask = snv_prior = None
    return truth_win, target, quals, opn, ext, snv_mask, snv_prior


class TestBandedScore:
    def test_perfect_match_scores_zero(self):
        pad = 4
        target = encode_sequence("ACGTACGTACGT")
        R = len(target)
        truth_win = np.concatenate([
            encode_sequence("T" * (pad)), target, encode_sequence("A" * (pad - 1))
        ])
        quals = np.full(R, 30, np.uint8)
        opn = np.full(len(truth_win), 45, np.int16)
        ext = np.full(len(truth_win), 3, np.int16)
        s = ph.banded_score(truth_win, target, quals, opn, ext, pad=pad)
        assert s == 0

    def test_single_mismatch_costs_quality(self):
        pad = 4
        target = encode_sequence("ACGTACGTACGT").copy()
        R = len(target)
        truth_win = np.concatenate([
            encode_sequence("T" * pad), target, encode_sequence("A" * (pad - 1))
        ])
        target[5] = (target[5] + 1) % 4
        quals = np.full(R, 25, np.uint8)
        opn = np.full(len(truth_win), 45, np.int16)
        ext = np.full(len(truth_win), 3, np.int16)
        s = ph.banded_score(truth_win, target, quals, opn, ext, pad=pad)
        assert s == 25

    def test_deletion_costs_gap_open(self):
        pad = 4
        ref = encode_sequence("ACGTTGCAACGTGGA")
        # read with base 7 deleted
        target = np.concatenate([ref[:7], ref[8:]])
        R = len(target)
        W = R + 2 * pad - 1
        truth_win = np.concatenate([encode_sequence("C" * pad), ref, encode_sequence("G" * (W - pad - len(ref)))])
        quals = np.full(R, 40, np.uint8)
        opn = np.full(W, 18, np.int16)
        ext = np.full(W, 3, np.int16)
        s = ph.banded_score(truth_win, target, quals, opn, ext, pad=pad)
        assert s == 18

    def test_insertion_costs_gap_open_plus_nuc_prior(self):
        pad = 4
        ref = encode_sequence("ACGTTGCAACGTGG")
        target = np.concatenate([ref[:7], encode_sequence("T"), ref[7:]])
        R = len(target)
        W = R + 2 * pad - 1
        truth_win = np.concatenate([encode_sequence("C" * pad), ref, encode_sequence("G" * (W - pad - len(ref)))])
        quals = np.full(R, 40, np.uint8)
        opn = np.full(W, 18, np.int16)
        ext = np.full(W, 3, np.int16)
        s = ph.banded_score(truth_win, target, quals, opn, ext, pad=pad, nuc_prior=2)
        assert s == 20

    @pytest.mark.parametrize("seed", range(20))
    def test_matches_bruteforce(self, seed):
        rng = np.random.default_rng(seed)
        case = random_case(rng, R=rng.integers(6, 20), pad=int(rng.integers(2, 6)))
        truth_win, target, quals, opn, ext, m, p = case
        pad = (len(truth_win) - len(target) + 1) // 2
        got = ph.banded_score(truth_win, target, quals, opn, ext, m, p, pad=pad)
        want = brute_force_banded(truth_win, target, quals, opn, ext, m, p, pad=pad)
        assert got == want

    @pytest.mark.parametrize("seed", range(10))
    def test_align_score_matches_banded_score(self, seed):
        rng = np.random.default_rng(100 + seed)
        case = random_case(rng, R=14, pad=4)
        truth_win, target, quals, opn, ext, m, p = case
        aln = ph.banded_align(truth_win, target, quals, opn, ext, m, p, pad=4)
        score = ph.banded_score(truth_win, target, quals, opn, ext, m, p, pad=4)
        assert aln.score == score
        # path consistency: ops consume full read
        assert sum(1 for o in aln.ops if o in "MI") == len(target)

    def test_align_perfect(self):
        pad = 4
        target = encode_sequence("ACGTACGTACGT")
        R = len(target)
        truth_win = np.concatenate([
            encode_sequence("T" * pad), target, encode_sequence("A" * (pad - 1))
        ])
        quals = np.full(R, 30, np.uint8)
        opn = np.full(len(truth_win), 45, np.int16)
        ext = np.full(len(truth_win), 3, np.int16)
        aln = ph.banded_align(truth_win, target, quals, opn, ext, pad=pad)
        assert aln.score == 0
        assert aln.ops == "M" * R
        assert aln.first_pos == pad


class TestNaive:
    def _params(self, L):
        return ph.HmmParams(
            gap_open=np.full(L, 45, np.int16),
            gap_extend=np.full(L, 3, np.int16),
        )

    def test_exact_match(self):
        truth = encode_sequence("AAAACGTACGTACGTTTTT")
        target = truth[4:14].copy()
        quals = np.full(10, 30, np.uint8)
        v, ok = ph.try_naive_evaluate(truth, target, quals, 4, self._params(len(truth)))
        assert ok and v == 0.0

    def test_single_mismatch(self):
        truth = encode_sequence("AAAACGTACGTACGTTTTT")
        target = truth[4:14].copy()
        target[3] = (target[3] + 1) % 4
        quals = np.full(10, 30, np.uint8)
        v, ok = ph.try_naive_evaluate(truth, target, quals, 4, self._params(len(truth)))
        assert ok
        assert v == pytest.approx(-np.log(10) / 10 * 30)

    def test_two_mismatches_fails_over_to_hmm(self):
        truth = encode_sequence("AAAACGTACGTACGTTTTT")
        target = truth[4:14].copy()
        target[3] = (target[3] + 1) % 4
        target[7] = (target[7] + 1) % 4
        quals = np.full(10, 30, np.uint8)
        _, ok = ph.try_naive_evaluate(truth, target, quals, 4, self._params(len(truth)))
        assert not ok


class TestEvaluateRead:
    def test_mq_mixture_caps_result(self):
        rng = np.random.default_rng(0)
        truth = rng.integers(0, 4, 80).astype(np.uint8)
        target = truth[20:40].copy()
        # many mismatches -> HMM likelihood very low; MQ floor should kick in
        target[::2] = (target[::2] + 1) % 4
        quals = np.full(20, 40, np.uint8)
        params = ph.HmmParams(
            gap_open=np.full(80, 45, np.int16),
            gap_extend=np.full(80, 3, np.int16),
        )
        lnl = ph.evaluate_read(truth, target, quals, [20], 20, params, mapping_quality=20, pad=8)
        floor = -np.log(10) / 10 * 20
        assert lnl >= floor - 1e-9

    def test_perfect_read_is_zero(self):
        rng = np.random.default_rng(1)
        truth = rng.integers(0, 4, 80).astype(np.uint8)
        target = truth[20:40].copy()
        quals = np.full(20, 40, np.uint8)
        params = ph.HmmParams(
            gap_open=np.full(80, 45, np.int16),
            gap_extend=np.full(80, 3, np.int16),
        )
        lnl = ph.evaluate_read(truth, target, quals, [20], 20, params, mapping_quality=60, pad=8)
        assert lnl == 0.0
