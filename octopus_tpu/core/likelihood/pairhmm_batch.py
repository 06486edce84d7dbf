"""Batched pair-HMM scoring on device (XLA + Pallas TPU kernel).

The hot loop of the whole engine (reference: simd_pair_hmm.hpp:240-324 runs
once per read x haplotype pair on CPU SIMD).  Here thousands of pairs are
scored per launch:

* layout: pair batch on the 128-wide lane axis, the band of D = 2*pad
  diagonals on the sublane axis; states M/I/D are (D, B) arrays updated in a
  row wavefront over read positions;
* all penalties for row y (match, insertion charge, deletion charge) live in
  rows of ONE window slice of the truth-side arrays at offset y-1
  (truth index (y-1)+d for lane d), so each row does a single dynamic slice
  per input track;
* deletions (a within-row tropical chain over diagonals) use a log2(D)-step
  min-plus prefix scan;
* ragged read lengths are exact via PAD_CODE/quality-0 padding: pad rows cost
  0 along diagonal match moves and can never create cheaper paths, so the
  final row's band minimum equals the true score;
* the reference's parity rule (gap ops may only start an alignment at odd
  truth offsets — see pairhmm_ref.banded_score) is reproduced so scores are
  bit-identical to the reference kernel.

Two implementations with identical semantics:
  - `pairhmm_scores_xla`: pure jnp/lax, jitted; runs anywhere.
  - `pairhmm_scores_pallas`: Pallas TPU kernel, grid over pair blocks,
    truth-side tracks resident in VMEM and sliced per row with pl.ds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...basics.sequence import N

INF = 1 << 29
N_SCORE = 2
PAD_CODE = 5            # read padding: mismatches everything, costs 0 at qual 0
LANES = 128             # pair-block width on the lane axis
DEFAULT_NUC_PRIOR = 2


def _shift_down(a, fill):
    """Rows shift toward higher index: out[d] = a[d-1]; out[0] = fill."""
    return jnp.concatenate([jnp.full((1,) + a.shape[1:], fill, a.dtype), a[:-1]], axis=0)


def _shift_up(a, fill):
    """out[d] = a[d+1]; out[D-1] = fill."""
    return jnp.concatenate([a[1:], jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)


def _deletion_scan(bv, ev, D):
    """Inclusive min-plus prefix scan of affine maps f_d: v -> min(bv[d], v+ev[d]).

    Returns the chain value at each lane when the chain is fed v=INF.
    """
    s = 1
    while s < D:
        bl = jnp.concatenate(
            [jnp.full((s,) + bv.shape[1:], INF, bv.dtype), bv[:-s]], axis=0)
        el = jnp.concatenate(
            [jnp.zeros((s,) + ev.shape[1:], ev.dtype), ev[:-s]], axis=0)
        bv = jnp.minimum(bv, bl + ev)
        ev = el + ev
        s *= 2
    return bv


def _match_cost(t_row, q_row, w_win, mask_win, prior_win):
    """(D, B) match penalties: read base t_row vs window rows."""
    t = t_row[None, :]
    q = q_row[None, :]
    capped = jnp.where(mask_win == t, jnp.minimum(q, prior_win), q)
    pen = jnp.where(t == w_win, 0, capped)
    return jnp.where(w_win == N, jnp.minimum(pen, N_SCORE), pen)


def _wavefront(R, D, B, read_row, win_slice, nuc_prior):
    """Generic banded wavefront.

    read_row(y) -> (t_row, q_row) each (B,) for read position y-1.
    win_slice(y) -> (w, opn, ext, mask, prior) each (D, B), rows at truth
    index (y-1)+d.
    Returns (B,) int32 scores.
    """
    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2 == 1)
    M0 = jnp.zeros((D, B), jnp.int32)
    M0_gap = jnp.where(d_odd, jnp.zeros((D, B), jnp.int32),
                       jnp.full((D, B), INF, jnp.int32))
    I0 = jnp.full((D, B), INF, jnp.int32)
    # row-0 deletion chain: D0[d] = min(M0_gap[d-1] + opn[d-1], D0[d-1] + ext[d-1])
    _, opn0, ext0, _, _ = win_slice(0)  # rows at truth index d-1 ... use y=0 slice
    # win_slice(0) rows map to truth index (0-1)+d = d-1 conceptually; we pass
    # y=0 and the callers implement the off-by-one via shifting row 0 in.
    D0 = _deletion_scan(_shift_down(M0_gap, INF) + opn0, ext0, D)

    def step(y, M, M_for_gap, Ii, Dd):
        t_row, q_row = read_row(y)
        w_win, opn_win, ext_win, mask_win, prior_win = win_slice(y)
        cm = _match_cost(t_row, q_row, w_win, mask_win, prior_win)
        Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        base = jnp.minimum(Mn, In)
        Dn = _deletion_scan(_shift_down(base, INF) + opn_win, ext_win, D)
        return Mn, In, Dn

    # row 1 peeled: gap ops out of row 0 may only start at odd offsets, so
    # its insertion transition sees the parity-masked M0 (a traced-scalar
    # select inside the loop would break Mosaic lowering)
    M, Ii, Dd = step(1, M0, M0_gap, I0, D0)

    def body(y, state):
        M, Ii, Dd = state
        return step(y, M, M, Ii, Dd)

    M, Ii, Dd = jax.lax.fori_loop(2, R + 1, body, (M, Ii, Dd))
    return jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


def _hmm_rows(tgt, qual, win, opn, ext, mask, prior, pad, nuc_prior):
    """XLA value-based wavefront; arrays (L, B) int32, returns (B,) scores."""
    R, B = tgt.shape
    D = 2 * pad

    def read_row(y):
        return (
            jax.lax.dynamic_index_in_dim(tgt, y - 1, axis=0, keepdims=False),
            jax.lax.dynamic_index_in_dim(qual, y - 1, axis=0, keepdims=False),
        )

    def win_slice(y):
        if isinstance(y, int) and y == 0:
            # rows at truth index d-1: shift the [0:D] block down by one
            return (None, _shift_down(opn[0:D], INF), _shift_down(ext[0:D], 0), None, None)
        off = y - 1
        f = lambda a: jax.lax.dynamic_slice_in_dim(a, off, D, axis=0)
        return f(win), f(opn), f(ext), f(mask), f(prior)

    return _wavefront(R, D, B, read_row, win_slice, nuc_prior)


def _hmm_rows_fast(cm, opn, ext, R, pad, nuc_prior):
    """Wavefront over a precomputed match-cost tensor.

    cm: (R*D, B) int32 (row y*D+d = cost of target[y] vs window[y+d]);
    opn/ext: (W, B).  3 dynamic slices per row instead of 7.
    """
    D = 2 * pad
    B = cm.shape[1]

    def read_row(y):
        return None, None

    def win_slice(y):
        if isinstance(y, int) and y == 0:
            return (None, _shift_down(opn[0:D], INF), _shift_down(ext[0:D], 0), None, None)
        off = y - 1
        return (
            jax.lax.dynamic_slice_in_dim(cm, off * D, D, axis=0),
            jax.lax.dynamic_slice_in_dim(opn, off, D, axis=0),
            jax.lax.dynamic_slice_in_dim(ext, off, D, axis=0),
            None, None,
        )

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2 == 1)
    M0 = jnp.zeros((D, B), jnp.int32)
    M0_gap = jnp.where(d_odd, jnp.zeros((D, B), jnp.int32),
                       jnp.full((D, B), INF, jnp.int32))
    I0 = jnp.full((D, B), INF, jnp.int32)
    _, opn0, ext0, _, _ = win_slice(0)
    D0 = _deletion_scan(_shift_down(M0_gap, INF) + opn0, ext0, D)

    def step(y, M, M_for_gap, Ii, Dd):
        cm_win, opn_win, ext_win, _, _ = win_slice(y)
        Mn = cm_win + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        Dn = _deletion_scan(_shift_down(jnp.minimum(Mn, In), INF) + opn_win,
                            ext_win, D)
        return Mn, In, Dn

    M, Ii, Dd = step(1, M0, M0_gap, I0, D0)

    def body(y, st):
        M, Ii, Dd = st
        return step(y, M, M, Ii, Dd)

    M, Ii, Dd = jax.lax.fori_loop(2, R + 1, body, (M, Ii, Dd))
    return jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior"))
def pairhmm_scores_xla(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                       nuc_prior=DEFAULT_NUC_PRIOR):
    """Pure-XLA batched scorer.

    Inputs are (B, R) / (B, W) int32 arrays (batch-major); returns (B,) int32
    phred scores."""
    B, R = tgt.shape
    D = 2 * pad
    tgtT, qualT, winT, opnT, extT, maskT, priorT = (
        jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior))
    cm = _match_cost_tensor(tgtT, qualT, winT, maskT, priorT, R, D)
    return _hmm_rows_fast(cm, opnT, extT, R, pad, nuc_prior)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _pallas_kernel(tgt_ref, qual_ref, win_ref, opn_ref, ext_ref, mask_ref,
                   prior_ref, out_ref, *, R, pad, nuc_prior):
    D = 2 * pad
    B = tgt_ref.shape[1]

    def read_row(y):
        t = tgt_ref[pl.ds(y - 1, 1), :]
        q = qual_ref[pl.ds(y - 1, 1), :]
        return t[0], q[0]

    def win_slice(y):
        if isinstance(y, int) and y == 0:
            return (
                None,
                _shift_down(opn_ref[0:D, :], INF),
                _shift_down(ext_ref[0:D, :], 0),
                None,
                None,
            )
        off = y - 1
        return (
            win_ref[pl.ds(off, D), :],
            opn_ref[pl.ds(off, D), :],
            ext_ref[pl.ds(off, D), :],
            mask_ref[pl.ds(off, D), :],
            prior_ref[pl.ds(off, D), :],
        )

    out_ref[0, :] = _wavefront(R, D, B, read_row, win_slice, nuc_prior)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                          nuc_prior=DEFAULT_NUC_PRIOR, interpret=False):
    """Pallas TPU batched scorer; B must be a multiple of LANES.

    Same input convention as pairhmm_scores_xla ((B, R)/(B, W) int32).
    """
    B, R = tgt.shape
    W = win.shape[1]
    assert W == R + 2 * pad - 1, (W, R, pad)
    assert B % LANES == 0, B
    grid = (B // LANES,)

    def tspec(L):
        return pl.BlockSpec((L, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    args = [jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior)]
    kernel = functools.partial(_pallas_kernel, R=R, pad=pad, nuc_prior=nuc_prior)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=grid,
        in_specs=[tspec(R), tspec(R), tspec(W), tspec(W), tspec(W), tspec(W), tspec(W)],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * R * 2 * pad * B, bytes_accessed=(2 * R + 5 * W) * B * 4, transcendentals=0
        ),
    )(*args)
    return out[0]


# ---------------------------------------------------------------------------
# Pallas TPU kernel v2: match costs precomputed by XLA outside the kernel
# (the in-kernel compare/select mix crashes the remote Mosaic compiler on
# this toolchain); the kernel is the pure min-plus wavefront.
# ---------------------------------------------------------------------------

def _match_cost_tensor(tgt, qual, win, mask, prior, R, D):
    """(R*D, B) match costs; row y*D+d pairs target[y] with window[y+d]."""
    ids = jnp.arange(R)[:, None] + jnp.arange(D)[None, :]      # (R, D)
    w_g = win[ids]                                              # (R, D, B)
    m_g = mask[ids]
    p_g = prior[ids]
    t = tgt[:, None, :]
    q = qual[:, None, :]
    capped = jnp.where(m_g == t, jnp.minimum(q, p_g), q)
    cm = jnp.where(t == w_g, 0, capped)
    cm = jnp.where(w_g == N, jnp.minimum(cm, N_SCORE), cm)
    return cm.reshape(R * D, -1)


def _pallas_kernel_v2(cm_ref, opn_ref, ext_ref, out_ref, *, R, pad, nuc_prior):
    D = 2 * pad
    B = cm_ref.shape[1]
    M0 = jnp.zeros((D, B), jnp.int32)
    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2) == 1
    M0_gap = jnp.where(d_odd, jnp.zeros((D, B), jnp.int32),
                       jnp.full((D, B), INF, jnp.int32))
    I0 = jnp.full((D, B), INF, jnp.int32)
    D0 = _deletion_scan(
        _shift_down(M0_gap, INF) + _shift_down(opn_ref[0:D, :], INF),
        _shift_down(ext_ref[0:D, :], 0), D)

    def step(y, M, M_for_gap, Ii, Dd):
        cm = cm_ref[pl.ds((y - 1) * D, D), :]
        opn_win = opn_ref[pl.ds(y - 1, D), :]
        ext_win = ext_ref[pl.ds(y - 1, D), :]
        Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        Dn = _deletion_scan(_shift_down(jnp.minimum(Mn, In), INF) + opn_win,
                            ext_win, D)
        return Mn, In, Dn

    M, Ii, Dd = step(1, M0, M0_gap, I0, D0)

    def body(y, st):
        M, Ii, Dd = st
        return step(y, M, M, Ii, Dd)

    # fully unrolled: every slice offset becomes a compile-time constant
    # (Mosaic supports only unroll=1 or full unroll; constants also lift the
    # unaligned-dynamic-slice overhead)
    for y in range(2, R + 1):
        M, Ii, Dd = step(y, M, M, Ii, Dd)
    out_ref[0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


V2_LANES = 128   # >=256-lane blocks hit internal Mosaic compiler bugs on this toolchain


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v2(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                             nuc_prior=DEFAULT_NUC_PRIOR, interpret=False):
    """Pallas TPU scorer with XLA-precomputed match costs."""
    B, R = tgt.shape
    D = 2 * pad
    W = win.shape[1]
    assert W == R + 2 * pad - 1, (W, R, pad)
    BLK = V2_LANES if B % V2_LANES == 0 else LANES
    assert B % BLK == 0, B
    tgtT, qualT, winT, opnT, extT, maskT, priorT = (
        jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior))
    cm = _match_cost_tensor(tgtT, qualT, winT, maskT, priorT, R, D)
    kernel = functools.partial(_pallas_kernel_v2, R=R, pad=pad, nuc_prior=nuc_prior)

    def tspec(L):
        return pl.BlockSpec((L, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BLK,),
        in_specs=[tspec(R * D), tspec(W), tspec(W)],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=25 * R * D * B, bytes_accessed=(R * D + 2 * W) * B * 4,
            transcendentals=0),
    )(cm, opnT, extT)
    return out[0]


# ---------------------------------------------------------------------------
# Pallas TPU kernel v3: the reference's interleaved half-step wavefront
# (simd_pair_hmm.hpp:271-321) vectorised with the band's P=pad lanes on
# sublanes and pairs on lanes.  Versus v2 this halves the band tile (phases
# alternate instead of stacking) and removes the per-row deletion scan — the
# deletion chain advances one lane per half-step exactly as in the reference.
# ---------------------------------------------------------------------------

def _match_cost_halfstep_tensors(tgt, qual, win, mask, prior, R, P, T):
    """cm_even/cm_odd as (T*P, B): row t*P+j pairs target[t-j] with
    truth[j+t] (even) / truth[j+t+1] (odd).  Out-of-range target rows are 0
    (phantom lanes never reach extraction)."""
    B = tgt.shape[1]
    t_grid = jnp.arange(T)[:, None]
    j_grid = jnp.arange(P)[None, :]
    y = t_grid - j_grid                               # (T, P)
    y_ok = (y >= 0) & (y < R)
    y_c = jnp.clip(y, 0, R - 1)
    tg = tgt[y_c]                                     # (T, P, B)
    qg = qual[y_c]

    def cost(x_idx):
        x_c = jnp.clip(x_idx, 0, win.shape[0] - 1)
        w = win[x_c]
        m = mask[x_c]
        p = prior[x_c]
        capped = jnp.where(m == tg, jnp.minimum(qg, p), qg)
        pen = jnp.where(tg == w, 0, capped)
        pen = jnp.where(w == N, jnp.minimum(pen, N_SCORE), pen)
        return jnp.where(y_ok[:, :, None], pen, 0).reshape(T * P, B)

    return cost(t_grid + j_grid), cost(t_grid + j_grid + 1)


V3_LANES = 128   # wide pair blocks amortise Mosaic per-op overhead; all
                 # dynamic row offsets are 8-aligned to satisfy the layout
                 # checker at this width


def _pallas_kernel_v3(cm_ref, gap_ref, mask_ref, out_ref, *, R, pad, nuc_prior):
    # cm_ref: (T*2P, B) rows [t*2P .. t*2P+P) even costs, [.. +2P) odd costs
    # gap_ref: (2(W+2), B) rows: open track then extend track
    # mask_ref: (T*P, B) bit0 = seed lane, bit1 = extract lane
    # (a traced-scalar broadcast compare inside the loop is an illegal
    # relayout for Mosaic, so masks are precomputed and sliced)
    P = pad
    B = cm_ref.shape[1]
    Wtrack = gap_ref.shape[0] // 2   # rows per track ((T+1)*P)
    INFc = jnp.full((P, B), INF, jnp.int32)
    ZEROc = jnp.zeros((P, B), jnp.int32)
    ONEc = jnp.ones((P, B), jnp.int32)

    def shift_down(a):
        return jnp.concatenate([INFc[:1], a[:-1]], axis=0)

    def shift_up(a):
        return jnp.concatenate([a[1:], INFc[:1]], axis=0)

    def body(t, st):
        m1, i1, d1, m2, i2, d2, best = st
        # gap_ref holds per-step P-row blocks (open track then extend track)
        # so every slice offset is a multiple of P
        go_cur = gap_ref[pl.ds(t * P, P), :]
        go_nxt = gap_ref[pl.ds((t + 1) * P, P), :]
        ge_cur = gap_ref[pl.ds(Wtrack + t * P, P), :]
        ge_nxt = gap_ref[pl.ds(Wtrack + (t + 1) * P, P), :]
        cm2 = cm_ref[pl.ds(t * 2 * P, 2 * P), :]
        mask = mask_ref[pl.ds(t * P, P), :]
        seed = (mask & 1) != 0
        keep = (mask & 2) != 0
        # ---- even half-step ----
        m1 = jnp.where(seed, ZEROc, m1)
        m2 = jnp.where(seed, ZEROc, m2)
        m1 = jnp.minimum(m1, jnp.minimum(i1, d1))
        best = jnp.minimum(best, jnp.where(keep, m1, INFc))
        m1 = m1 + cm2[:P]
        d1 = shift_down(jnp.minimum(d2 + ge_nxt, jnp.minimum(m2, i2) + go_nxt))
        i1 = jnp.minimum(i2 + ge_cur, m2 + go_cur) + nuc_prior
        # ---- odd half-step ----
        m2 = jnp.minimum(m2, jnp.minimum(i2, d2))
        best = jnp.minimum(best, jnp.where(keep, m2, INFc))
        m2 = m2 + cm2[P:]
        d2 = jnp.minimum(d1 + ge_nxt, jnp.minimum(m1, i1) + go_nxt)
        i2 = jnp.minimum(shift_up(i1) + ge_nxt, shift_up(m1) + go_nxt) + nuc_prior
        return m1, i1, d1, m2, i2, d2, best

    init = (INFc, INFc, INFc, INFc, INFc, INFc, INFc)
    st = jax.lax.fori_loop(0, R + P, body, init)
    out_ref[0, :] = jnp.min(st[6], axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v3(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                             nuc_prior=DEFAULT_NUC_PRIOR, interpret=False):
    """Half-step wavefront Pallas scorer (reference SIMD structure)."""
    B, R = tgt.shape
    P = pad
    W = win.shape[1]
    assert W == R + 2 * pad - 1, (W, R, pad)
    BLK = V3_LANES if B % V3_LANES == 0 else LANES
    assert B % BLK == 0, B
    T = R + P
    tgtT, qualT, winT, opnT, extT, maskT, priorT = (
        jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior))
    # pad the truth-side tracks by one row (the reference clamps gap indices
    # and treats beyond-end truth as N)
    winT = jnp.concatenate([winT, jnp.full((1, B), N, jnp.int32)], axis=0)
    opnT = jnp.concatenate([opnT, opnT[-1:]], axis=0)
    extT = jnp.concatenate([extT, extT[-1:]], axis=0)
    maskT = jnp.concatenate([maskT, jnp.full((1, B), PAD_CODE, jnp.int32)], axis=0)
    priorT = jnp.concatenate([priorT, jnp.zeros((1, B), jnp.int32)], axis=0)
    cm_e, cm_o = _match_cost_halfstep_tensors(tgtT, qualT, winT, maskT, priorT, R, P, T)
    # interleave even/odd costs per step: rows [t*2P, t*2P+2P)
    cm = jnp.concatenate([cm_e.reshape(T, P, B), cm_o.reshape(T, P, B)],
                         axis=1).reshape(T * 2 * P, B)
    # window slices need rows up to (T-1) + 1 + P = R + 2P = W + 1 rows;
    # re-lay the gap tracks as per-step P-row blocks (aligned kernel slices)
    opnT = jnp.concatenate([opnT, opnT[-1:]], axis=0)
    extT = jnp.concatenate([extT, extT[-1:]], axis=0)
    ids = jnp.arange(T + 1)[:, None] + jnp.arange(P)[None, :]
    go_steps = opnT[ids].reshape((T + 1) * P, B)
    ge_steps = extT[ids].reshape((T + 1) * P, B)
    gap = jnp.concatenate([go_steps, ge_steps], axis=0)
    # per-step lane masks (bit0 seed, bit1 extract), shared across blocks
    t_grid = jnp.arange(T)[:, None]
    j_grid = jnp.arange(P)[None, :]
    mask_bits = ((j_grid == t_grid).astype(jnp.int32)
                 + 2 * (j_grid == t_grid - R).astype(jnp.int32))
    mask_bits = jnp.broadcast_to(mask_bits.reshape(T * P, 1), (T * P, BLK))
    kernel = functools.partial(_pallas_kernel_v3, R=R, pad=pad, nuc_prior=nuc_prior)

    def tspec(L):
        return pl.BlockSpec((L, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BLK,),
        in_specs=[tspec(T * 2 * P), tspec(2 * (T + 1) * P),
                  pl.BlockSpec((T * P, BLK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=26 * (R + P) * P * B, bytes_accessed=(2 * T * P + 2 * W) * B * 4,
            transcendentals=0),
    )(cm, gap, mask_bits)
    return out[0]


def pairhmm_scores(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                   nuc_prior=DEFAULT_NUC_PRIOR):
    """Dispatch: Pallas v2 on TPU (if enabled), XLA elsewhere.

    The Pallas path is opt-in via OCTOPUS_TPU_USE_PALLAS=1 until the remote
    Mosaic toolchain stabilises; the XLA path is semantically identical.
    """
    import os
    platform = jax.default_backend()
    if (platform == "tpu" and tgt.shape[0] % LANES == 0
            and os.environ.get("OCTOPUS_TPU_USE_PALLAS") == "1"):
        return pairhmm_scores_pallas_v2(tgt, qual, win, opn, ext, mask, prior,
                                        pad=pad, nuc_prior=nuc_prior)
    return pairhmm_scores_xla(tgt, qual, win, opn, ext, mask, prior,
                              pad=pad, nuc_prior=nuc_prior)


__all__ = [
    "pairhmm_scores",
    "pairhmm_scores_xla",
    "pairhmm_scores_pallas",
    "PAD_CODE",
    "LANES",
    "INF",
]
