"""Batched pair-HMM scoring on device (XLA + Pallas TPU kernels).

The hot loop of the whole engine (reference: simd_pair_hmm.hpp:240-324 runs
once per read x haplotype pair on CPU SIMD).  Here thousands of pairs are
scored per launch:

* layout: pair batch on the 128-wide lane axis, the band of D = 2*pad
  diagonals on the sublane axis; states M/I/D are (D, B) arrays updated in a
  row wavefront over read positions;
* all penalties for row y (match, insertion charge, deletion charge) live in
  rows of ONE window slice of the truth-side arrays at offset y-1
  (truth index (y-1)+d for lane d), so each row does a single slice per
  input track;
* ragged read lengths are exact via PAD_CODE/quality-0 padding: pad rows cost
  0 along diagonal match moves and can never create cheaper paths, so the
  final row's band minimum equals the true score;
* the reference's parity rule (gap ops may only start an alignment at odd
  truth offsets — see pairhmm_ref.banded_score) is reproduced so scores are
  bit-identical to the reference kernel.

Implementations with identical semantics:
  - `pairhmm_scores_xla`: pure jnp/lax, jitted; runs anywhere.
  - `pairhmm_scores_pallas_v2`: Pallas kernel over an XLA-precomputed match
    cost tensor (kept as the conservative fallback / comparison point).
  - `pairhmm_scores_pallas_v8`: the production TPU kernel.  Inputs arrive in
    kernel layout (rows, B) so no device transposes or cost-tensor gather are
    needed; match costs are computed in-kernel per row, and the deletion
    min-plus scan is reduced to a running-min scan with a prefix-sum-of-ext
    track:  D_d = min_{j<=d}(bv_j - preE[y-1+j]) + preE[y-1+d].
    3.1x the v2 throughput on a v5e chip (see BASELINE.md).
"""

from __future__ import annotations

import functools
import os

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


def _min_scan(u, D):
    """Inclusive running minimum along the leading (diagonal) axis."""
    s = 1
    while s < D:
        shifted = jnp.concatenate(
            [jnp.full((s,) + u.shape[1:], INF, u.dtype), u[:-s]], axis=0)
        u = jnp.minimum(u, shifted)
        s *= 2
    return u


# ---------------------------------------------------------------------------
# Pure-XLA path (portable: CPU tests, non-TPU backends, shard_map reference)
# ---------------------------------------------------------------------------

def _hmm_rows_fast(cm, opn, ext, R, pad, nuc_prior):
    """Wavefront over a precomputed match-cost tensor.

    cm: (R*D, B) int32 (row y*D+d = cost of target[y] vs window[y+d]);
    opn/ext: (W, B).
    """
    D = 2 * pad
    B = cm.shape[1]

    def win_slice(y):
        if isinstance(y, int) and y == 0:
            return (None, _shift_down(opn[0:D], INF), _shift_down(ext[0:D], 0))
        off = y - 1
        return (
            jax.lax.dynamic_slice_in_dim(cm, off * D, D, axis=0),
            jax.lax.dynamic_slice_in_dim(opn, off, D, axis=0),
            jax.lax.dynamic_slice_in_dim(ext, off, D, axis=0),
        )

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2 == 1)
    M0 = jnp.zeros((D, B), jnp.int32)
    M0_gap = jnp.where(d_odd, jnp.zeros((D, B), jnp.int32),
                       jnp.full((D, B), INF, jnp.int32))
    I0 = jnp.full((D, B), INF, jnp.int32)
    _, opn0, ext0 = win_slice(0)
    D0 = _deletion_scan(_shift_down(M0_gap, INF) + opn0, ext0, D)

    def step(y, M, M_for_gap, Ii, Dd):
        cm_win, opn_win, ext_win = win_slice(y)
        Mn = cm_win + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        Dn = _deletion_scan(_shift_down(jnp.minimum(Mn, In), INF) + opn_win,
                            ext_win, D)
        return Mn, In, Dn

    # row 1 peeled: gap ops out of row 0 may only start at odd offsets, so
    # its insertion transition sees the parity-masked M0
    M, Ii, Dd = step(1, M0, M0_gap, I0, D0)

    def body(y, st):
        M, Ii, Dd = st
        return step(y, M, M, Ii, Dd)

    M, Ii, Dd = jax.lax.fori_loop(2, R + 1, body, (M, Ii, Dd))
    return jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


def _hmm_rows(tgt, qual, win, opn, ext, mask, prior, pad, nuc_prior):
    """XLA wavefront from kernel-layout (rows, B) int32 arrays."""
    R = tgt.shape[0]
    D = 2 * pad
    cm = _match_cost_tensor(tgt, qual, win, mask, prior, R, D)
    return _hmm_rows_fast(cm, opn, ext, R, pad, nuc_prior)


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


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior"))
def pairhmm_scores_xla(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                       nuc_prior=DEFAULT_NUC_PRIOR):
    """Pure-XLA batched scorer.

    Inputs are (B, R) / (B, W) int32 arrays (batch-major); returns (B,) int32
    phred scores."""
    tgtT, qualT, winT, opnT, extT, maskT, priorT = (
        jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior))
    return _hmm_rows(tgtT, qualT, winT, opnT, extT, maskT, priorT, pad, nuc_prior)


# ---------------------------------------------------------------------------
# Pallas v2: kernel over an XLA-precomputed match-cost tensor (fallback)
# ---------------------------------------------------------------------------

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
    # fully unrolled: every slice offset becomes a compile-time constant
    for y in range(2, R + 1):
        M, Ii, Dd = step(y, M, M, Ii, Dd)
    out_ref[0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v2(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                             nuc_prior=DEFAULT_NUC_PRIOR, interpret=False):
    """Pallas TPU scorer with XLA-precomputed match costs (batch-major API)."""
    B, R = tgt.shape
    D = 2 * pad
    W = win.shape[1]
    assert W == R + 2 * pad - 1, (W, R, pad)
    BLK = LANES
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
# Pallas v8: the production kernel
# ---------------------------------------------------------------------------

def _pallas_kernel_v8(tgt_ref, qual_ref, win_ref, opn_ref, ext_ref, mask_ref,
                      prior_ref, pre_ref, out_ref, *, R, pad, nuc_prior):
    D = 2 * pad
    B = out_ref.shape[1]

    def cm_at(y):
        t = tgt_ref[y - 1:y, :]
        q = qual_ref[y - 1:y, :]
        w = win_ref[y - 1:y - 1 + D, :]
        m = mask_ref[y - 1:y - 1 + D, :]
        p = prior_ref[y - 1:y - 1 + D, :]
        capped = jnp.where(m == t, jnp.minimum(q, p), q)
        pen = jnp.where(t == w, 0, capped)
        return jnp.where(w == N, jnp.minimum(pen, N_SCORE), pen)

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2) == 1
    ZERO = jnp.zeros((D, B), jnp.int32)
    INFc = jnp.full((D, B), INF, jnp.int32)
    M0_gap = jnp.where(d_odd, ZERO, INFc)
    opn0 = _shift_down(opn_ref[0:D, :], INF)
    pre0 = _shift_down(pre_ref[0:D, :], 0)
    bv0 = _shift_down(M0_gap, INF) + opn0
    D0 = _min_scan(bv0 - pre0, D) + pre0

    def step(y, M, M_for_gap, Ii, Dd):
        cm = cm_at(y)
        opn_win = opn_ref[y - 1:y - 1 + D, :]
        ext_win = ext_ref[y - 1:y - 1 + D, :]
        pre_win = pre_ref[y - 1:y - 1 + D, :]
        Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        bv = _shift_down(jnp.minimum(Mn, In), INF) + opn_win
        Dn = _min_scan(bv - pre_win, D) + pre_win
        return Mn, In, Dn

    M, Ii, Dd = step(1, ZERO, M0_gap, INFc, D0)
    for y in range(2, R + 1):
        M, Ii, Dd = step(y, M, M, Ii, Dd)
    out_ref[0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v8(tgtT, qualT, winT, opnT, extT, maskT, priorT, *,
                             pad=8, nuc_prior=DEFAULT_NUC_PRIOR,
                             interpret=False):
    """Production Pallas TPU scorer, kernel-layout API.

    Inputs are already transposed: tgtT/qualT (R, B); winT/opnT/extT/maskT/
    priorT (W, B); B a multiple of 128.  Host code should assemble arrays in
    this layout directly — the layout change plus in-kernel match costs
    removes the XLA pre-layout entirely (it used to cost as much as the
    wavefront itself).
    """
    R, B = tgtT.shape
    D = 2 * pad
    W = winT.shape[0]
    assert W == R + 2 * pad - 1, (W, R, pad)
    BLK = LANES
    assert B % BLK == 0, B
    preT = jnp.cumsum(jnp.asarray(extT, jnp.int32), axis=0)
    kernel = functools.partial(_pallas_kernel_v8, R=R, pad=pad, nuc_prior=nuc_prior)

    def tspec(L):
        return pl.BlockSpec((L, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BLK,),
        in_specs=[tspec(R), tspec(R), tspec(W), tspec(W), tspec(W), tspec(W),
                  tspec(W), tspec(W)],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * R * D * B, bytes_accessed=(2 * R + 6 * W) * B * 4,
            transcendentals=0),
    )(jnp.asarray(tgtT, jnp.int32), jnp.asarray(qualT, jnp.int32),
      jnp.asarray(winT, jnp.int32), jnp.asarray(opnT, jnp.int32),
      jnp.asarray(extT, jnp.int32), jnp.asarray(maskT, jnp.int32),
      jnp.asarray(priorT, jnp.int32), preT)
    return out[0]


def _pallas_kernel_v9(tgt_ref, qual_ref, win_ref, opn_ref, ext_ref, mask_ref,
                      prior_ref, pre_ref, out_ref, *, R, pad, nuc_prior):
    """v8 semantics with a fori_loop wavefront (compile-friendly).

    The unrolled v8 kernel emits ~40 ops per read row (R=160 -> thousands of
    Mosaic ops): ~3% faster steady-state but minutes of (re)compile per shape
    bucket, which dominates real runs whenever the compilation cache is cold.
    This variant trades that 3% for a ~2-op-count program that compiles in
    seconds; it is the production default.
    """
    D = 2 * pad
    B = out_ref.shape[1]

    def cm_at(y):
        t = tgt_ref[pl.ds(y - 1, 1), :]
        q = qual_ref[pl.ds(y - 1, 1), :]
        w = win_ref[pl.ds(y - 1, D), :]
        m = mask_ref[pl.ds(y - 1, D), :]
        p = prior_ref[pl.ds(y - 1, D), :]
        capped = jnp.where(m == t, jnp.minimum(q, p), q)
        pen = jnp.where(t == w, 0, capped)
        return jnp.where(w == N, jnp.minimum(pen, N_SCORE), pen)

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2) == 1
    ZERO = jnp.zeros((D, B), jnp.int32)
    INFc = jnp.full((D, B), INF, jnp.int32)
    M0_gap = jnp.where(d_odd, ZERO, INFc)
    opn0 = _shift_down(opn_ref[0:D, :], INF)
    pre0 = _shift_down(pre_ref[0:D, :], 0)
    bv0 = _shift_down(M0_gap, INF) + opn0
    D0 = _min_scan(bv0 - pre0, D) + pre0

    def step(y, M, M_for_gap, Ii, Dd):
        cm = cm_at(y)
        opn_win = opn_ref[pl.ds(y - 1, D), :]
        ext_win = ext_ref[pl.ds(y - 1, D), :]
        pre_win = pre_ref[pl.ds(y - 1, D), :]
        Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + opn_win,
            _shift_up(Ii, INF) + ext_win,
        )
        bv = _shift_down(jnp.minimum(Mn, In), INF) + opn_win
        Dn = _min_scan(bv - pre_win, D) + pre_win
        return Mn, In, Dn

    M, Ii, Dd = step(1, ZERO, M0_gap, INFc, D0)

    def body(y, st):
        M, Ii, Dd = st
        return step(y, M, M, Ii, Dd)

    M, Ii, Dd = jax.lax.fori_loop(2, R + 1, body, (M, Ii, Dd))
    out_ref[0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v9(tgtT, qualT, winT, opnT, extT, maskT, priorT, *,
                             pad=8, nuc_prior=DEFAULT_NUC_PRIOR,
                             interpret=False):
    """Looped-wavefront Pallas scorer, kernel-layout API (see v8 docstring).

    Inputs may arrive as int8 (all tracks are phred penalties <= 127, the
    reference's own penalty width, pair_hmm.hpp:68-70): they are widened to
    int32 on device, so host->device transfer is a quarter the bytes."""
    R, B = tgtT.shape
    D = 2 * pad
    W = winT.shape[0]
    assert W == R + 2 * pad - 1, (W, R, pad)
    BLK = LANES
    assert B % BLK == 0, B
    preT = jnp.cumsum(jnp.asarray(extT, jnp.int32), axis=0)
    kernel = functools.partial(_pallas_kernel_v9, R=R, pad=pad, nuc_prior=nuc_prior)

    def tspec(L):
        return pl.BlockSpec((L, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BLK,),
        in_specs=[tspec(R), tspec(R), tspec(W), tspec(W), tspec(W), tspec(W),
                  tspec(W), tspec(W)],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * R * D * B, bytes_accessed=(2 * R + 6 * W) * B * 4,
            transcendentals=0),
    )(jnp.asarray(tgtT, jnp.int32), jnp.asarray(qualT, jnp.int32),
      jnp.asarray(winT, jnp.int32), jnp.asarray(opnT, jnp.int32),
      jnp.asarray(extT, jnp.int32), jnp.asarray(maskT, jnp.int32),
      jnp.asarray(priorT, jnp.int32), preT)
    return out[0]


def _kernel_v12(*refs, R, pad, nuc_prior, K):
    """K INDEPENDENT wavefront chains per grid step (v9 semantics each).

    One chain is a serial dependency chain of (D, 128) vector ops; the VPU
    has co-issue slack, so interleaving K chains over K disjoint 128-lane
    pair groups raises throughput ~13% at K=4 (measured on v5e; flat by
    K=8).  Each track is passed K times with different BlockSpec index
    maps — lane-slicing one wide ref fails Mosaic legalisation."""
    in_refs = refs[:8 * K]
    out_refs = refs[8 * K:]
    D = 2 * pad

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, LANES), 0) % 2) == 1
    ZERO = jnp.zeros((D, LANES), jnp.int32)
    INFc = jnp.full((D, LANES), INF, jnp.int32)
    M0_gap = jnp.where(d_odd, ZERO, INFc)

    chains = []
    for g in range(K):
        (tgt_ref, qual_ref, win_ref, opn_ref, ext_ref, mask_ref, prior_ref,
         pre_ref) = in_refs[8 * g:8 * g + 8]

        def cm_at(y, tr=tgt_ref, qr=qual_ref, wr=win_ref, mr=mask_ref,
                  pr=prior_ref):
            t = tr[pl.ds(y - 1, 1), :]
            q = qr[pl.ds(y - 1, 1), :]
            w = wr[pl.ds(y - 1, D), :]
            m = mr[pl.ds(y - 1, D), :]
            p = pr[pl.ds(y - 1, D), :]
            capped = jnp.where(m == t, jnp.minimum(q, p), q)
            pen = jnp.where(t == w, 0, capped)
            return jnp.where(w == N, jnp.minimum(pen, N_SCORE), pen)

        def step(y, M, M_for_gap, Ii, Dd, cm_fn=cm_at, orf=opn_ref,
                 erf=ext_ref, prf=pre_ref):
            cm = cm_fn(y)
            opn_win = orf[pl.ds(y - 1, D), :]
            ext_win = erf[pl.ds(y - 1, D), :]
            pre_win = prf[pl.ds(y - 1, D), :]
            Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
            In = nuc_prior + jnp.minimum(
                _shift_up(M_for_gap, INF) + opn_win,
                _shift_up(Ii, INF) + ext_win,
            )
            bv = _shift_down(jnp.minimum(Mn, In), INF) + opn_win
            Dn = _min_scan(bv - pre_win, D) + pre_win
            return Mn, In, Dn

        opn0 = _shift_down(opn_ref[0:D, :], INF)
        pre0 = _shift_down(pre_ref[0:D, :], 0)
        bv0 = _shift_down(M0_gap, INF) + opn0
        D0 = _min_scan(bv0 - pre0, D) + pre0
        chains.append((step, step(1, ZERO, M0_gap, INFc, D0)))

    def body(y, st):
        return tuple(chains[g][0](y, M, M, Ii, Dd)
                     for g, (M, Ii, Dd) in enumerate(st))

    states = jax.lax.fori_loop(2, R + 1, body, tuple(s for _, s in chains))
    for g, (M, Ii, Dd) in enumerate(states):
        out_refs[g][0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd),
                                    axis=0)


V12_GROUPS = 4


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "interpret"))
def pairhmm_scores_pallas_v12(tgtT, qualT, winT, opnT, extT, maskT, priorT, *,
                              pad=8, nuc_prior=DEFAULT_NUC_PRIOR,
                              interpret=False):
    """Grouped-chain Pallas scorer, kernel-layout API (see _kernel_v12).

    B must be a multiple of LANES*V12_GROUPS (512); the production batch
    ladder's big rung (2048) satisfies this, small launches ride v9."""
    K = V12_GROUPS
    R, B = tgtT.shape
    D = 2 * pad
    W = winT.shape[0]
    assert W == R + 2 * pad - 1, (W, R, pad)
    assert B % (LANES * K) == 0, B
    preT = jnp.cumsum(jnp.asarray(extT, jnp.int32), axis=0)
    kernel = functools.partial(_kernel_v12, R=R, pad=pad,
                               nuc_prior=nuc_prior, K=K)
    tracks = [jnp.asarray(a, jnp.int32) for a in
              (tgtT, qualT, winT, opnT, extT, maskT, priorT, preT)]
    lens = [R, R, W, W, W, W, W, W]

    in_specs = []
    ins = []
    for g in range(K):
        for L, t in zip(lens, tracks):
            in_specs.append(pl.BlockSpec(
                (L, LANES), lambda i, g=g: (0, K * i + g),
                memory_space=pltpu.VMEM))
            ins.append(t)
    out_specs = tuple(
        pl.BlockSpec((1, LANES), lambda i, g=g: (0, K * i + g),
                     memory_space=pltpu.VMEM) for g in range(K))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((1, B), jnp.int32)
                        for _ in range(K)),
        grid=(B // (LANES * K),),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * R * D * B, bytes_accessed=(2 * R + 6 * W) * B * 4,
            transcendentals=0),
    )(*ins)
    # chain g wrote lane blocks K*i+g of output g; merge the K outputs
    merged = jnp.zeros((B,), jnp.int32)
    for g in range(K):
        o = outs[g][0].reshape(-1, LANES)
        sel = (jnp.arange(o.shape[0]) % K) == g
        merged = merged + jnp.where(sel[:, None], o, 0).reshape(-1)
    return merged


def _pallas_fn_for(B: int):
    """v12 (grouped chains) when the batch divides its block, else v9.
    OCTOPUS_TPU_KERNEL=v9 forces the single-chain kernel."""
    if os.environ.get("OCTOPUS_TPU_KERNEL", "").lower() == "v9":
        return pairhmm_scores_pallas_v9
    if B % (LANES * V12_GROUPS) == 0:
        return pairhmm_scores_pallas_v12
    return pairhmm_scores_pallas_v9


@functools.lru_cache(maxsize=None)
def _data_mesh(n_devices: int):
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:n_devices]), ("data",))


def _shardable_devices(B: int, platform: str) -> int:
    """How many devices one launch can shard over (1 = run single-device).

    The pair batch is embarrassingly parallel over its batch axis: shard it
    whenever every device gets a whole number of kernel blocks (TPU) or
    pairs (elsewhere). Disable with OCTOPUS_TPU_NO_SHARD=1."""
    if os.environ.get("OCTOPUS_TPU_NO_SHARD") == "1":
        return 1
    n = jax.device_count()
    if n <= 1:
        return 1
    quantum = LANES if platform == "tpu" else 1
    while n > 1 and B % (quantum * n):
        n -= 1
    return n


def _pairhmm_scores_sharded(n_dev, tgt, qual, win, opn, ext, mask, prior,
                            *, pad, nuc_prior, use_pallas):
    """Data-parallel pair-HMM over a 1-D device mesh (SURVEY section 2.15
    TPU-equivalents): pure batch sharding, no collectives — the host gather
    is the only sync point."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = _data_mesh(n_dev)
    if use_pallas:
        args = [np.ascontiguousarray(
                    np.minimum(np.asarray(a, np.int32), 127).astype(np.int8).T)
                for a in (tgt, qual, win, opn, ext, mask, prior)]

        def local(*ts):
            return _pallas_fn_for(ts[0].shape[1])(*ts, pad=pad,
                                                  nuc_prior=nuc_prior)

        spec = P(None, "data")       # kernel layout: batch minor
        fn = shard_map(local, mesh=mesh, in_specs=(spec,) * 7,
                       out_specs=P("data"))
        return fn(*args)

    def local(*bs):
        ts = [jnp.asarray(a, jnp.int32).T for a in bs]
        return _hmm_rows(*ts, pad, nuc_prior)

    spec = P("data")
    fn = shard_map(local, mesh=mesh, in_specs=(spec,) * 7,
                   out_specs=spec)
    return jax.jit(fn)(tgt, qual, win, opn, ext, mask, prior)


def pairhmm_scores(tgt, qual, win, opn, ext, mask, prior, *, pad=8,
                   nuc_prior=DEFAULT_NUC_PRIOR):
    """Dispatch: Pallas v8 on TPU, XLA elsewhere (batch-major inputs),
    sharded over all local devices when the batch divides evenly.

    On the TPU path the transpose to kernel layout happens on the host (the
    arrays are numpy; `.T` views are materialised during staging), never on
    device.  Set OCTOPUS_TPU_FORCE_XLA=1 to force the portable path.
    """
    platform = jax.default_backend()
    n_dev = _shardable_devices(tgt.shape[0], platform)
    if n_dev > 1:
        use_pallas = (platform == "tpu"
                      and os.environ.get("OCTOPUS_TPU_FORCE_XLA") != "1"
                      and os.environ.get("OCTOPUS_TPU_UNROLLED_HMM") != "1")
        return _pairhmm_scores_sharded(
            n_dev, tgt, qual, win, opn, ext, mask, prior,
            pad=pad, nuc_prior=nuc_prior, use_pallas=use_pallas)
    # the pallas kernels keep whole (R, LANES) read tracks plus ~5 (W, LANES)
    # window tracks in VMEM with pipeline double-buffering; past ~1 kb reads
    # that exceeds the 16 MB scoped-vmem budget, so long-read batches ride
    # the XLA wavefront path instead (no VMEM ceiling)
    # measured: R=512 with the K=4 grouped v12 launch allocates 16.38 MB
    # scoped vmem vs the 16 MB limit (compile OOM); 384 leaves headroom
    max_pallas_len = int(os.environ.get("OCTOPUS_TPU_MAX_PALLAS_READ_LEN",
                                        384))
    if (platform == "tpu" and tgt.shape[0] % LANES == 0
            and tgt.shape[1] <= max_pallas_len
            and os.environ.get("OCTOPUS_TPU_FORCE_XLA") != "1"):
        if os.environ.get("OCTOPUS_TPU_UNROLLED_HMM") == "1":
            args = [np.ascontiguousarray(np.asarray(a, np.int32).T)
                    for a in (tgt, qual, win, opn, ext, mask, prior)]
            return pairhmm_scores_pallas_v8(*args, pad=pad, nuc_prior=nuc_prior)
        # int8 transfer: every track is a base code or a phred penalty; the
        # reference kernel itself stores penalties as int8
        args = [np.ascontiguousarray(
                    np.minimum(np.asarray(a, np.int32), 127).astype(np.int8).T)
                for a in (tgt, qual, win, opn, ext, mask, prior)]
        fn = _pallas_fn_for(args[0].shape[1])
        return fn(*args, pad=pad, nuc_prior=nuc_prior)
    return pairhmm_scores_xla(tgt, qual, win, opn, ext, mask, prior,
                              pad=pad, nuc_prior=nuc_prior)


__all__ = [
    "pairhmm_scores",
    "pairhmm_scores_xla",
    "pairhmm_scores_pallas_v2",
    "pairhmm_scores_pallas_v8",
    "pairhmm_scores_pallas_v9",
    "pairhmm_scores_pallas_v12",
    "PAD_CODE",
    "LANES",
    "INF",
]
