"""v11 candidate: sliding REGISTER window tracks.

Diagnosis from v10: adding precomputed tracks (more loads, fewer ALU ops)
made the kernel SLOWER -> it is load-bound.  v9 re-loads each (D,B)
window slice every row although consecutive rows overlap in D-1 of D
sublanes.  v11 keeps all six window-side tracks in carried registers and
slides them: one (1,B) row load + one concat per track per row, ~16x less
VMEM read traffic.  Otherwise the op structure is exactly v9 (parity)."""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from octopus_tpu.core.likelihood.pairhmm_batch import (
    INF, N_SCORE, _shift_down, _shift_up, _min_scan,
    pairhmm_scores_pallas_v9)
from octopus_tpu.basics.sequence import N

R = 150
PAD = 8
LANES = 128


def _slide(a, new_row):
    """Drop row 0, append the freshly loaded row at the bottom."""
    return jnp.concatenate([a[1:], new_row], axis=0)


def _kernel_v11(tgt_ref, qual_ref, win_ref, opn_ref, ext_ref, mask_ref,
                prior_ref, pre_ref, out_ref, *, R, pad, nuc_prior):
    D = 2 * pad
    B = out_ref.shape[1]

    d_odd = (jax.lax.broadcasted_iota(jnp.int32, (D, B), 0) % 2) == 1
    ZERO = jnp.zeros((D, B), jnp.int32)
    INFc = jnp.full((D, B), INF, jnp.int32)
    M0_gap = jnp.where(d_odd, ZERO, INFc)

    # initial register windows: rows 0..D-1 (for y=1)
    w_w = win_ref[0:D, :]
    w_m = mask_ref[0:D, :]
    w_p = prior_ref[0:D, :]
    w_o = opn_ref[0:D, :]
    w_e = ext_ref[0:D, :]
    w_pre = pre_ref[0:D, :]

    opn0 = _shift_down(w_o, INF)
    pre0 = _shift_down(w_pre, 0)
    bv0 = _shift_down(M0_gap, INF) + opn0
    D0 = _min_scan(bv0 - pre0, D) + pre0

    def cm_from(y, w, m, p):
        t = tgt_ref[pl.ds(y - 1, 1), :]
        q = qual_ref[pl.ds(y - 1, 1), :]
        capped = jnp.where(m == t, jnp.minimum(q, p), q)
        pen = jnp.where(t == w, 0, capped)
        return jnp.where(w == N, jnp.minimum(pen, N_SCORE), pen)

    def step(y, M, M_for_gap, Ii, Dd, w, m, p, o, e, pre):
        cm = cm_from(y, w, m, p)
        Mn = cm + jnp.minimum(jnp.minimum(M, Ii), Dd)
        In = nuc_prior + jnp.minimum(
            _shift_up(M_for_gap, INF) + o,
            _shift_up(Ii, INF) + e,
        )
        bv = _shift_down(jnp.minimum(Mn, In), INF) + o
        Dn = _min_scan(bv - pre, D) + pre
        return Mn, In, Dn

    M, Ii, Dd = step(1, ZERO, M0_gap, INFc, D0, w_w, w_m, w_p, w_o, w_e, w_pre)

    def body(y, st):
        M, Ii, Dd, w, m, p, o, e, pre = st
        # slide the windows to row y's view before computing
        off = y - 1 + D - 1
        w = _slide(w, win_ref[pl.ds(off, 1), :])
        m = _slide(m, mask_ref[pl.ds(off, 1), :])
        p = _slide(p, prior_ref[pl.ds(off, 1), :])
        o = _slide(o, opn_ref[pl.ds(off, 1), :])
        e = _slide(e, ext_ref[pl.ds(off, 1), :])
        pre = _slide(pre, pre_ref[pl.ds(off, 1), :])
        M, Ii, Dd = step(y, M, M, Ii, Dd, w, m, p, o, e, pre)
        return M, Ii, Dd, w, m, p, o, e, pre

    M, Ii, Dd, *_ = jax.lax.fori_loop(
        2, R + 1, body, (M, Ii, Dd, w_w, w_m, w_p, w_o, w_e, w_pre))
    out_ref[0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd), axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "blk"))
def scores_v11(tgtT, qualT, winT, opnT, extT, maskT, priorT, *, pad=8,
               nuc_prior=2, blk=1):
    R, B = tgtT.shape
    D = 2 * pad
    W = winT.shape[0]
    BLK = LANES * blk
    assert B % BLK == 0
    preT = jnp.cumsum(jnp.asarray(extT, jnp.int32), axis=0)
    kernel = functools.partial(_kernel_v11, R=R, pad=pad,
                               nuc_prior=nuc_prior)

    def tspec(L):
        return pl.BlockSpec((L, BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BLK,),
        in_specs=[tspec(R), tspec(R), tspec(W), tspec(W), tspec(W), tspec(W),
                  tspec(W), tspec(W)],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=30 * R * D * B, bytes_accessed=(2 * R + 6 * W) * B * 4,
            transcendentals=0),
    )(jnp.asarray(tgtT, jnp.int32), jnp.asarray(qualT, jnp.int32),
      jnp.asarray(winT, jnp.int32), jnp.asarray(opnT, jnp.int32),
      jnp.asarray(extT, jnp.int32), jnp.asarray(maskT, jnp.int32),
      jnp.asarray(priorT, jnp.int32), preT)
    return out[0]


def bench(fn_name, fn, B=65536, **kw):
    W = R + 2 * PAD - 1

    @functools.partial(jax.jit, static_argnames=("Kreps",))
    def step(key, Kreps):
        def one(carry, k):
            ks = jax.random.split(jax.random.fold_in(key, k), 7)
            tgt = jax.random.randint(ks[0], (R, B), 0, 4, jnp.int32)
            qual = jax.random.randint(ks[1], (R, B), 10, 40, jnp.int32)
            win = jax.random.randint(ks[2], (W, B), 0, 5, jnp.int32)
            opn = jax.random.randint(ks[3], (W, B), 10, 50, jnp.int32)
            ext = jax.random.randint(ks[4], (W, B), 1, 8, jnp.int32)
            mask = jax.random.randint(ks[5], (W, B), 0, 4, jnp.int32)
            prior = jax.random.randint(ks[6], (W, B), 3, 40, jnp.int32)
            s = fn(tgt, qual, win, opn, ext, mask, prior, pad=PAD, **kw)
            return carry + jnp.sum(s), None
        total, _ = jax.lax.scan(one, jnp.int32(0),
                                jnp.arange(Kreps, dtype=jnp.int32))
        return total

    times = {}
    for Kreps in (1, 9):
        t0 = time.time()
        float(step(jax.random.PRNGKey(0), Kreps))
        compile_t = time.time() - t0
        best = float("inf")
        for i in range(6):
            t0 = time.time()
            float(step(jax.random.PRNGKey(i), Kreps))
            best = min(best, time.time() - t0)
        times[Kreps] = best
    per_batch = (times[9] - times[1]) / 8.0
    print(f"{fn_name}: {B/per_batch/1e6:.2f} M pairs/s marginal "
          f"(times {times}, compile {compile_t:.0f}s)", flush=True)
    return B / per_batch


def check_parity():
    import numpy as np
    rng = np.random.default_rng(0)
    B = 1024
    W = R + 2 * PAD - 1
    tgt = rng.integers(0, 4, (R, B)).astype(np.int32)
    qual = rng.integers(10, 40, (R, B)).astype(np.int32)
    win = rng.integers(0, 5, (W, B)).astype(np.int32)
    opn = rng.integers(10, 50, (W, B)).astype(np.int32)
    ext = rng.integers(1, 8, (W, B)).astype(np.int32)
    mask = rng.integers(0, 4, (W, B)).astype(np.int32)
    prior = rng.integers(3, 40, (W, B)).astype(np.int32)
    a = np.asarray(pairhmm_scores_pallas_v9(tgt, qual, win, opn, ext, mask, prior, pad=PAD))
    b = np.asarray(scores_v11(tgt, qual, win, opn, ext, mask, prior, pad=PAD))
    assert np.array_equal(a, b), (np.flatnonzero(a != b)[:5], a[:8], b[:8])
    print("parity v11 OK", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
    check_parity()
    bench("v11 blk=1", scores_v11, blk=1)
    bench("v11 blk=2", scores_v11, blk=2)
