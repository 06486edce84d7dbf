"""v13 probe: v12 (K=4 chains) with TWO rows per fori_loop iteration.

The fori_loop body costs scalar bookkeeping per iteration (offset
arithmetic, loop branch); v8-vs-v9 put that at ~8%.  Processing two rows
per iteration halves it without v8's minutes-long full unroll."""
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
    INF, N_SCORE, _shift_down, _shift_up, _min_scan, LANES,
    pairhmm_scores_pallas_v9, pairhmm_scores_pallas_v12)
from octopus_tpu.basics.sequence import N

R = 150
PAD = 8


def _kernel_v13(*refs, R, pad, nuc_prior, K):
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
        st = step(1, ZERO, M0_gap, INFc, D0)
        st = step(2, st[0], st[0], st[1], st[2])
        chains.append((step, st))

    # rows 3..R in pairs (R odd -> one tail row after the loop)
    n_pairs = (R - 2) // 2

    def body(i, st):
        y = 3 + 2 * i
        out = []
        for g, (M, Ii, Dd) in enumerate(st):
            stp = chains[g][0]
            M, Ii, Dd = stp(y, M, M, Ii, Dd)
            M, Ii, Dd = stp(y + 1, M, M, Ii, Dd)
            out.append((M, Ii, Dd))
        return tuple(out)

    states = jax.lax.fori_loop(0, n_pairs, body,
                               tuple(s for _, s in chains))
    states = list(states)
    if (R - 2) % 2:
        for g, (M, Ii, Dd) in enumerate(states):
            states[g] = chains[g][0](R, M, M, Ii, Dd)
    for g, (M, Ii, Dd) in enumerate(states):
        out_refs[g][0, :] = jnp.min(jnp.minimum(jnp.minimum(M, Ii), Dd),
                                    axis=0)


@functools.partial(jax.jit, static_argnames=("pad", "nuc_prior", "K"))
def scores_v13(tgtT, qualT, winT, opnT, extT, maskT, priorT, *, pad=8,
               nuc_prior=2, K=4):
    R, B = tgtT.shape
    D = 2 * pad
    W = winT.shape[0]
    assert B % (LANES * K) == 0
    preT = jnp.cumsum(jnp.asarray(extT, jnp.int32), axis=0)
    kernel = functools.partial(_kernel_v13, R=R, pad=pad,
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
        cost_estimate=pl.CostEstimate(
            flops=30 * R * D * B, bytes_accessed=(2 * R + 6 * W) * B * 4,
            transcendentals=0),
    )(*ins)
    merged = jnp.zeros((B,), jnp.int32)
    for g in range(K):
        o = outs[g][0].reshape(-1, LANES)
        sel = (jnp.arange(o.shape[0]) % K) == g
        merged = merged + jnp.where(sel[:, None], o, 0).reshape(-1)
    return merged


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
          f"(compile {compile_t:.0f}s)", flush=True)
    return B / per_batch


def check_parity():
    import numpy as np
    rng = np.random.default_rng(0)
    B = 1024
    W = R + 2 * PAD - 1
    args = (rng.integers(0, 4, (R, B)).astype(np.int32),
            rng.integers(10, 40, (R, B)).astype(np.int32),
            rng.integers(0, 5, (W, B)).astype(np.int32),
            rng.integers(10, 50, (W, B)).astype(np.int32),
            rng.integers(1, 8, (W, B)).astype(np.int32),
            rng.integers(0, 4, (W, B)).astype(np.int32),
            rng.integers(3, 40, (W, B)).astype(np.int32))
    a = np.asarray(pairhmm_scores_pallas_v9(*args, pad=PAD))
    b = np.asarray(scores_v13(*args, pad=PAD, K=4))
    assert np.array_equal(a, b), (np.flatnonzero(a != b)[:5])
    print("parity v13 OK", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
    check_parity()
    bench("v12 K=4  ", pairhmm_scores_pallas_v12)
    bench("v13 K=4x2", scores_v13, K=4)
    bench("v13 K=6x2", scores_v13, K=6)
