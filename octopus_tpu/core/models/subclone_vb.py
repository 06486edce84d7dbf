"""Variational-Bayes Dirichlet mixture engine + subclone model.

Capability-equivalent to the reference's VB machinery
(src/core/models/genotype/variational_bayes_mixture_model.hpp:95-650) and
SubcloneModel (subclone_model.hpp:29-104): a genotype is a K-tuple of
haplotypes with unknown per-sample mixture weights; coordinate-ascent VB
infers read responsibilities (N x K) and Dirichlet weight posteriors, with
multi-seed restarts combined by evidence.

TPU design: the coordinate ascent is a jitted lax.fori_loop over iterations
with digamma via jax.scipy.special; seeds and candidate genotypes batch
through vmap, so one device launch scores every (genotype, seed) pair.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import digamma, gammaln

from .individual import logsumexp


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _vb_single(lnl_kn, alpha0, resp_init, n_iter=50, mask_n=None):
    """One VB run. lnl_kn: (K, N); alpha0/resp_init: (K,), (K, N).

    mask_n (N,) float 1/0 marks real reads: padded read rows contribute
    nothing to responsibilities sums or the ELBO, so data-dependent read
    counts can be bucketed to a fixed N without changing results.

    All (K, N) intermediates keep the large read axis minor: on TPU the
    minor-most dim tiles to 128 lanes, so a K-minor layout would pad the
    tiny component axis 3->128 (a ~40x HBM blow-up under the (G, S) vmaps)
    while N-minor pads K only 3->8 sublanes.

    Returns (elbo, alpha, responsibilities (K, N))."""
    K, N = lnl_kn.shape
    if mask_n is None:
        mask_n = jnp.ones(N, jnp.float32)

    def step(_, state):
        resp, alpha = state
        e_ln_w = digamma(alpha) - digamma(alpha.sum())
        logits = e_ln_w[:, None] + lnl_kn              # (K, N)
        resp = jax.nn.softmax(logits, axis=0) * mask_n[None, :]
        alpha = alpha0 + resp.sum(axis=1)
        return resp, alpha

    resp_init = resp_init * mask_n[None, :]
    resp, alpha = jax.lax.fori_loop(0, n_iter, step, (resp_init, alpha0 + resp_init.sum(axis=1)))
    e_ln_w = digamma(alpha) - digamma(alpha.sum())
    # ELBO
    ll_term = jnp.sum(resp * lnl_kn)
    z_prior = jnp.sum(resp * e_ln_w[:, None])
    z_entropy = -jnp.sum(resp * jnp.log(jnp.clip(resp, 1e-30)))
    w_prior = (gammaln(alpha0.sum()) - gammaln(alpha0).sum()
               + jnp.sum((alpha0 - 1) * e_ln_w))
    w_entropy = -(gammaln(alpha.sum()) - gammaln(alpha).sum()
                  + jnp.sum((alpha - 1) * e_ln_w))
    elbo = ll_term + z_prior + z_entropy + w_prior + w_entropy
    return elbo, alpha, resp


def warm_vb(max_reads: int = 512, ks=(2, 3), seeds_iters=((2, 40), (3, 50)),
            max_g: int = 64) -> None:
    """Pre-compile the VB executable ladder (the warm_kernels() analogue
    for the mixture models): one evaluate per (K, Np rung, G edge) over the
    (n_seeds, n_iter) configs the callers actually construct
    (cancer.py:130 SubcloneModel(2, 40), polyclone.py:63 (3, 50)).
    Deterministic startup cost instead of first-window compile stalls; a
    no-op when executables are already cached."""
    ladder = [32]
    while ladder[-1] < max_reads:
        ladder.append(ladder[-1] * 4)
    g_rungs = [1]
    while g_rungs[-1] < max_g:
        g_rungs.append(g_rungs[-1] * 4)
    for n_seeds, n_iter in seeds_iters:
        model = SubcloneModel(n_seeds=n_seeds, n_iter=n_iter)
        for K in ks:
            for Np in ladder:
                lnL = np.zeros((1, Np), np.float32)
                for g in g_rungs:
                    model.evaluate(np.zeros((g, K), np.int64), lnL)


@dataclass
class SubcloneInference:
    genotype_log_evidences: np.ndarray   # (G,) approximate ln evidence
    genotype_posteriors: np.ndarray      # (G,)
    map_alphas: np.ndarray               # (G, K) weight posteriors
    log_evidence: float                  # ln sum over genotypes + priors


class SubcloneModel:
    """Dirichlet-mixture-of-haplotypes model over candidate K-tuples."""

    def __init__(self, prior_model=None, alpha0: float = 1.0, n_seeds: int = 3,
                 n_iter: int = 50):
        self.prior_model = prior_model
        self.alpha0 = alpha0
        self.n_seeds = n_seeds
        self.n_iter = n_iter

    def evaluate(self, tuples: np.ndarray, lnL: np.ndarray,
                 alpha0_vec: np.ndarray | None = None,
                 log_priors: np.ndarray | None = None) -> SubcloneInference:
        """tuples: (G, K) haplotype index tuples; lnL: (H, N)."""
        G, K = tuples.shape
        N = lnL.shape[1]
        if alpha0_vec is None:
            alpha0_vec = np.full(K, self.alpha0, np.float32)
        # bucket the data-dependent dims (reads via an exact mask, genotype
        # rows are independent under vmap) so every region reuses a small
        # set of compiled programs instead of recompiling per (G, N); the
        # genotype axis runs in fixed-size chunks so device memory stays
        # bounded regardless of how many candidate tuples a region proposes.
        # The ladders are powers of FOUR (32,128,512,... reads and 1,4,16,...
        # genotype rows): a power-of-two ladder compiled ~40 distinct
        # (Gp, K, Np) programs over a cancer run (the round-3 cold-wall tax,
        # BASELINE.md) for a compute kernel cheap enough that 4x padding
        # waste is immaterial; the reference has no analogous cost because
        # its VB is interpreted C++ (variational_bayes_mixture_model.hpp)
        Np = 32
        while Np < N:
            Np *= 4
        # ~256 MB fp32 working-set budget for (Gc, S, K, Np) intermediates,
        # counted in PADDED elements: K rounds up to 8 sublanes, Np (minor)
        # to 128 lanes; --target-working-memory overrides via the env seam
        # (option_parser.cpp:130-136 'not strictly enforced')
        budget_elems = int(os.environ.get("OCTOPUS_TPU_VB_BUDGET_ELEMS",
                                          64_000_000))
        k_pad = ((K + 7) // 8) * 8
        np_pad = ((Np + 127) // 128) * 128
        # small problems run on the in-process CPU backend: the VB loop is
        # a few MFLOPs, far below one device dispatch round trip (the same
        # size gate as the pair-HMM host path; ~0.1 ms on production hosts,
        # ~30-80 ms through this dev box's tunnel)
        small = (G * self.n_seeds * k_pad * np_pad
                 < int(os.environ.get("OCTOPUS_TPU_VB_DEVICE_MIN", 8_000_000)))
        import contextlib
        device_ctx = (jax.default_device(jax.devices("cpu")[0])
                      if small and jax.default_backend() != "cpu"
                      else contextlib.nullcontext())
        with device_ctx:
            return self._evaluate_inner(tuples, lnL, alpha0_vec, log_priors,
                                        G, K, N, Np, Gp_budget=(budget_elems,
                                                                k_pad, np_pad))

    def _evaluate_inner(self, tuples, lnL, alpha0_vec, log_priors,
                        G, K, N, Np, Gp_budget):
        budget_elems, k_pad, np_pad = Gp_budget
        gchunk = max(1, budget_elems // max(self.n_seeds * np_pad * (k_pad + 2), 1))
        gp_cap = 1
        while gp_cap * 4 <= gchunk:
            gp_cap *= 4
        Gp = 1                      # round G UP to the ladder (one launch
        while Gp < min(G, gp_cap):  # for small G), bounded by the budget
            Gp *= 4
        lnL_pad = np.zeros((lnL.shape[0], Np), np.float32)
        lnL_pad[:, :N] = lnL
        mask = np.zeros(Np, np.float32)
        mask[:N] = 1.0
        # seeds: uniform + one-hot biased responsibility inits
        rng = np.random.default_rng(0)
        seeds = [np.full((K, Np), 1.0 / K, np.float32)]
        for s in range(self.n_seeds - 1):
            r = rng.dirichlet(np.ones(K), size=Np).astype(np.float32).T
            seeds.append(r)
        seeds = jnp.asarray(np.stack(seeds))                              # (S, K, Np)
        a0 = jnp.asarray(alpha0_vec, jnp.float32)
        mask_j = jnp.asarray(mask)

        run = jax.vmap(jax.vmap(
            lambda lnl, r0: _vb_single(lnl, a0, r0, n_iter=self.n_iter,
                                       mask_n=mask_j),
            in_axes=(None, 0)), in_axes=(0, None))
        elbo_parts = []
        alpha_parts = []
        for lo in range(0, G, Gp):
            hi = min(lo + Gp, G)
            chunk = tuples[lo:hi]
            if hi - lo < Gp:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:1], Gp - (hi - lo), axis=0)])
            # gather on the HOST: a device gather's executable is keyed by
            # the unbounded haplotype count H, so it recompiled per region
            # (the residual cancer cold-wall compiles, BASELINE round 4);
            # numpy indexing produces the same ladder-shaped (Gp, K, Np)
            # input with no compile at all
            lnl_gkn = jnp.asarray(lnL_pad[chunk])                         # (Gp, K, Np)
            e, al, _ = run(lnl_gkn, seeds)                                # (Gp, S), (Gp, S, K)
            elbo_parts.append(np.asarray(e, np.float64)[:hi - lo])
            alpha_parts.append(np.asarray(al)[:hi - lo])
        elbos = np.concatenate(elbo_parts)
        alphas = np.concatenate(alpha_parts)
        best_seed = np.argmax(elbos, axis=1)
        gle = elbos[np.arange(G), best_seed]
        map_alphas = np.asarray(alphas)[np.arange(G), best_seed]
        if log_priors is None and self.prior_model is not None:
            log_priors = self.prior_model.evaluate_many(tuples)
        if log_priors is None:
            log_priors = np.zeros(G)
        joint = gle + log_priors
        log_evidence = logsumexp(joint)
        post = np.exp(joint - log_evidence)
        return SubcloneInference(
            genotype_log_evidences=gle,
            genotype_posteriors=post,
            map_alphas=map_alphas,
            log_evidence=log_evidence,
        )


__all__ = ["SubcloneModel", "SubcloneInference"]
