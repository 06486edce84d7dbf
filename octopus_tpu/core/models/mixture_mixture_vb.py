"""Two-level Dirichlet mixture VB: clones x haplotypes.

Capability-equivalent to the reference's VariationalBayesMixtureMixtureModel
(src/core/models/genotype/variational_bayes_mixture_mixture_model.{hpp,cpp}),
the engine behind SingleCellModel: each cell belongs to one of C clones
(mixture weights pi ~ Dirichlet(beta0), the phylogeny concentration), and a
clone's reads mix over the haplotypes of its genotype
(w_c ~ Dirichlet(alpha0), the dropout concentration).

Coordinate ascent (CAVI):
  read responsibilities    rho[n,c,m,r] ∝ exp(E ln w_cm) exp(lnL_n[m,r])
  cell responsibilities    tau[n,c]     ∝ exp(E ln pi_c + sum_r E-step score)
  Dirichlet updates        alpha_cm = alpha0 + sum_n tau_nc sum_r rho_ncmr
                           beta_c   = beta0 + sum_n tau_nc

TPU design: one jitted CAVI over fixed-shape padded tensors
(cells, clones, members, reads) with member/read masks; vmapped seeds.
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

_NEG = -1e30


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _mmvb_single(lnl, member_mask, read_mask, alpha0, beta0, tau_init, n_iter=60):
    """One CAVI run.

    lnl: (N, C, M, R) member log-likelihoods per cell/clone (padded);
    member_mask: (C, M) 1 for real members; read_mask: (N, R);
    alpha0: scalar; beta0: (C,); tau_init: (N, C).
    Returns (elbo, tau, alpha, beta).
    """
    N, C, M, R = lnl.shape
    mm = member_mask[None, :, :, None]                       # (1, C, M, 1)
    rm = read_mask[:, None, None, :]                         # (N, 1, 1, R)
    lnl_m = jnp.where(mm > 0, lnl, _NEG)

    def step(_, state):
        tau, alpha, beta = state
        e_ln_w = digamma(alpha) - digamma(alpha.sum(axis=1, keepdims=True))  # (C, M)
        e_ln_w = jnp.where(member_mask > 0, e_ln_w, _NEG)
        logits = e_ln_w[None, :, :, None] + lnl_m            # (N, C, M, R)
        rho = jax.nn.softmax(logits, axis=2)
        rho = rho * rm
        # expected per-read data term under rho
        read_score = jnp.sum(rho * (lnl_m + e_ln_w[None, :, :, None]), axis=2)
        read_ent = -jnp.sum(rho * jnp.log(jnp.clip(rho, 1e-30)), axis=2) * read_mask[:, None, :]
        cell_score = jnp.sum((read_score + read_ent) * read_mask[:, None, :], axis=2)  # (N, C)
        e_ln_pi = digamma(beta) - digamma(beta.sum())
        tau = jax.nn.softmax(e_ln_pi[None, :] + cell_score, axis=1)
        alpha = alpha0 + jnp.einsum("nc,ncmr->cm", tau, rho) * member_mask
        beta = beta0 + tau.sum(axis=0)
        return tau, alpha, beta

    alpha_init = alpha0 * member_mask + (1 - member_mask)
    state = (tau_init, alpha_init, beta0 + tau_init.sum(axis=0))
    tau, alpha, beta = jax.lax.fori_loop(0, n_iter, step, state)

    # ELBO at the fixed point
    e_ln_w = jnp.where(member_mask > 0,
                       digamma(alpha) - digamma(alpha.sum(axis=1, keepdims=True)), 0.0)
    e_ln_w_b = jnp.where(member_mask > 0, e_ln_w, _NEG)
    logits = e_ln_w_b[None, :, :, None] + lnl_m
    rho = jax.nn.softmax(logits, axis=2) * rm
    read_ll = jnp.sum(rho * jnp.where(mm > 0, lnl, 0.0), axis=2)
    read_prior = jnp.sum(rho * jnp.where(mm > 0, e_ln_w[None, :, :, None], 0.0), axis=2)
    read_ent = -jnp.sum(rho * jnp.log(jnp.clip(rho, 1e-30)), axis=2)
    cell_score = jnp.sum((read_ll + read_prior + read_ent)
                         * read_mask[:, None, :], axis=2)    # (N, C)
    e_ln_pi = digamma(beta) - digamma(beta.sum())
    ll_term = jnp.sum(tau * cell_score)
    z_prior = jnp.sum(tau * e_ln_pi[None, :])
    z_ent = -jnp.sum(tau * jnp.log(jnp.clip(tau, 1e-30)))
    nm = member_mask.sum(axis=1)
    w_prior = jnp.sum(gammaln(alpha0 * nm) - nm * gammaln(alpha0)
                      + jnp.sum((alpha0 - 1) * e_ln_w * member_mask, axis=1))
    w_ent = -jnp.sum(gammaln(jnp.sum(alpha * member_mask, axis=1))
                     - jnp.sum(gammaln(jnp.where(member_mask > 0, alpha, 1.0))
                               * member_mask, axis=1)
                     + jnp.sum((alpha - 1) * e_ln_w * member_mask, axis=1))
    pi_prior = (gammaln(beta0.sum()) - gammaln(beta0).sum()
                + jnp.sum((beta0 - 1) * e_ln_pi))
    pi_ent = -(gammaln(beta.sum()) - gammaln(beta).sum()
               + jnp.sum((beta - 1) * e_ln_pi))
    elbo = ll_term + z_prior + z_ent + w_prior + w_ent + pi_prior + pi_ent
    return elbo, tau, alpha, beta


@dataclass
class MixtureMixtureInference:
    log_evidence: float
    cell_responsibilities: np.ndarray    # (N, C)
    map_assignments: np.ndarray          # (N,)
    alphas: np.ndarray                   # (C, M)


class VariationalBayesMixtureMixtureModel:
    """Clone-mixture-of-haplotype-mixtures over per-cell likelihoods."""

    def __init__(self, alpha0: float = 5.0, beta0: float = 20.0,
                 n_seeds: int = 3, n_iter: int = 60):
        self.alpha0 = alpha0     # dropout concentration
        self.beta0 = beta0       # phylogeny concentration
        self.n_seeds = n_seeds
        self.n_iter = n_iter

    def evaluate(self, lnL_by_cell: list[np.ndarray],
                 clone_members: list[list[int]]) -> MixtureMixtureInference:
        """lnL_by_cell: per cell (H, R_n); clone_members: per clone the
        haplotype indices of its genotype."""
        N = len(lnL_by_cell)
        C = len(clone_members)
        M = max(len(m) for m in clone_members)
        R = max((l.shape[1] for l in lnL_by_cell), default=1) or 1
        # bucket the read axis to the power-of-4 ladder (32,128,512,...):
        # read_mask zeroes the padding exactly, so results are unchanged and
        # the compiled-executable set stays closed (same discipline as
        # subclone_vb.py; the round-3 cancer cold wall was per-shape compiles)
        Rp = 32
        while Rp < R:
            Rp *= 4
        R = Rp
        lnl = np.zeros((N, C, M, R), np.float32)
        read_mask = np.zeros((N, R), np.float32)
        member_mask = np.zeros((C, M), np.float32)
        for c, members in enumerate(clone_members):
            member_mask[c, :len(members)] = 1.0
        for n, l in enumerate(lnL_by_cell):
            r = l.shape[1]
            read_mask[n, :r] = 1.0
            for c, members in enumerate(clone_members):
                for m, h in enumerate(members):
                    lnl[n, c, m, :r] = l[h]
        rng = np.random.default_rng(0)
        taus = [np.full((N, C), 1.0 / C, np.float32)]
        for _ in range(self.n_seeds - 1):
            taus.append(rng.dirichlet(np.ones(C), size=N).astype(np.float32))
        beta0 = np.full(C, self.beta0 / C, np.float32)
        # small problems run on the in-process CPU backend — the two-level
        # VB is a few MFLOPs, far below one device dispatch round trip
        # (same gate as subclone_vb.py / the pair-HMM host path)
        import contextlib
        small = (self.n_seeds * N * C * M * R
                 < int(os.environ.get("OCTOPUS_TPU_VB_DEVICE_MIN", 8_000_000)))
        device_ctx = (jax.default_device(jax.devices("cpu")[0])
                      if small and jax.default_backend() != "cpu"
                      else contextlib.nullcontext())
        with device_ctx:
            run = jax.vmap(lambda t: _mmvb_single(
                jnp.asarray(lnl), jnp.asarray(member_mask), jnp.asarray(read_mask),
                jnp.float32(self.alpha0), jnp.asarray(beta0), t, n_iter=self.n_iter))
            elbos, tau_all, alpha_all, _ = run(jnp.asarray(np.stack(taus)))
        elbos = np.asarray(elbos, np.float64)
        best = int(np.argmax(elbos))
        tau = np.asarray(tau_all)[best]
        return MixtureMixtureInference(
            log_evidence=float(elbos[best]),
            cell_responsibilities=tau,
            map_assignments=np.argmax(tau, axis=1),
            alphas=np.asarray(alpha_all)[best],
        )


__all__ = ["VariationalBayesMixtureMixtureModel", "MixtureMixtureInference"]
