"""Genotype log-likelihood reductions over the read x haplotype matrix.

Capability-equivalent to ConstantMixtureGenotypeLikelihoodModel
(src/core/models/genotype/constant_mixture_genotype_likelihood_model.cpp):

    ln p(reads | g) = sum_r [ ln sum_{h in g} exp(lnL[h, r]) - ln ploidy ]

TPU design: instead of per-genotype loops, the inner logsumexp becomes an
MXU matmul.  With per-read maxima m_r = max_h lnL[h, r] and
E = exp(lnL - m) (H, R), the per-genotype mixture is C @ E where C is the
(G, H) multiplicity matrix; then

    L[g] = sum_r (log (C @ E)[g, r] + m_r) - R * ln ploidy.

A float64 numpy path provides exact reference-parity values; callers use the
device path for the full enumeration and (optionally) re-evaluate the top
genotypes on the host for exact QUALs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..types.genotypes import genotype_counts_matrix


def genotype_log_likelihoods_np(lnL: np.ndarray, genotypes: np.ndarray,
                                chunk: int = 2048) -> np.ndarray:
    """Exact float64 host computation. lnL (H, R); genotypes (G, P).

    Chunked over genotypes: the (G, P, R) intermediate on a dense deep
    window (G ~ 20k, R ~ 20k) would otherwise be gigabytes."""
    G, P = genotypes.shape
    if P == 0:
        return np.zeros(G)
    out = np.empty(G)
    for lo in range(0, G, chunk):
        g = genotypes[lo:lo + chunk]
        sub = lnL[g]                          # (g, P, R)
        m = sub.max(axis=1)                   # (g, R)
        m_safe = np.where(np.isfinite(m), m, 0.0)
        s = np.exp(sub - m_safe[:, None, :]).sum(axis=1)
        per_read = m_safe + np.log(s) - np.log(P)
        per_read = np.where(np.isfinite(m), per_read, -np.inf)
        out[lo:lo + chunk] = per_read.sum(axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("ploidy",))
def _genotype_lls_device(lnL32, counts, ploidy):
    # lnL32 (H, R) float32, counts (G, H) float32
    m = jnp.max(lnL32, axis=0)                        # (R,)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    E = jnp.exp(lnL32 - m[None, :])                   # (H, R)
    S = jnp.dot(counts, E, preferred_element_type=jnp.float32)  # (G, R)
    per_read = jnp.log(S) + m[None, :] - np.log(ploidy)
    return jnp.sum(per_read, axis=1)                  # (G,)


def _bucket(n: int, base: int = 8) -> int:
    """Next power-of-two multiple of base (compile-shape hygiene)."""
    t = base
    while t < n:
        t *= 2
    return t


@functools.lru_cache(maxsize=None)
def _read_mesh(n_devices: int):
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:n_devices]), ("reads",))


@functools.lru_cache(maxsize=None)
def _genotype_lls_sharded_fn(n_dev: int, ploidy: int):
    """Reads sharded across the mesh; per-genotype partials psum over ICI
    (SURVEY section 2.15 TPU-equivalents)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pt

    def local(lnL_shard, counts):
        m = jnp.max(lnL_shard, axis=0)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        E = jnp.exp(lnL_shard - m[None, :])
        S = jnp.dot(counts, E, preferred_element_type=jnp.float32)
        partial = jnp.sum(jnp.log(S) + m[None, :] - np.log(ploidy), axis=1)
        return jax.lax.psum(partial, "reads")

    fn = shard_map(local, mesh=_read_mesh(n_dev),
                   in_specs=(Pt(None, "reads"), Pt(None, None)),
                   out_specs=Pt(None))
    return jax.jit(fn)


def genotype_log_likelihoods(lnL: np.ndarray, genotypes: np.ndarray,
                             device: bool = True) -> np.ndarray:
    """Genotype log-likelihoods; device matmul path or exact host path.

    Device shapes are padded to power-of-two buckets (reads with lnL=0 rows
    of zero weight, haplotypes with zero counts, genotypes with dummy rows)
    so data-dependent sizes reuse a small set of compiled kernels."""
    G, P = genotypes.shape
    if P == 0 or lnL.shape[1] == 0:
        return np.zeros(G)
    # tiny reductions are host work: a (G,H)x(H,R) matmul under ~1 MFLOP
    # costs microseconds in numpy but a full dispatch round trip on device
    if genotypes.shape[0] * genotypes.shape[1] * lnL.shape[1] < 1_000_000:
        device = False
    # small runs skip the warm-up thread (run.py), so an unusual padded
    # shape (one dense deep window) must not stall minutes in a cold
    # remote compile; the run loop sets this for sub-warm-gate runs
    if os.environ.get("OCTOPUS_TPU_HOST_LATENTS") == "1":
        device = False
    if not device:
        return genotype_log_likelihoods_np(lnL, genotypes)
    H, R = lnL.shape
    n_dev = 1 if os.environ.get("OCTOPUS_TPU_NO_SHARD") == "1" \
        else jax.device_count()
    read_quantum = 32 * n_dev if n_dev > 1 else 32
    Hp, Rp, Gp = _bucket(H), _bucket(R, read_quantum), _bucket(G)
    counts = genotype_counts_matrix(genotypes, H)
    if (Hp, Rp, Gp) != (H, R, G):
        lnL_p = np.full((Hp, Rp), -np.inf)
        lnL_p[:H, :R] = lnL
        lnL_p[:, R:] = 0.0            # padding reads contribute log(sum)=const
        lnL_p[H:, :] = -np.inf        # padding haplotypes never selected
        counts_p = np.zeros((Gp, Hp), np.float32)
        counts_p[:G, :H] = counts
        counts_p[G:, 0] = P           # dummy genotypes: all-ref, finite
        if n_dev > 1 and Rp % n_dev == 0:
            fn = _genotype_lls_sharded_fn(n_dev, int(P))
            out = fn(jnp.asarray(lnL_p, jnp.float32), jnp.asarray(counts_p))
        else:
            out = _genotype_lls_device(jnp.asarray(lnL_p, jnp.float32),
                                       jnp.asarray(counts_p), int(P))
        out = np.asarray(out, dtype=np.float64)[:G]
        # remove the padding reads' constant contribution: each padding read
        # adds logsumexp over genotype counts of exp(0) = log(P) - log(P) = 0
        return out
    if n_dev > 1 and R % n_dev == 0:
        fn = _genotype_lls_sharded_fn(n_dev, int(P))
        out = fn(jnp.asarray(lnL, jnp.float32), jnp.asarray(counts))
    else:
        out = _genotype_lls_device(jnp.asarray(lnL, jnp.float32),
                                   jnp.asarray(counts), int(P))
    return np.asarray(out, dtype=np.float64)


__all__ = ["genotype_log_likelihoods", "genotype_log_likelihoods_np"]
