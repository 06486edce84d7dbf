"""Multi-chip sharding of the compute core.

The reference is a single-process shared-memory tool (SURVEY.md section 2.15);
this module is its TPU-native replacement for scaling: a 1-D device mesh over
which

* the pair-HMM batch is data-parallel (pairs are independent -> pure
  sharding of the batch axis, zero collectives until the host gather), and
* the genotype-likelihood reduction shards READS across devices: each device
  computes partial per-genotype sums over its read shard and a psum over the
  mesh produces the full genotype log-likelihoods — the collective rides ICI.

Multi-host runs shard genome regions across hosts (work queue over DCN) and
use this module within each host's chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.likelihood.pairhmm_batch import _hmm_rows, DEFAULT_NUC_PRIOR


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def sharded_pairhmm_scores(mesh: Mesh, tgt, qual, win, opn, ext, mask, prior,
                           *, pad=8, nuc_prior=DEFAULT_NUC_PRIOR):
    """Batch-sharded pair-HMM scoring over the mesh ('data' axis on pairs).

    B must divide by the mesh size; each device runs the wavefront on its
    pair shard; no collectives needed.
    """
    axis = mesh.axis_names[0]

    def local(tgt, qual, win, opn, ext, mask, prior):
        args = [jnp.asarray(a, jnp.int32).T for a in (tgt, qual, win, opn, ext, mask, prior)]
        return _hmm_rows(*args, pad, nuc_prior)

    spec = P(axis)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec,) * 7, out_specs=spec)
    return jax.jit(fn)(tgt, qual, win, opn, ext, mask, prior)


def sharded_genotype_step(mesh: Mesh, lnL, counts, ploidy: int):
    """Genotype posteriors with reads sharded across the mesh.

    lnL: (H, R) read x haplotype log-likelihoods (R divisible by mesh size);
    counts: (G, H) genotype multiplicity matrix.
    Each device reduces its read shard on the MXU; a psum over ICI combines
    the per-genotype partial sums; output replicated.
    """
    axis = mesh.axis_names[0]

    def local(lnL_shard, counts_rep):
        m = jnp.max(lnL_shard, axis=0)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        E = jnp.exp(lnL_shard - m[None, :])
        S = jnp.dot(counts_rep, E, preferred_element_type=jnp.float32)
        partial = jnp.sum(jnp.log(S) + m[None, :], axis=1)   # (G,)
        total = jax.lax.psum(partial, axis)
        n_reads_total = jax.lax.psum(jnp.float32(lnL_shard.shape[1]), axis)
        return total - n_reads_total * np.log(ploidy)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, axis), P(None, None)),
                   out_specs=P(None))
    return jax.jit(fn)(jnp.asarray(lnL, jnp.float32), jnp.asarray(counts, jnp.float32))


__all__ = ["make_mesh", "sharded_pairhmm_scores", "sharded_genotype_step"]
