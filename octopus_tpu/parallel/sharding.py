"""Multi-chip sharding of the compute core — public mesh API.

The reference is a single-process shared-memory tool (SURVEY.md section
2.15); the TPU replacement shards

* the pair-HMM batch data-parallel over a 1-D device mesh (pairs are
  independent -> pure batch sharding, zero collectives until the host
  gather), and
* the genotype-likelihood reduction with READS across devices: each
  device computes partial per-genotype sums over its read shard and a
  psum over the mesh (ICI) produces the full genotype log-likelihoods.

This module only names the mesh and DELEGATES to the single product
implementation used by the calling pipeline
(core/likelihood/pairhmm_batch.py:_pairhmm_scores_sharded and
core/models/genotype_likelihoods.py:_genotype_lls_sharded_fn), so the
dryrun/tests exercise exactly the code the product runs.  Multi-host runs
shard genome regions across hosts (parallel/work_queue.py over DCN) and
use this within each host's chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def sharded_pairhmm_scores(mesh: Mesh, tgt, qual, win, opn, ext, mask, prior,
                           *, pad=8, nuc_prior=None):
    """Batch-sharded pair-HMM scoring over the mesh (product path)."""
    from ..core.likelihood.pairhmm_batch import (DEFAULT_NUC_PRIOR,
                                                 _pairhmm_scores_sharded)
    n_dev = int(np.prod(mesh.devices.shape))
    use_pallas = jax.default_backend() == "tpu"
    return _pairhmm_scores_sharded(
        n_dev, tgt, qual, win, opn, ext, mask, prior, pad=pad,
        nuc_prior=DEFAULT_NUC_PRIOR if nuc_prior is None else nuc_prior,
        use_pallas=use_pallas)


def sharded_genotype_step(mesh: Mesh, lnL, counts, ploidy: int):
    """Genotype log-likelihoods with reads sharded across the mesh
    (product path: per-device MXU partials + psum over ICI)."""
    from ..core.models.genotype_likelihoods import _genotype_lls_sharded_fn
    n_dev = int(np.prod(mesh.devices.shape))
    fn = _genotype_lls_sharded_fn(n_dev, int(ploidy))
    return fn(jnp.asarray(lnL, jnp.float32), jnp.asarray(counts, jnp.float32))


__all__ = ["make_mesh", "sharded_pairhmm_scores", "sharded_genotype_step"]
