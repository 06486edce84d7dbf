"""VB executable-set bounding (VERDICT round-3 item #2): the mixture-model
compile set must be CLOSED over arbitrary region shapes — cancer's cold
wall was per-shape VB compiles (BASELINE.md round 3: 31.0s cold vs 13.9s
warm).  Shapes bucket to power-of-4 ladders (reads >= 32, genotype chunks)
with exact masks, so any (G, N) stream maps to a small fixed program set.

Compile counting: jax_log_compiles emits one 'Finished XLA compilation of
jit(<name>)' line per fresh executable on the jax._src.dispatch logger.
"""

import logging
from contextlib import contextmanager

import numpy as np
import pytest

from octopus_tpu.core.models.subclone_vb import SubcloneModel, warm_vb
from octopus_tpu.core.models.mixture_mixture_vb import (
    VariationalBayesMixtureMixtureModel)


@contextmanager
def count_compiles(records: list):
    import jax
    logger = logging.getLogger("jax._src.dispatch")

    class _H(logging.Handler):
        def emit(self, r):
            msg = r.getMessage()
            if "Finished XLA compilation of" in msg:
                records.append(msg)

    handler = _H()
    old_level = logger.level
    prev = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(handler)
    logger.setLevel(logging.WARNING)
    try:
        yield records
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)
        jax.config.update("jax_log_compiles", prev)


def _n_vb(records):
    return sum("_vb_single" in r for r in records)


def test_subclone_executable_set_closed():
    """A dense stream of random (G, N, K) problems may compile at most
    |K| x |Np ladder| x |Gp ladder| programs — and far fewer in practice."""
    rng = np.random.default_rng(0)
    model = SubcloneModel(n_seeds=2, n_iter=40)

    def stream(n, records):
        for _ in range(n):
            K = int(rng.integers(2, 4))
            G = int(rng.integers(1, 200))
            N = int(rng.integers(1, 900))
            H = 4
            tuples = rng.integers(0, H, (G, K))
            lnL = rng.normal(-5, 2, (H, N)).astype(np.float32)
            out = model.evaluate(tuples, lnL)
            assert np.isfinite(out.log_evidence)
        return records

    with count_compiles([]) as first:
        stream(40, first)
    # hard ladder bound: K in {2,3} x Np in {32,128,512,2048} x Gp in
    # {1,4,16,64,256} = 40 programs maximum, however many regions run
    assert _n_vb(first) <= 40, first
    # closure: after warming the full envelope, a second stream of fresh
    # random regions compiles NOTHING
    warm_vb(max_reads=2048, ks=(2, 3), seeds_iters=((2, 40),), max_g=256)
    with count_compiles([]) as second:
        stream(40, second)
    assert _n_vb(second) == 0, second


def test_subclone_bucketing_is_exact():
    """Chunk/pad bucketing must not change results: evidences from a
    batched evaluate equal per-genotype-row evaluation."""
    rng = np.random.default_rng(3)
    H, N, K, G = 4, 37, 2, 5
    lnL = rng.normal(-4, 2, (H, N)).astype(np.float32)
    tuples = rng.integers(0, H, (G, K))
    model = SubcloneModel(n_seeds=3, n_iter=50)
    a = model.evaluate(tuples, lnL)
    singles = [model.evaluate(tuples[i:i + 1], lnL).genotype_log_evidences[0]
               for i in range(G)]
    np.testing.assert_allclose(a.genotype_log_evidences, singles,
                               rtol=1e-5, atol=1e-5)


def test_mixture_mixture_executable_set_closed():
    rng = np.random.default_rng(1)
    model = VariationalBayesMixtureMixtureModel(n_seeds=2, n_iter=30)
    with count_compiles([]) as records:
        for _ in range(12):
            H = 3
            n_cells = 3
            lnls = [rng.normal(-5, 2, (H, int(rng.integers(3, 120))))
                    .astype(np.float32) for _ in range(n_cells)]
            members = [[0, 1], [0, 2]]
            out = model.evaluate(lnls, members)
            assert np.isfinite(out.log_evidence)
    # read axis buckets to {32, 128}: at most 2 programs for this stream
    n = sum("_mmvb_single" in r for r in records)
    assert n <= 2, records


def test_warm_vb_precompiles_the_ladder():
    """After warm_vb, a fresh stream of problems within the warmed envelope
    triggers ZERO new _vb_single compiles."""
    warm_vb(max_reads=512, ks=(2, 3), seeds_iters=((2, 40),), max_g=64)
    rng = np.random.default_rng(7)
    model = SubcloneModel(n_seeds=2, n_iter=40)
    with count_compiles([]) as records:
        for _ in range(25):
            K = int(rng.integers(2, 4))
            G = int(rng.integers(1, 64))
            N = int(rng.integers(1, 512))
            tuples = rng.integers(0, 3, (G, K))
            lnL = rng.normal(-5, 2, (3, N)).astype(np.float32)
            model.evaluate(tuples, lnL)
    assert _n_vb(records) == 0, records
