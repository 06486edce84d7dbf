"""Driver benchmark: batched pair-HMM throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value: pair-HMM throughput (read x haplotype pairs scored per second) for
Illumina-shaped work (R=150, band 8) using the marginal-batch method (the
difference between two batch sizes removes fixed dispatch/tunnel latency,
which on this dev box is a ~25 ms stdin-relay round trip that production
TPU hosts do not pay).

vs_baseline: ratio against the REFERENCE's own SSE2 kernel
(tests/golden/golden_bench, which #includes the reference pair-HMM headers)
measured on this host and scaled to the 8 CPU threads of the baseline
configuration (BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

R = 150
PAD = 8
BASELINE_THREADS = 8


def bench_tpu(batches=(4096, 16384)) -> dict:
    import jax
    from octopus_tpu.core.likelihood.pairhmm_batch import pairhmm_scores_xla

    rng = np.random.default_rng(0)
    W = R + 2 * PAD - 1

    def make(B):
        return tuple(jax.device_put(a.astype(np.int32)) for a in (
            rng.integers(0, 4, (B, R)), rng.integers(10, 40, (B, R)),
            rng.integers(0, 4, (B, W)), rng.integers(10, 50, (B, W)),
            rng.integers(1, 8, (B, W)), rng.integers(0, 4, (B, W)),
            rng.integers(3, 40, (B, W))))

    results = {}
    for B in batches:
        args = make(B)
        np.asarray(pairhmm_scores_xla(*args, pad=PAD))   # compile + sync
        best = float("inf")
        for _ in range(6):
            t0 = time.time()
            s = np.asarray(pairhmm_scores_xla(*args, pad=PAD))
            best = min(best, time.time() - t0)
        results[B] = best
    b_small, b_large = min(batches), max(batches)
    marginal = (results[b_large] - results[b_small]) / (b_large - b_small)
    return {
        "pairs_per_s_marginal": 1.0 / marginal if marginal > 0 else float("inf"),
        "pairs_per_s_total": b_large / results[b_large],
        "times": results,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def bench_reference_kernel() -> float:
    """Single-thread pairs/s of the reference SSE2 kernel on this host."""
    exe = os.path.join(os.path.dirname(__file__), "tests", "golden", "golden_bench")
    if not os.path.exists(exe):
        src = exe + ".cpp"
        subprocess.run(
            ["g++", "-O3", "-std=c++14", "-msse4.1", "-include", "smmintrin.h",
             "-I", os.path.dirname(exe),
             "-I", "/root/reference/src/core/models/pairhmm",
             "-I", "/root/reference/src",
             "-o", exe, src],
            check=True, capture_output=True)
    out = subprocess.run([exe, str(R), "40000"], capture_output=True, text=True,
                         check=True, timeout=300)
    return float(json.loads(out.stdout)["pairs_per_s"])


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
    tpu = bench_tpu()
    try:
        ref_st = bench_reference_kernel()
        baseline = ref_st * BASELINE_THREADS
    except Exception:
        baseline = float("nan")
    value = tpu["pairs_per_s_marginal"]
    vs = value / baseline if baseline == baseline else None
    print(json.dumps({
        "metric": "pairhmm_pairs_per_s_per_chip",
        "value": round(value, 1),
        "unit": "read-haplotype pairs/s (R=150, band 8)",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {
            "total_pairs_per_s_incl_dispatch": round(tpu["pairs_per_s_total"], 1),
            "baseline_ref_sse2_x8threads_pairs_per_s": round(baseline, 1) if baseline == baseline else None,
            "backend": tpu["backend"],
            "device": tpu["device"],
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
