"""Driver benchmark: batched pair-HMM throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value: pair-HMM throughput (read x haplotype pairs scored per second) for
Illumina-shaped work (R=150, band 8) on the production kernel (pallas v9,
looped wavefront; OCTOPUS_TPU_UNROLLED_HMM=1 selects the ~8% faster but
minutes-slower-to-compile unrolled v8) using the marginal-batch method (the
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


def bench_tpu(batches=(16384, 65536)) -> dict:
    """Kernel throughput with inputs generated on device (isolates chip
    compute from this dev box's ~25 ms tunnel round trip; production hosts
    stage inputs asynchronously)."""
    import functools
    import jax
    import jax.numpy as jnp
    from octopus_tpu.core.likelihood import pairhmm_batch as pb

    W = R + 2 * PAD - 1

    B = max(batches)

    def bench_path(kernel_name):
        # the production v8 kernel takes kernel-layout (rows, B) inputs — the
        # layout the host pipeline assembles natively
        @functools.partial(jax.jit, static_argnames=("K",))
        def step(key, K):
            def one(carry, k):
                # fresh inputs per rep: the remote execution service
                # memoises (executable, inputs), so repeated identical
                # launches would be served from cache
                ks = jax.random.split(jax.random.fold_in(key, k), 7)
                if kernel_name == "pallas":
                    tgt = jax.random.randint(ks[0], (R, B), 0, 4, jnp.int32)
                    qual = jax.random.randint(ks[1], (R, B), 10, 40, jnp.int32)
                    win = jax.random.randint(ks[2], (W, B), 0, 4, jnp.int32)
                    opn = jax.random.randint(ks[3], (W, B), 10, 50, jnp.int32)
                    ext = jax.random.randint(ks[4], (W, B), 1, 8, jnp.int32)
                    mask = jax.random.randint(ks[5], (W, B), 0, 4, jnp.int32)
                    prior = jax.random.randint(ks[6], (W, B), 3, 40, jnp.int32)
                    fn = (pb.pairhmm_scores_pallas_v8
                          if os.environ.get("OCTOPUS_TPU_UNROLLED_HMM") == "1"
                          else pb._pallas_fn_for(B))
                    s = fn(tgt, qual, win, opn, ext, mask, prior, pad=PAD)
                else:
                    tgt = jax.random.randint(ks[0], (B, R), 0, 4, jnp.int32)
                    qual = jax.random.randint(ks[1], (B, R), 10, 40, jnp.int32)
                    win = jax.random.randint(ks[2], (B, W), 0, 4, jnp.int32)
                    opn = jax.random.randint(ks[3], (B, W), 10, 50, jnp.int32)
                    ext = jax.random.randint(ks[4], (B, W), 1, 8, jnp.int32)
                    mask = jax.random.randint(ks[5], (B, W), 0, 4, jnp.int32)
                    prior = jax.random.randint(ks[6], (B, W), 3, 40, jnp.int32)
                    s = pb.pairhmm_scores_xla(
                        tgt, qual, win, opn, ext, mask, prior, pad=PAD)
                return carry + jnp.sum(s), None

            total, _ = jax.lax.scan(one, jnp.int32(0),
                                    jnp.arange(K, dtype=jnp.int32))
            return total

        QUEUE = 9          # batches per staged queue (one sync point)
        PIPE = 5           # queues in flight for the pipelined measure
        REPS = 5           # independent repetitions -> median + spread
        # compile + first sync for both shapes
        float(step(jax.random.PRNGKey(0), 1))
        float(step(jax.random.PRNGKey(0), QUEUE))
        marginals, singles, pipelined = [], [], []
        key = jax.random.PRNGKey(42)
        for i in range(REPS):
            t0 = time.time()
            float(step(jax.random.fold_in(key, 2 * i), 1))
            t1 = time.time() - t0
            t0 = time.time()
            float(step(jax.random.fold_in(key, 2 * i + 1), QUEUE))
            tq = time.time() - t0
            # K-difference cancels the per-call dispatch round trip exactly;
            # a rep where the tunnel hiccups can make tq <= t1 — drop it
            # rather than emit a non-finite value
            per_batch = (tq - t1) / (QUEUE - 1)
            if per_batch > 0:
                marginals.append(B / per_batch)
            singles.append(B / t1)
            # pipelined staging: issue PIPE queues back-to-back (async
            # dispatch, results read at the end) — the production launch
            # shape of a big window's populate (_device_scores dispatches
            # every chunk before its single collect), so dispatch latency
            # hides behind the previous queue's compute
            t0 = time.time()
            outs = [step(jax.random.fold_in(key, 1000 + i * PIPE + j), QUEUE)
                    for j in range(PIPE)]
            for o in outs:
                float(o)
            tp = time.time() - t0
            pipelined.append(PIPE * QUEUE * B / tp)
        return {
            "marginal": marginals,
            "single": singles,
            "pipelined": pipelined,
            "queue": QUEUE,
            "pipeline_depth": PIPE,
        }

    import jax
    kernel = "pallas"
    try:
        series = bench_path("pallas")
    except Exception:
        kernel = "xla"
        series = bench_path("xla")

    def stats(xs):
        xs = [x for x in xs if np.isfinite(x)] or [float("nan")]
        return {"median": float(np.median(xs)), "min": float(np.min(xs)),
                "max": float(np.max(xs))}

    return {
        "marginal": stats(series["marginal"]),
        "single_launch": stats(series["single"]),
        "pipelined": stats(series["pipelined"]),
        "queue": series["queue"],
        "pipeline_depth": series["pipeline_depth"],
        "kernel": kernel,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def bench_reference_kernel(reps: int = 5) -> dict:
    """Single-thread pairs/s of the reference SSE2 kernel on this host:
    median + spread over `reps` independent runs (the box shows ±30%
    run-to-run noise, BASELINE.md — a single point has no error bars)."""
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
    vals = []
    for _ in range(reps):
        out = subprocess.run([exe, str(R), "40000"], capture_output=True,
                             text=True, check=True, timeout=300)
        vals.append(float(json.loads(out.stdout)["pairs_per_s"]))
    return {"median": float(np.median(vals)), "min": float(np.min(vals)),
            "max": float(np.max(vals))}


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
    tpu = bench_tpu()
    try:
        ref = bench_reference_kernel()
        baseline = ref["median"] * BASELINE_THREADS
        baseline_spread = [ref["min"] * BASELINE_THREADS,
                           ref["max"] * BASELINE_THREADS]
    except Exception:
        baseline = float("nan")
        baseline_spread = None
    value = tpu["marginal"]["median"]
    vs = value / baseline if baseline == baseline else None
    # GCUPS: banded DP cell updates/s = pairs/s x (R rows x 2*pad diagonals).
    # Two ceilings are reported:
    # * speed_of_light_gcups_est keeps round-1's optimistic model (8x128
    #   lanes x 4 ALUs x ~0.94 GHz / ~18 ops per cell ~= 214 GCUPS), which
    #   assumes the VPU can issue four independent (8,128) vector ops per
    #   cycle for this dependent-integer op mix;
    # * measured_issue_ceiling_gcups uses the empirically supported model:
    #   the round-3 experiments (experiments/: wider lanes flat, K
    #   independent chains only +13% and flat by K=8, op-count reductions
    #   and load reductions both SLOWER) pin the sustained rate at ~1
    #   native (8,128) tile-op/cycle; the kernel spends ~60 tile-ops per
    #   row per 128 pairs, so the ceiling is 0.94e9 * 128/(60) cells.. i.e.
    #   ~0.94e9 tile-ops/s over (60/(128*D)) tile-ops per cell.
    D = 2 * PAD
    gcups = value * R * D / 1e9
    sol_gcups = 3.85e12 / 18 / 1e9
    tile_ops_per_row_block = 60.0          # measured op census, (16,128) i32
    issue_ceiling_pairs = 0.94e9 * 128 / (tile_ops_per_row_block * R)
    issue_ceiling_gcups = issue_ceiling_pairs * R * D / 1e9
    rnd = lambda s: {k: round(v, 1) for k, v in s.items()}
    print(json.dumps({
        "metric": "pairhmm_pairs_per_s_per_chip",
        "value": round(value, 1),
        "unit": "read-haplotype pairs/s (R=150, band 8; median of 5 reps)",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {
            "gcups": round(gcups, 1),
            "speed_of_light_gcups_est": round(sol_gcups, 1),
            "fraction_of_sol": round(gcups / sol_gcups, 3),
            "measured_issue_ceiling_gcups": round(issue_ceiling_gcups, 1),
            "fraction_of_issue_ceiling": round(gcups / issue_ceiling_gcups, 3),
            "marginal_pairs_per_s": rnd(tpu["marginal"]),
            "total_pairs_per_s_incl_dispatch": round(
                tpu["pipelined"]["median"], 1),
            "pipelined_staged_pairs_per_s": rnd(tpu["pipelined"]),
            "single_launch_pairs_per_s": rnd(tpu["single_launch"]),
            "staging": {"queue": tpu["queue"],
                        "pipeline_depth": tpu["pipeline_depth"]},
            "baseline_ref_sse2_x8threads_pairs_per_s": round(baseline, 1) if baseline == baseline else None,
            "baseline_spread": ([round(x, 1) for x in baseline_spread]
                                if baseline_spread else None),
            "kernel": tpu.get("kernel"),
            "backend": tpu["backend"],
            "device": tpu["device"],
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
