"""Multi-worker scaling benchmark (--work-queue over one shared directory).

Simulates an N-Mb diploid sample once, then runs the SAME calling job as
1, 2, and 4 parallel OS processes sharing the work queue
(`--work-queue --num-shards K --shard-index i` — the multi-host execution
model; octopus.cpp:1226-1342 is the reference's in-process analogue).
Reports wall per configuration, scaling efficiency, and asserts the merged
VCF is byte-identical to the single-process run.

Usage: python bench_scaling.py [mb=10] [depth=30] [workers="1,2,4"]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def run_shards(fa, bam, out, n_shards, env):
    procs = []
    for i in range(n_shards):
        args = [sys.executable, "-m", "octopus_tpu.cli",
                "-R", fa, "-I", bam, "-o", out, "-T", "chr1",
                "--work-queue", "--num-shards", str(n_shards),
                "--shard-index", str(i)]
        procs.append(subprocess.Popen(
            args, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=env))
    rcs = [p.wait() for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    assert os.path.exists(out), "merge did not produce the output VCF"


def body(path):
    with open(path) as fh:
        return [l for l in fh.read().splitlines() if not l.startswith("##")]


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    workers = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3
                                else "1,2,4").split(",")]
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/octopus_tpu_jax_cache")
    from bench_e2e import simulate
    tmp = tempfile.mkdtemp()
    fa, bam, truth, n = simulate(tmp, mb * 1000, depth)
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    baseline_wall = None
    single_body = None
    for k in workers:
        out = os.path.join(tmp, f"out_{k}.vcf")
        t0 = time.time()
        run_shards(fa, bam, out, k, env)
        wall = time.time() - t0
        b = body(out)
        identical = None
        if single_body is None:
            single_body = b
            baseline_wall = wall
        else:
            identical = b == single_body
        n_records = sum(1 for l in b if not l.startswith("#"))
        print(json.dumps({
            "metric": "e2e_scaling", "mb": mb, "depth": depth,
            "workers": k, "wall_s": round(wall, 1),
            "kb_per_s": round(mb * 1000 / wall, 1),
            "speedup": round(baseline_wall / wall, 2),
            "efficiency": round(baseline_wall / wall / k, 2),
            "n_records": n_records,
            "identical_to_single": identical,
        }), flush=True)


if __name__ == "__main__":
    main()
