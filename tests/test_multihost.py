"""True multi-host execution: two SEPARATE octopus-tpu OS processes share
one shard directory via --work-queue + --num-shards/--shard-index; the
last finisher merges, and the merged VCF is byte-identical to a
single-process run (SURVEY.md section 2.15 / section 7 multi-host design;
the shard merge is the cross-host gather)."""

import os
import subprocess
import sys

import pytest


def _simulate(tmpdir, kb=60, depth=30, seed=77):
    from octopus_tpu.utils.synthetic import simulate_diploid
    fa, bam, truth, n = simulate_diploid(str(tmpdir), kb=kb, depth=depth,
                                         seed=seed)
    return fa, bam, truth


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # the spawned processes run with cwd=tmp_path; make octopus_tpu
    # importable whether or not the package is pip-installed
    import octopus_tpu
    repo_root = os.path.dirname(os.path.dirname(octopus_tpu.__file__))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "octopus_tpu.cli", *args],
        cwd=cwd, env=_env(), capture_output=True, text=True, timeout=900)


def test_two_process_work_queue_matches_single_process(tmp_path):
    fa, bam, truth = _simulate(tmp_path)
    base = ["-R", fa, "-I", bam, "-T", "chr1"]

    # ground truth: one process, one output
    single_out = str(tmp_path / "single.vcf")
    r = _run_cli([*base, "-o", single_out], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    single = open(single_out, "rb").read()
    assert single.count(b"\n") > 10

    # two "hosts": separate spawned OS processes, one shard each, shared
    # queue directory through the common output path
    multi_out = str(tmp_path / "multi.vcf")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "octopus_tpu.cli", *base, "-o", multi_out,
         "--work-queue", "--num-shards", "2", "--shard-index", str(i),
         "--keep-temporary-files"],
        cwd=str(tmp_path), env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]

    assert os.path.exists(multi_out), (
        "last finisher must merge: " + "\n---\n".join(e for _, e in outs))
    multi = open(multi_out, "rb").read()
    assert multi == single

    # both hosts actually did work (each claimed at least one window) when
    # there was more than one window
    qdir = multi_out + ".shards/queue"
    claims = [f for f in os.listdir(qdir) if f.endswith(".claim")]
    workers = {open(os.path.join(qdir, c)).read() for c in claims}
    if len(claims) > 1:
        assert len(workers) == 2, f"both processes should claim: {workers}"


def test_work_queue_resume_after_kill(tmp_path):
    """A 'preempted host': its claims go stale, a rerun reclaims and the
    final output still matches the clean single-process run."""
    fa, bam, truth = _simulate(tmp_path, kb=40, seed=31)
    base = ["-R", fa, "-I", bam, "-T", "chr1"]
    single_out = str(tmp_path / "single.vcf")
    r = _run_cli([*base, "-o", single_out], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    multi_out = str(tmp_path / "multi.vcf")
    # shard 0 runs alone and exits without merging (shard 1 pending)
    r0 = _run_cli([*base, "-o", multi_out, "--work-queue",
                   "--num-shards", "2", "--shard-index", "0",
                   "--keep-temporary-files"], str(tmp_path))
    assert r0.returncode == 0, r0.stderr[-2000:]
    # then shard 1 finishes the job and merges
    r1 = _run_cli([*base, "-o", multi_out, "--work-queue",
                   "--num-shards", "2", "--shard-index", "1",
                   "--keep-temporary-files"], str(tmp_path))
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert os.path.exists(multi_out)
    assert open(multi_out, "rb").read() == open(single_out, "rb").read()
