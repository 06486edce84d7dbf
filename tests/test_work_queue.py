import multiprocessing as mp
import os

from octopus_tpu.parallel.work_queue import RegionWorkQueue, stripe


def _worker(qdir, keys, out):
    q = RegionWorkQueue(qdir)
    mine = []
    for k in keys:
        if q.try_claim(k):
            mine.append(k)
            q.mark_done(k, {"n": len(k)})
    out.put(mine)


def test_exclusive_claims_across_processes(tmp_path):
    keys = [f"chr1_{i}" for i in range(40)]
    out = mp.Queue()
    procs = [mp.Process(target=_worker, args=(str(tmp_path), keys, out))
             for _ in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    claimed = [out.get() for _ in procs]
    flat = [k for c in claimed for k in c]
    assert sorted(flat) == sorted(set(flat))       # no double-claims
    q = RegionWorkQueue(str(tmp_path))
    assert sorted(flat) == sorted(keys) or q.pending(keys) == []
    assert q.wait_all(keys, timeout_s=1)
    assert q.result("chr1_0")["result"]["n"] == len("chr1_0")


def test_stale_lease_reclaim(tmp_path):
    q1 = RegionWorkQueue(str(tmp_path), worker_id="dead-host")
    assert q1.try_claim("w1")
    # fresh lease is respected
    q2 = RegionWorkQueue(str(tmp_path), worker_id="live-host")
    assert not q2.try_claim("w1", stale_after_s=3600)
    # stale lease is stolen
    os.utime(os.path.join(str(tmp_path), "w1.claim"), (0, 0))
    assert q2.try_claim("w1", stale_after_s=10)


def test_stripe():
    keys = [str(i) for i in range(10)]
    a = stripe(keys, 0, 3)
    b = stripe(keys, 1, 3)
    c = stripe(keys, 2, 3)
    assert sorted(a + b + c) == sorted(keys)
    assert not (set(a) & set(b))
