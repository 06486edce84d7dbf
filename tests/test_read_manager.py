import numpy as np
import pytest

from octopus_tpu.io.read_manager import ReadManager
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from tests.test_bam import synth_batch


def _write(tmp_path, name, sample, n=20, seed=0):
    b = synth_batch(n=n, rng_seed=seed)
    p = tmp_path / name
    with BamWriter(str(p), ["chr1"], [10000], samples=[sample]) as w:
        w.write_batch(b, sample=sample)
    build_bai(str(p))
    return p, b


def test_multi_file_merge(tmp_path):
    p1, b1 = _write(tmp_path, "a.bam", "S1", n=15, seed=1)
    p2, b2 = _write(tmp_path, "b.bam", "S2", n=25, seed=2)
    p3, b3 = _write(tmp_path, "c.bam", "S1", n=10, seed=3)
    rm = ReadManager([str(p1), str(p2), str(p3)], max_open_files=2)
    assert rm.samples() == ["S1", "S2"]
    got = rm.fetch("chr1", 0, 10000)
    assert len(got["S1"]) == 25     # merged across files a + c
    assert len(got["S2"]) == 25
    assert (np.diff(got["S1"].begins) >= 0).all()


def test_cram_accepted(tmp_path):
    # CRAM is a supported container now (full round-trip coverage in
    # tests/test_cram.py); a missing file still errors cleanly
    with pytest.raises(FileNotFoundError):
        ReadManager([str(tmp_path / "x.cram")])


def test_covered_subregion(tmp_path):
    p1, _ = _write(tmp_path, "a.bam", "S1", n=40, seed=4)
    rm = ReadManager([str(p1)])
    b, e = rm.find_covered_subregion("chr1", 0, 10000, max_reads=100000)
    assert (b, e) == (0, 10000)
