import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import decode_sequence
from octopus_tpu.basics.cigar import cigar_to_string
from octopus_tpu.io.bam import BamFile
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.bgzf import BgzfReader, BgzfWriter


class TestBgzf:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "x.gz"
        payload = bytes(range(256)) * 2000
        with BgzfWriter(str(p)) as w:
            w.write(payload)
        r = BgzfReader(str(p))
        assert r.read_all() == payload

    def test_read_from_offset_zero(self, tmp_path):
        p = tmp_path / "x.gz"
        with BgzfWriter(str(p)) as w:
            w.write(b"hello world" * 100)
        r = BgzfReader(str(p))
        assert r.read_from(0, 11)[:11] == b"hello world"


def synth_batch(contig="chr1", n=40, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    reads = []
    for i in range(n):
        begin = int(rng.integers(0, 5000))
        L = int(rng.integers(30, 80))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        quals = rng.integers(10, 40, L).tolist()
        flags = FLAG_REVERSE if i % 3 == 0 else 0
        if i % 4 == 0 and L > 20:
            cigar = f"5S{L - 10}M5S"
        else:
            cigar = f"{L}M"
        reads.append((begin, cigar, seq, quals, int(rng.integers(0, 61)), flags))
    return make_read_batch(contig, reads).sorted_by_begin()


class TestBamRoundtrip:
    def test_write_read(self, tmp_path):
        batch = synth_batch()
        p = tmp_path / "t.bam"
        with BamWriter(str(p), ["chr1", "chr2"], [10000, 5000], samples=["S1"]) as w:
            w.write_batch(batch, sample="S1")
        build_bai(str(p))
        bam = BamFile(str(p))
        assert bam.header.ref_names == ["chr1", "chr2"]
        assert bam.samples() == ["S1"]
        got = bam.fetch("chr1", 0, 10000)["S1"]
        assert len(got) == len(batch)
        # order-insensitive comparison by begin-sorted identity
        want = batch
        np.testing.assert_array_equal(np.sort(got.begins), np.sort(want.begins))
        # spot check one read round trips fully
        i_w = int(np.argmin(want.begins))
        i_g = int(np.argmin(got.begins))
        assert decode_sequence(got.sequence(i_g)) == decode_sequence(want.sequence(i_w))
        assert got.qualities(i_g).tolist() == want.qualities(i_w).tolist()
        assert cigar_to_string(got.cigar(i_g)) == cigar_to_string(want.cigar(i_w))
        assert got.mapq[i_g] == want.mapq[i_w]

    def test_region_query_subset(self, tmp_path):
        batch = synth_batch(n=60)
        p = tmp_path / "t.bam"
        with BamWriter(str(p), ["chr1"], [10000], samples=["S1"]) as w:
            w.write_batch(batch, sample="S1")
        build_bai(str(p))
        bam = BamFile(str(p))
        got = bam.fetch("chr1", 1000, 2000)["S1"]
        want_mask = (batch.begins < 2000) & (batch.ends > 1000)
        assert len(got) == int(want_mask.sum())
        assert (got.begins < 2000).all() and (got.ends > 1000).all()

    def test_multi_sample_routing(self, tmp_path):
        b1 = synth_batch(n=10, rng_seed=1)
        b2 = synth_batch(n=15, rng_seed=2)
        p = tmp_path / "t.bam"
        with BamWriter(str(p), ["chr1"], [10000], samples=["A", "B"]) as w:
            w.write_batch(b1, sample="A")
            w.write_batch(b2, sample="B")
        build_bai(str(p))
        bam = BamFile(str(p))
        assert bam.samples() == ["A", "B"]
        res = bam.fetch("chr1", 0, 10000)
        assert len(res["A"]) == 10
        assert len(res["B"]) == 15
