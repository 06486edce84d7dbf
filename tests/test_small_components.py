"""Tests for the small parity components: Randomiser/Downloader candidate
generators, UnsupervisedClusteringFilter, training-mode helpers, and
BufferedReadPipe."""

import numpy as np

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.core.csr.clustering import UnsupervisedClusteringFilter
from octopus_tpu.core.csr.training import (PassingFilter, extract_measure_table,
                                           label_against_truth)
from octopus_tpu.core.vargen.generator import VariantGenerator, VariantGeneratorConfig
from octopus_tpu.core.vargen.randomiser import Downloader, Randomiser
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.io.vcf import VcfHeader, VcfRecord, VcfWriter
from octopus_tpu.readpipe.buffered import BufferedReadPipe
from octopus_tpu.readpipe.pipe import ReadPipe


def _ref(seq="ACGTACGTAC" * 50):
    return ReferenceGenome(InMemoryReference({"chr1": seq}))


def _batch(n=6, begin=10, length=60, seq_of=None):
    ref = "ACGTACGTAC" * 50
    reads = []
    for i in range(n):
        b = begin + 3 * i
        s = ref[b:b + length] if seq_of is None else seq_of(i, b)
        reads.append((b, f"{length}M", s, [35] * length, 60, 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def test_randomiser_periodic_revcomp_candidates():
    ref = _ref()
    r = Randomiser(ref, "chr1")
    r.add_reads(0, _batch(length=50))
    variants = r.generate(0, 500)
    assert variants, "expected periodic candidates"
    # step is the max read size
    begins = [v.begin for v in variants]
    assert all(b2 - b1 == 50 for b1, b2 in zip(begins, begins[1:]))
    for v in variants:
        ref_base = ref.fetch_codes("chr1", v.begin, v.begin + 1)
        assert v.ref_codes.tolist() == ref_base.tolist()
        assert v.alt_codes.tolist() != ref_base.tolist()
    # no reads -> no candidates (reference needs max_read_size)
    assert Randomiser(ref, "chr1").generate(0, 500) == []


def test_downloader_is_gated_noop():
    d = Downloader(_ref(), "chr1")
    assert d.generate(0, 1000) == []


def test_randomiser_pluggable_in_composite():
    ref = _ref()
    cfg = VariantGeneratorConfig(use_randomiser=True, use_repeat_scanner=False,
                                 use_pileup_scanner=False)
    gen = VariantGenerator(ref, "chr1", cfg)
    gen.add_reads(0, _batch(length=40))
    out = gen.generate(0, 300)
    assert out and all(v.begin < 300 for v in out)


def test_unsupervised_clustering_flags_minority_low_quality():
    rng = np.random.default_rng(0)
    filt = UnsupervisedClusteringFilter(seed=1)
    # 90 good calls: high QUAL/GQ, low SB; 10 bad: low QUAL, high SB
    for _ in range(90):
        filt.record({"QUAL": 300 + rng.normal(0, 20), "GQ": 90 + rng.normal(0, 5),
                     "SB": rng.uniform(0, .2), "DP": 30 + rng.normal(0, 3)})
    for _ in range(10):
        filt.record({"QUAL": 5 + rng.normal(0, 2), "GQ": 3 + rng.normal(0, 1),
                     "SB": rng.uniform(.8, 1.0), "DP": 31 + rng.normal(0, 3)})
    result = filt.classify_all()
    assert len(result) == 100
    assert all(r == [] for r in result[:90])
    assert sum(bool(r) for r in result[90:]) >= 8
    assert filt.filter_ids() == ["UCF"]


def test_unsupervised_clustering_drops_all_missing_columns():
    filt = UnsupervisedClusteringFilter()
    for i in range(10):
        filt.record({"QUAL": 100.0 + i, "MISSING": float("nan")})
    assert filt.classify_all() == [[] for _ in range(10)]


def test_passing_filter_and_measure_table_roundtrip(tmp_path):
    assert PassingFilter().classify({"QUAL": 1.0}) == []
    header = VcfHeader()
    header.add_info("QD", "1", "Float", "qual by depth")
    header.add_info("SB", "1", "Float", "strand bias")
    path = str(tmp_path / "annotated.vcf")
    with VcfWriter(path, header) as w:
        for i in range(4):
            w.write(VcfRecord("chr1", 100 + i, ".", "A", ["C"], 50.0 + i,
                              ["PASS"], {"QD": 2.0 + i, "SB": 0.1 * i}))
    names, X, keys = extract_measure_table(path, ["QD", "SB"],
                                           csv_path=str(tmp_path / "t.csv"))
    assert names == ["QD", "SB"] and X.shape == (4, 2)
    assert np.allclose(X[:, 0], [2, 3, 4, 5])
    assert (tmp_path / "t.csv").read_text().splitlines()[0] == \
        "CHROM,POS,REF,ALT,QD,SB"
    # truth labelling: mark records 0 and 2 as true
    tpath = str(tmp_path / "truth.vcf")
    with VcfWriter(tpath, VcfHeader()) as w:
        w.write(VcfRecord("chr1", 100, ".", "A", ["C"], None, [], {}))
        w.write(VcfRecord("chr1", 102, ".", "A", ["C"], None, [], {}))
    labels = label_against_truth(keys, tpath)
    assert labels.tolist() == [1, 0, 1, 0]


class _FakeManager:
    """ReadManager seam: counts fetches to verify buffering."""

    def __init__(self, batch):
        self.batch = batch
        self.calls = []

    def fetch(self, contig, begin, end):
        self.calls.append((contig, begin, end))
        return {"S1": self.batch.overlapping(begin, end)}


def test_buffered_read_pipe_prefetches_hinted_runs():
    ref = "ACGTACGTAC" * 50
    reads = [(b, "50M", ref[b:b + 50], [35] * 50, 60, 0)
             for b in range(0, 400, 20)]
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    mgr = _FakeManager(batch)
    pipe = BufferedReadPipe(mgr, ReadPipe(), max_fetch_size=5000, pad=100)
    pipe.hint([("chr1", 0, 200), ("chr1", 250, 400)])
    a = pipe.fetch("chr1", 0, 100)
    b = pipe.fetch("chr1", 120, 200)
    c = pipe.fetch("chr1", 300, 380)
    assert len(mgr.calls) == 1, "hinted nearby regions should share one fetch"
    assert len(a["S1"]) > 0 and len(b["S1"]) > 0
    assert all(len(v.begins) >= 0 for v in c.values())
    # fetch outside the buffer refills
    pipe.fetch("chr1", 4900, 4950)
    assert len(mgr.calls) == 2
