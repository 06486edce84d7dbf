"""CRAM 3.0 container support: varints, codecs, rANS, writer/reader
round-trips, .crai region queries, ReadManager integration."""

import gzip

import numpy as np
import pytest

from octopus_tpu.basics.reads import FLAG_PAIRED, FLAG_REVERSE, make_read_batch
from octopus_tpu.io import rans
from octopus_tpu.io.cram import (BitReader, BitWriter, CramFile, Encoding,
                                 parse_encoding, read_itf8, read_ltf8,
                                 write_itf8, write_ltf8)
from octopus_tpu.io.cram_writer import CramWriter
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.io.read_manager import ReadManager


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def test_itf8_roundtrip():
    for v in [0, 1, 127, 128, 255, 16383, 16384, (1 << 21) - 1, 1 << 21,
              (1 << 28) - 1, 1 << 28, (1 << 31) - 1, -1, -2]:
        data = write_itf8(v)
        got, off = read_itf8(data, 0)
        assert got == v, v
        assert off == len(data)


def test_ltf8_roundtrip():
    for v in [0, 1, 127, 128, (1 << 14) - 1, 1 << 14, (1 << 28), (1 << 35),
              (1 << 49), (1 << 56) - 1, 1 << 56, (1 << 62), -1]:
        data = write_ltf8(v)
        got, off = read_ltf8(data, 0)
        assert got == v, v
        assert off == len(data)


def test_rans_roundtrip_orders():
    rng = np.random.default_rng(3)
    for d in [b"", b"Q" * 1000,
              bytes(rng.choice([30, 35, 37, 40], 3000).astype(np.uint8)),
              bytes(rng.integers(0, 256, 777, dtype=np.uint8))]:
        for order in (0, 1):
            assert rans.uncompress(rans.compress(d, order)) == d


def test_core_codecs_decode():
    # beta: value 5 with offset 2 in 4 bits -> stores 7
    w = BitWriter()
    w.write(7, 4)
    assert Encoding(6, offset=2, nbits=4).decode_int(BitReader(w.getvalue()), {}) == 5
    # gamma: value 5, offset 0 -> 101 in binary: 2 leading zeros + '101'
    w = BitWriter()
    w.write(0, 2)       # two zero bits
    w.write(5, 3)       # leading 1 + 2 payload bits
    assert Encoding(9, offset=0).decode_int(BitReader(w.getvalue()), {}) == 5
    # subexp: k=2, u=0 -> 2-bit value
    w = BitWriter()
    w.write(0, 1)       # unary terminator
    w.write(3, 2)
    assert Encoding(7, offset=0, k=2).decode_int(BitReader(w.getvalue()), {}) == 3
    # huffman canonical, two symbols length 1 each
    enc = Encoding(3, values=[10, 20], lengths=[1, 1])
    w = BitWriter()
    w.write(0, 1)
    w.write(1, 1)
    r = BitReader(w.getvalue())
    assert enc.decode_int(r, {}) == 10
    assert enc.decode_int(r, {}) == 20
    # zero-bit constant huffman consumes nothing
    const = Encoding(3, values=[42], lengths=[0])
    assert const.decode_int(BitReader(b""), {}) == 42


def test_encoding_serialise_parse_roundtrip():
    for enc in [Encoding(1, content_id=7),
                Encoding(3, values=[1, 2, 3], lengths=[1, 2, 2]),
                Encoding(5, content_id=9, stop=0),
                Encoding(6, offset=1, nbits=8),
                Encoding(4, len_enc=Encoding(1, content_id=3),
                         val_enc=Encoding(1, content_id=4))]:
        data = enc.serialise()
        got, off = parse_encoding(data, 0)
        assert off == len(data)
        assert got.codec == enc.codec
        assert got.content_id == enc.content_id
        assert got.values == enc.values and got.lengths == enc.lengths


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.fixture
def genome():
    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 5000))
    return ReferenceGenome(InMemoryReference({"chr1": seq, "chr2": seq[:2000]})), seq


def _make_reads(seq, n=40, read_len=80, seed=2):
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(n):
        b = int(rng.integers(0, len(seq) - read_len - 20))
        if i % 5 == 0:
            # SNV mid-read
            s = list(seq[b:b + read_len])
            s[33] = "T" if s[33] != "T" else "A"
            reads.append((b, f"{read_len}M", "".join(s), [35] * read_len, 58,
                          FLAG_PAIRED | (FLAG_REVERSE if i % 2 else 0)))
        elif i % 5 == 1:
            # 3bp deletion after 40M
            s = seq[b:b + 40] + seq[b + 43:b + 43 + (read_len - 40)]
            reads.append((b, f"40M3D{read_len - 40}M", s, [30] * read_len, 60, 0))
        elif i % 5 == 2:
            # 4bp insertion
            s = seq[b:b + 30] + "ACGT" + seq[b + 30:b + 30 + (read_len - 34)]
            reads.append((b, f"30M4I{read_len - 34}M", s,
                          list(range(20, 20 + read_len)), 60, 0))
        elif i % 5 == 3:
            # soft clips both sides
            s = "TTTT" + seq[b:b + read_len - 8] + "GGGG"
            reads.append((b, f"4S{read_len - 8}M4S", s, [37] * read_len, 41, 0))
        else:
            reads.append((b, f"{read_len}M", seq[b:b + read_len],
                          [25] * read_len, 60, 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def _assert_batches_equal(a, b, names=False):
    assert len(a) == len(b)
    assert np.array_equal(a.begins, b.begins)
    assert np.array_equal(a.ends, b.ends)
    assert np.array_equal(a.mapq, b.mapq)
    assert np.array_equal(a.flags, b.flags)
    assert np.array_equal(a.seq, b.seq)
    assert np.array_equal(a.quals, b.quals)
    assert np.array_equal(a.seq_offsets, b.seq_offsets)
    assert np.array_equal(a.cigar_ops, b.cigar_ops)


def test_cram_roundtrip_with_reference(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq)
    path = str(tmp_path / "t.cram")
    with CramWriter(path, ["chr1", "chr2"], [5000, 2000], samples=["S1"],
                    reference=ref) as w:
        w.write_batch(batch, sample="S1")
    cf = CramFile(path, reference=ref)
    assert cf.samples() == ["S1"]
    assert cf.header.ref_names == ["chr1", "chr2"]
    got = cf.fetch("chr1", 0, 5000)["S1"]
    _assert_batches_equal(batch, got)
    cf.close()


def test_cram_roundtrip_embedded_reference(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq, n=25, seed=5)
    path = str(tmp_path / "e.cram")
    with CramWriter(path, ["chr1", "chr2"], [5000, 2000], samples=["S1"],
                    reference=ref, embed_reference=True) as w:
        w.write_batch(batch, sample="S1")
    # no reference passed to the reader: embedded ref must be used
    got = CramFile(path).fetch("chr1", 0, 5000)["S1"]
    _assert_batches_equal(batch, got)


def test_cram_requires_reference_when_not_embedded(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq, n=5)
    path = str(tmp_path / "r.cram")
    with CramWriter(path, ["chr1"], [5000], samples=["S1"], reference=ref) as w:
        w.write_batch(batch, sample="S1")
    with pytest.raises(ValueError, match="reference"):
        CramFile(path).fetch("chr1", 0, 5000)


def test_cram_crai_region_query(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq, n=60, seed=9)
    path = str(tmp_path / "q.cram")
    with CramWriter(path, ["chr1", "chr2"], [5000, 2000], samples=["S1"],
                    reference=ref, records_per_slice=20) as w:
        w.write_batch(batch, sample="S1")
    import os
    assert os.path.exists(path + ".crai")
    cf = CramFile(path, reference=ref)
    assert cf._crai is not None and len(cf._crai) == 3
    lo, hi = 1000, 1400
    got = cf.fetch("chr1", lo, hi)["S1"]
    want = batch.overlapping(lo, hi)
    _assert_batches_equal(want, got)
    # full-scan path (no index) must agree
    os.remove(path + ".crai")
    cf2 = CramFile(path, reference=ref)
    got2 = cf2.fetch("chr1", lo, hi)["S1"]
    _assert_batches_equal(want, got2)


def test_cram_multi_sample_routing(tmp_path, genome):
    ref, seq = genome
    b1 = _make_reads(seq, n=10, seed=1)
    b2 = _make_reads(seq, n=8, seed=2)
    path = str(tmp_path / "m.cram")
    with CramWriter(path, ["chr1", "chr2"], [5000, 2000],
                    samples=["SA", "SB"], reference=ref) as w:
        w.write_batch(b1, sample="SA")
        w.write_batch(b2, sample="SB")
    got = CramFile(path, reference=ref).fetch("chr1", 0, 5000)
    assert len(got["SA"]) == 10 and len(got["SB"]) == 8
    _assert_batches_equal(b1, got["SA"])
    _assert_batches_equal(b2, got["SB"])


def test_read_manager_cram(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq, n=12, seed=4)
    path = str(tmp_path / "rm.cram")
    with CramWriter(path, ["chr1", "chr2"], [5000, 2000], samples=["S1"],
                    reference=ref) as w:
        w.write_batch(batch, sample="S1")
    mgr = ReadManager([path], reference=ref)
    assert mgr.samples() == ["S1"]
    got = mgr.fetch("chr1", 0, 5000)["S1"]
    _assert_batches_equal(batch, got)
    # budgeting degrades gracefully without a BAI
    assert mgr.find_covered_subregion("chr1", 0, 5000, 10) == (0, 5000)
    mgr.close()


def test_cram_names_and_quals_roundtrip(tmp_path, genome):
    ref, seq = genome
    batch = _make_reads(seq, n=6, seed=8)
    batch.names = [f"r{i:03d}/1" for i in range(len(batch))]
    path = str(tmp_path / "n.cram")
    with CramWriter(path, ["chr1"], [5000], samples=["S1"], reference=ref) as w:
        w.write_batch(batch, sample="S1")
    got = CramFile(path, reference=ref).fetch("chr1", 0, 5000,
                                              keep_names=True)["S1"]
    assert got.names == batch.names


def test_cram_end_to_end_calling_matches_bam(tmp_path):
    """Calling from a .cram must produce the identical VCF as from .bam."""
    from octopus_tpu.cli import build_parser
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from octopus_tpu.io.fasta import IndexedFasta
    from octopus_tpu.io.vcf import VcfReader
    from octopus_tpu.run import run_calling

    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    het, hom = [500, 1500], [1000]
    hapA, hapB = list(seq), list(seq)
    for p in het:
        hapA[p] = "T" if seq[p] != "T" else "A"
    for p in hom:
        alt = "G" if seq[p] != "G" else "C"
        hapA[p] = alt
        hapB[p] = alt
    haps = ["".join(hapA), "".join(hapB)]
    reads = []
    for i in range(400):
        hap = haps[i % 2]
        b = int(rng.integers(0, len(hap) - 100))
        reads.append((b, "100M", hap[b:b + 100], [37] * 100, 60,
                      FLAG_REVERSE if i % 3 == 0 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam = tmp_path / "s.bam"
    with BamWriter(str(bam), ["chr1"], [len(seq)], samples=["NA1"]) as w:
        w.write_batch(batch, sample="NA1")
    build_bai(str(bam))
    ref = ReferenceGenome(IndexedFasta(str(fa)))
    cram = tmp_path / "s.cram"
    with CramWriter(str(cram), ["chr1"], [len(seq)], samples=["NA1"],
                    reference=ref) as w:
        w.write_batch(batch, sample="NA1")
    parser = build_parser()
    outs = []
    for src, out_name in [(bam, "b.vcf"), (cram, "c.vcf")]:
        out = tmp_path / out_name
        args = parser.parse_args(["-R", str(fa), "-I", str(src),
                                  "-o", str(out), "-T", "chr1"])
        assert run_calling(args) == 0
        outs.append([(r.chrom, r.pos, r.ref, tuple(r.alts), round(r.qual, 2),
                      r.sample_values[0]["GT"])
                     for r in VcfReader(str(out))])
    assert outs[0] == outs[1]
    assert {r[1] - 1 for r in outs[0]} == set(het) | set(hom)
