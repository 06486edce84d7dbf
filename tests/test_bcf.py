"""BCF 2.2 round trip through our own writer/reader."""

import os
import tempfile

from octopus_tpu.io.vcf import VcfHeader, VcfRecord, VcfReader, VcfWriter


HEADER_LINES = [
    "##fileformat=VCFv4.3",
    "##contig=<ID=chr1,length=100000>",
    "##contig=<ID=chr2,length=50000>",
    "##FILTER=<ID=QUAL10,Description=\"low qual\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
    "##INFO=<ID=MQ,Number=1,Type=Float,Description=\"mapq\">",
    "##INFO=<ID=SOMATIC,Number=0,Type=Flag,Description=\"somatic\">",
    "##INFO=<ID=AC,Number=A,Type=Integer,Description=\"alt counts\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"genotype\">",
    "##FORMAT=<ID=GQ,Number=1,Type=Integer,Description=\"gq\">",
    "##FORMAT=<ID=AF,Number=A,Type=Float,Description=\"af\">",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
]

LINES = [
    "chr1\t101\t.\tA\tT\t312.5\tPASS\tDP=42;MQ=59.8\tGT:GQ\t0|1:99\t0/0:30",
    "chr1\t205\trs7\tCAG\tC,CA\t77\tQUAL10\tDP=11;AC=4,5\tGT:GQ:AF\t1|2:12:0.5,0.25\t0/1:44:0.33,.",
    "chr2\t99\t.\tG\tGTT\t.\tPASS\tSOMATIC;DP=300\tGT\t0/1\t.",
]


def test_bcf_round_trip():
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "x.bcf")
    header = VcfHeader.parse(HEADER_LINES)
    w = VcfWriter(path, header)
    for line in LINES:
        w.write(VcfRecord.parse(line))
    w.close()
    # the payload must be detected as BCF regardless of extension
    r = VcfReader(path)
    assert r.header.samples == ["S1", "S2"]
    recs = r.records()
    assert len(recs) == 3
    a, b, c = recs
    assert (a.chrom, a.pos, a.ref, a.alts) == ("chr1", 101, "A", ["T"])
    assert a.qual == 312.5
    assert a.filters == ["PASS"]
    assert a.info["DP"] == "42"
    assert abs(float(a.info["MQ"]) - 59.8) < 1e-4
    assert a.sample_values[0]["GT"] == "0|1"
    assert a.sample_values[0]["GQ"] == "99"
    assert a.sample_values[1]["GT"] == "0/0"
    assert (b.chrom, b.pos, b.ref, b.alts) == ("chr1", 205, "CAG", ["C", "CA"])
    assert b.id == "rs7"
    assert b.filters == ["QUAL10"]
    assert b.info["AC"] == "4,5"
    assert b.sample_values[0]["GT"] == "1|2"
    af = [float(x) for x in b.sample_values[0]["AF"].split(",")]
    assert abs(af[0] - 0.5) < 1e-6 and abs(af[1] - 0.25) < 1e-6
    assert c.qual is None
    assert c.info.get("SOMATIC") is True
    assert c.info["DP"] == "300"
    assert c.sample_values[0]["GT"] == "0/1"


def test_cli_bcf_output():
    """The calling pipeline can emit BCF directly (-o out.bcf)."""
    import numpy as np
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.cli import build_parser
    from octopus_tpu.run import run_calling

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 6000))
    fa = os.path.join(tmp, "ref.fa")
    open(fa, "w").write(">chr1\n" + seq + "\n")
    hap = list(seq)
    hap[3000] = "A" if seq[3000] != "A" else "C"
    hap = "".join(hap)
    reads = []
    for i in range(1200):
        b = int(rng.integers(0, 5800))
        src = hap if i % 2 else seq
        reads.append((b, "150M", src[b:b + 150], [37] * 150, 60,
                      16 if rng.random() < 0.5 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam = os.path.join(tmp, "r.bam")
    with BamWriter(bam, ["chr1"], [6000], samples=["S"]) as w:
        w.write_batch(batch, sample="S")
    build_bai(bam)
    out = os.path.join(tmp, "o.bcf")
    args = build_parser().parse_args(["-R", fa, "-I", bam, "-o", out])
    run_calling(args)
    recs = VcfReader(out).records()
    assert any(r.pos == 3001 and r.filters == ["PASS"] for r in recs), \
        [(r.pos, r.filters) for r in recs]


def test_bcf_qual_reserialises_exactly(tmp_path):
    """QUAL is stored as float32 in BCF; re-serialising must print the
    shortest faithful decimal (289.22), not the float64 expansion
    (289.2200012207) — caught round-tripping a 52k-record chr20-scale call
    set (round-5 probe)."""
    from octopus_tpu.io.vcf import VcfHeader, VcfRecord
    from octopus_tpu.io.bcf import BcfReader, BcfWriter

    header = VcfHeader(contigs=[("chr1", 1000)], samples=["S"])
    header.add_format("GT", "1", "String", "gt")
    rec = VcfRecord(chrom="chr1", pos=10, id=".", ref="A", alts=["T"],
                    qual=289.22, filters=["PASS"], info={},
                    format_keys=["GT"], sample_values=[{"GT": "0/1"}])
    p = tmp_path / "x.bcf"
    w = BcfWriter(str(p), header)
    w.write(rec)
    w.close()
    back = BcfReader(str(p)).records()
    assert len(back) == 1
    assert back[0].to_line() == rec.to_line()
    assert "289.22\t" in back[0].to_line()
