"""Tabix index round trip: build .tbi for a bgzipped VCF and query it."""

import os
import struct
import tempfile
import zlib

import numpy as np

from octopus_tpu.io.vcf import VcfHeader, VcfRecord, VcfWriter, VcfReader
from octopus_tpu.io.tabix import index_vcf, _reg2bin
from octopus_tpu.io.bgzf import BgzfReader


def _make_vcf_gz(path, n=500, contigs=("chr1", "chr2")):
    header = VcfHeader.parse([
        "##fileformat=VCFv4.3",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ])
    rng = np.random.default_rng(1)
    w = VcfWriter(path, header)
    truth = []
    for contig in contigs:
        pos = 0
        for _ in range(n):
            pos += int(rng.integers(50, 2000))
            rec = VcfRecord.parse(
                f"{contig}\t{pos + 1}\t.\tA\tT\t50\tPASS\t.")
            w.write(rec)
            truth.append((contig, pos))
    w.close()
    return truth


def _read_tbi(path):
    raw = b""
    r = BgzfReader(path)
    coff = 0
    while True:
        data, bsize = r._read_block(coff)
        if bsize == 0:
            break
        raw += data
        coff += bsize
    assert raw[:4] == b"TBI\x01"
    off = 4
    n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm = struct.unpack_from("<8i", raw, off)
    off += 32
    names = raw[off:off + l_nm].split(b"\x00")[:-1]
    off += l_nm
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", raw, off); off += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", raw, off); off += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", raw, off); off += 16
                chunks.append((cb, ce))
            bins[b] = chunks
        (n_intv,) = struct.unpack_from("<i", raw, off); off += 4
        intv = struct.unpack_from(f"<{n_intv}Q", raw, off); off += 8 * n_intv
        refs.append((bins, intv))
    return fmt, names, refs


def test_tabix_build_and_query():
    tmp = tempfile.mkdtemp()
    vcf = os.path.join(tmp, "x.vcf.gz")
    truth = _make_vcf_gz(vcf)
    tbi = index_vcf(vcf)
    fmt, names, refs = _read_tbi(tbi)
    assert fmt == 2
    assert names == [b"chr1", b"chr2"]
    # query: find a middle record of chr2 through its bin chunks
    contig, pos = truth[len(truth) - 200]
    rid = names.index(contig.encode())
    bins, intv = refs[rid]
    b = _reg2bin(pos, pos + 1)
    # walk up the bin hierarchy collecting candidate chunks
    cand = []
    for bb in {b, 0, 1 + (pos >> 26), 9 + (pos >> 23), 73 + (pos >> 20),
               585 + (pos >> 17), 4681 + (pos >> 14)}:
        cand += bins.get(bb, [])
    assert cand, "no chunks for the record's bins"
    r = BgzfReader(vcf)
    found = False
    for cb, ce in cand:
        data = r.read_range(cb, ce) if hasattr(r, "read_range") else r._read_range_native(cb, ce)
        for line in data.split(b"\n"):
            f = line.split(b"\t")
            if len(f) > 3 and f[0] == contig.encode() and int(f[1]) == pos + 1:
                found = True
    assert found
    # every record reachable: all chunks across bins cover n lines
    reader = VcfReader(vcf)
    assert len(reader.records()) == len(truth)
