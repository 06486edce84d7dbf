"""Synthetic read/reference simulation for benchmarks, tests, and training.

The reference evaluates accuracy against external GIAB/syndip truth sets
(scripts/forest.smk, website/docs/tutorials); this environment has no
network, so benchmarks and forest training run on simulated samples: a
random reference, truth variants at human-like rates, and error-bearing
reads with exact CIGARs derived from the simulated haplotype structure.
"""

from __future__ import annotations

import os

import numpy as np


def flatten_haplotype(hap_pieces):
    """(flat sequence string, ref coordinate per flat base; -1 = inserted).

    hap_pieces: one string per reference base — "" for a deleted base,
    base+insertion for an insertion anchored at that base.
    """
    chars, refc = [], []
    for ref_i, piece in enumerate(hap_pieces):
        for k, ch in enumerate(piece):
            chars.append(ch)
            refc.append(ref_i if k == 0 else -1)
    return "".join(chars), np.asarray(refc)


def read_from_flat(hap, refc, begin, read_len, rng, err=0.001):
    """One read tuple (pos, cigar, seq) or None (fully-inserted span)."""
    s = list(hap[begin:begin + read_len])
    for j in range(read_len):
        if rng.random() < err:
            s[j] = "ACGT"[rng.integers(0, 4)]
    rc = refc[begin:begin + read_len]
    aligned = np.flatnonzero(rc >= 0)
    if not len(aligned):
        return None
    lead_ins = int(aligned[0])
    cig, last_ref, run_m = [], None, 0
    if lead_ins:
        cig.append(f"{lead_ins}S")
    for j in range(lead_ins, read_len):
        if rc[j] < 0:
            if run_m:
                cig.append(f"{run_m}M"); run_m = 0
            if cig and cig[-1].endswith("I"):
                cig[-1] = f"{int(cig[-1][:-1]) + 1}I"
            else:
                cig.append("1I")
        else:
            if last_ref is not None and rc[j] > last_ref + 1:
                if run_m:
                    cig.append(f"{run_m}M"); run_m = 0
                cig.append(f"{int(rc[j] - last_ref - 1)}D")
            run_m += 1
            last_ref = int(rc[j])
    if run_m:
        cig.append(f"{run_m}M")
    if cig and cig[-1].endswith("I"):
        cig[-1] = cig[-1][:-1] + "S"
    return (int(rc[aligned[0]]), "".join(cig), "".join(s))


def write_reference(tmp, seq, name="chr1"):
    fa = os.path.join(tmp, "ref.fa")
    with open(fa, "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i:i + 70] + "\n")
    return fa


def write_sample_bam(tmp, name, hap_pieces_pair, n_ref, depth, read_len, rng,
                     contig="chr1", err=0.001):
    """Simulate a diploid sample from two haplotype piece-lists -> BAM path."""
    from ..basics.reads import make_read_batch, FLAG_REVERSE
    from ..io.bam_writer import BamWriter, build_bai
    flats = [flatten_haplotype(h) for h in hap_pieces_pair]
    n_reads = int(n_ref * depth / read_len)
    reads = []
    for i in range(n_reads):
        hap, refc = flats[i % 2]
        if len(hap) <= read_len:
            continue
        begin = int(rng.integers(0, len(hap) - read_len))
        r = read_from_flat(hap, refc, begin, read_len, rng, err=err)
        if r is None:
            continue
        pos, cig, s = r
        reads.append((pos, cig, s, [37] * read_len, 60,
                      FLAG_REVERSE if rng.random() < 0.5 else 0))
    batch = make_read_batch(contig, reads).sorted_by_begin()
    bam = os.path.join(tmp, f"{name}.bam")
    with BamWriter(bam, [contig], [n_ref], samples=[name]) as w:
        w.write_batch(batch, sample=name)
    build_bai(bam)
    return bam


def random_sequence(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, n))


def random_variant(rng, seq, pos, p_indel=0.15, max_indel=6):
    """('snv', alt) | ('del', size) | ('ins', seq) at pos."""
    if rng.random() < p_indel:
        size = int(rng.integers(1, max_indel))
        if rng.random() < 0.5:
            return ("del", size)
        return ("ins", "".join("ACGT"[c] for c in rng.integers(0, 4, size)))
    base = seq[pos]
    return ("snv", "ACGT"[("ACGT".index(base) + int(rng.integers(1, 4))) % 4])


def apply_variant(haps, pos, kind, members, seq):
    """Apply one variant tuple to the given haplotype piece-lists."""
    for m in members:
        if kind[0] == "snv":
            haps[m][pos] = kind[1]
        elif kind[0] == "del":
            for k in range(kind[1]):
                haps[m][pos + k] = ""
        else:
            haps[m][pos] = seq[pos] + kind[1]


def simulate_diploid(tmp, kb=100, depth=30, read_len=150, seed=11,
                     spacing=(600, 1800), sample="SIM", err=0.001):
    """Reference FASTA + one diploid BAM + truth dict {pos: (kind, zygosity)}."""
    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = random_sequence(rng, n)
    fa = write_reference(tmp, seq)
    truth = {}
    haps = [list(seq), list(seq)]
    pos = 1000
    while pos < n - 1000:
        pos += int(rng.integers(*spacing))
        if pos >= n - 1000:
            break
        hom = rng.random() < 0.4
        members = (0, 1) if hom else (int(rng.random() < 0.5),)
        kind = random_variant(rng, seq, pos)
        truth[pos] = (kind, "hom" if hom else "het")
        apply_variant(haps, pos, kind, members, seq)
    bam = write_sample_bam(tmp, sample, haps, n, depth, read_len, rng, err=err)
    return fa, bam, truth, n


def simulate_tumour_normal(tmp, kb=60, depth=60, seed=7, vaf=0.25,
                           read_len=150, n_somatic=14, err=0.001):
    """Reference + NORMAL/TUMOUR BAMs + (germline dict, somatic dict).

    The tumour mixes a somatic clone (SNVs on haplotype 0) into the normal
    diploid at read fraction 2*vaf, giving expected somatic VAF = vaf."""
    from ..basics.reads import make_read_batch, FLAG_REVERSE
    from ..io.bam_writer import BamWriter, build_bai

    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = random_sequence(rng, n)
    fa = write_reference(tmp, seq)
    normal = [list(seq), list(seq)]
    germline = {}
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(1200, 3000))
        if pos >= n - 1500:
            break
        kind = random_variant(rng, seq, pos)
        hom = rng.random() < 0.3
        apply_variant(normal, pos, kind,
                      (0, 1) if hom else (int(rng.random() < 0.5),), seq)
        germline[pos] = (kind, "hom" if hom else "het")
    clone = [list(normal[0]), list(normal[1])]
    somatic = {}
    for _ in range(n_somatic):
        pos = int(rng.integers(2000, n - 2000))
        if (any(abs(pos - g) < 50 for g in germline)
                or any(abs(pos - s) < 50 for s in somatic)):
            continue
        base = seq[pos]
        alt = "ACGT"[("ACGT".index(base) + 2) % 4]
        clone[0][pos] = alt
        somatic[pos] = (("snv", alt), "som")
    bam_n = write_sample_bam(tmp, "NORMAL", normal, n, depth // 2, read_len,
                             rng, err=err)
    flats_n = [flatten_haplotype(h) for h in normal]
    flats_c = [flatten_haplotype(h) for h in clone]
    n_reads = int(n * depth / read_len)
    reads = []
    for i in range(n_reads):
        hap, refc = (flats_c if rng.random() < 2 * vaf else flats_n)[i % 2]
        begin = int(rng.integers(0, len(hap) - read_len))
        r = read_from_flat(hap, refc, begin, read_len, rng, err=err)
        if r is None:
            continue
        p, cig, s = r
        reads.append((p, cig, s, [37] * read_len, 60,
                      FLAG_REVERSE if rng.random() < 0.5 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam_t = os.path.join(tmp, "TUMOUR.bam")
    with BamWriter(bam_t, ["chr1"], [n], samples=["TUMOUR"]) as w:
        w.write_batch(batch, sample="TUMOUR")
    build_bai(bam_t)
    return fa, bam_n, bam_t, germline, somatic, n


def truth_to_vcf(truth: dict, seq: str, path: str, contig="chr1") -> str:
    """Write a truth dict as a minimal VCF usable for labelling/eval."""
    lines = ["##fileformat=VCFv4.3",
             f"##contig=<ID={contig},length={len(seq)}>",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for pos in sorted(truth):
        kind = truth[pos][0] if isinstance(truth[pos], tuple) else truth[pos]
        if kind[0] == "snv":
            ref, alt, vpos = seq[pos], kind[1], pos + 1
        elif kind[0] == "del":
            ref, alt, vpos = seq[pos - 1:pos + kind[1]], seq[pos - 1], pos
        else:
            ref, alt, vpos = seq[pos], seq[pos] + kind[1], pos + 1
        lines.append(f"{contig}\t{vpos}\t.\t{ref}\t{alt}\t100\tPASS\t.")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


__all__ = [
    "flatten_haplotype", "read_from_flat", "write_reference",
    "write_sample_bam", "random_sequence", "random_variant", "apply_variant",
    "simulate_diploid", "simulate_tumour_normal", "truth_to_vcf",
]
