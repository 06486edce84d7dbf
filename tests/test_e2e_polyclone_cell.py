"""CLI-level end-to-end runs for the polyclone and cell callers.

Pins the round-5 measured behaviour (bench_e2e_multi polyclone/cell rows):
the last two of the six callers driven file-to-file through the CLI with
accuracy asserted against simulated truth.  Reference behaviours:
polyclone_caller.cpp:92-110 (clonality k-sweep over haploid clones),
cell_caller.cpp:103-135 + single_cell_model.hpp:27-142 (phylogeny
posteriors over single cells with allelic dropout).
"""

import os

import numpy as np
import pytest

from octopus_tpu.basics.reads import FLAG_REVERSE, make_read_batch
from octopus_tpu.cli import build_parser
from octopus_tpu.io.bam_writer import BamWriter, build_bai
from octopus_tpu.io.vcf import VcfReader
from octopus_tpu.run import run_calling
from octopus_tpu.utils.synthetic import (
    flatten_haplotype, read_from_flat, write_reference)


def _sim_reads(flats, weights, n_reads, read_len, rng):
    cum = np.cumsum(weights) / np.sum(weights)
    reads = []
    for _ in range(n_reads):
        hap, refc = flats[int(np.searchsorted(cum, rng.random()))]
        begin = int(rng.integers(0, len(hap) - read_len))
        r = read_from_flat(hap, refc, begin, read_len, rng)
        if r is None:
            continue
        p, cig, s = r
        reads.append((p, cig, s, [37] * read_len, 60,
                      FLAG_REVERSE if rng.random() < 0.5 else 0))
    return reads


def _write_bam(tmp, name, reads, n):
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam = os.path.join(tmp, f"{name}.bam")
    with BamWriter(bam, ["chr1"], [n], samples=[name]) as w:
        w.write_batch(batch, sample=name)
    build_bai(bam)
    return bam


def test_polyclone_cli_end_to_end(tmp_path):
    """3 haploid clones at 0.5/0.3/0.2: trunk + private variants recovered,
    including the minor clone's (VAF 0.2)."""
    rng = np.random.default_rng(31)
    n = 12000
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = write_reference(str(tmp_path), seq)
    clones = [[list(seq)] for _ in range(3)]
    trunk = [2000, 6000]
    private = {4000: 0, 8000: 1, 10000: 2}     # pos -> clone
    for p in trunk:
        alt = "T" if seq[p] != "T" else "A"
        for c in clones:
            c[0][p] = alt
    for p, ci in private.items():
        clones[ci][0][p] = "G" if seq[p] != "G" else "C"
    flats = [flatten_haplotype(c[0]) for c in clones]
    reads = _sim_reads(flats, [0.5, 0.3, 0.2], int(n * 100 / 150), 150, rng)
    bam = _write_bam(str(tmp_path), "POOL", reads, n)
    out = str(tmp_path / "poly.vcf")
    args = build_parser().parse_args(
        ["-R", fa, "-I", bam, "-o", out, "-T", "chr1",
         "--caller", "polyclone", "--organism-ploidy", "1",
         "--max-clones", "4"])
    assert run_calling(args) == 0
    called = {r.pos - 1 for r in VcfReader(out).records() if r.alts}
    for p in trunk + list(private):
        assert any(abs(p - c) <= 5 for c in called), f"missed {p}"


def test_cell_cli_end_to_end(tmp_path):
    """6 cells from founder -> somatic clone (3 cells): germline called in
    all cells, somatic flagged SOMATIC with a sane carrier-cell count."""
    rng = np.random.default_rng(37)
    n = 9000
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = write_reference(str(tmp_path), seq)
    founder = [list(seq), list(seq)]
    germ = [2000, 6500]
    for p in germ:
        founder[int(rng.random() < 0.5)][p] = "T" if seq[p] != "T" else "A"
    clone = [list(founder[0]), list(founder[1])]
    som = 4200
    clone[0][som] = "G" if seq[som] != "G" else "C"
    clone_of_cell = [0, 0, 0, 1, 1, 1]
    bams = []
    for ci, cl in enumerate(clone_of_cell):
        haps = founder if cl == 0 else clone
        flats = [flatten_haplotype(h) for h in haps]
        w0 = float(rng.beta(2.0, 2.0))          # allelic dropout bias
        reads = _sim_reads(flats, [w0, 1 - w0], int(n * 15 / 150), 150, rng)
        bams.append(_write_bam(str(tmp_path), f"CELL{ci}", reads, n))
    out = str(tmp_path / "cell.vcf")
    args = build_parser().parse_args(
        ["-R", fa, "-I", *bams, "-o", out, "-T", "chr1",
         "--caller", "cell", "--max-phylogeny-size", "2"])
    assert run_calling(args) == 0
    recs = [r for r in VcfReader(out).records() if r.alts]
    called = {r.pos - 1 for r in recs}
    for p in germ:
        assert any(abs(p - c) <= 5 for c in called), f"missed germline {p}"
    som_recs = [r for r in recs
                if abs(r.pos - 1 - som) <= 5 and r.info.get("SOMATIC")]
    assert som_recs, f"somatic {som} not flagged; called={sorted(called)}"
    cells = som_recs[0].info.get("CELLS")
    assert cells is not None and 1 <= int(cells) <= 5
