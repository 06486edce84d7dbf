"""End-to-end accuracy benchmarks for the multi-sample callers.

Synthetic BAM(s) -> CLI -> VCF for the remaining BASELINE benchmark config
families (BASELINE.md): population (3-sample joint germline), trio (de novo
detection with -M/-F), and cancer (tumour-normal somatic calling with
--normal-sample).

Usage: python bench_e2e_multi.py [trio|cancer|population|all] [kb=100] [depth=30]
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

from bench_e2e import flatten_haplotype, write_reference, write_sample_bam


def _mutate(haps, pos, kind, members, seq):
    for m in members:
        if kind[0] == "snv":
            haps[m][pos] = kind[1]
        elif kind[0] == "del":
            for k in range(kind[1]):
                haps[m][pos + k] = ""
        else:
            haps[m][pos] = seq[pos] + kind[1]


def _random_variant(rng, seq, pos):
    if rng.random() < 0.15:
        size = int(rng.integers(1, 6))
        if rng.random() < 0.5:
            return ("del", size)
        return ("ins", "".join("ACGT"[c] for c in rng.integers(0, 4, size)))
    base = seq[pos]
    return ("snv", "ACGT"[("ACGT".index(base) + int(rng.integers(1, 4))) % 4])


def _make_seq(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, n))


COMPILES = {"n": 0, "secs": 0.0}     # process-wide XLA compile accounting


def _install_compile_counter():
    """Count every fresh XLA executable + its compile seconds
    (jax_log_compiles emits one line per compile on jax._src.dispatch).
    Lets each bench report how much of its wall was one-time compilation."""
    import logging
    import re

    import jax
    jax.config.update("jax_log_compiles", True)

    class _H(logging.Handler):
        def emit(self, r):
            msg = r.getMessage()
            if "Finished XLA compilation of" in msg:
                COMPILES["n"] += 1
                m = re.search(r"in ([0-9.]+) sec", msg)
                if m:
                    COMPILES["secs"] += float(m.group(1))

    logger = logging.getLogger("jax._src.dispatch")
    logger.addHandler(_H())
    if logger.level > logging.WARNING or logger.level == 0:
        logger.setLevel(logging.WARNING)


def _run_cli(fa, bams, out, extra, timeout=3600):
    """Drive the real CLI argument path in-process: one process shares the
    per-shape kernel compilations across all benchmark modes (a subprocess
    would re-pay minutes of Mosaic compilation per mode on this host's
    cacheless remote compile service)."""
    from octopus_tpu.cli import build_parser
    from octopus_tpu.run import run_calling
    args = build_parser().parse_args(["-R", fa, "-I", *bams, "-o", out,
                                      "-T", "chr1", "--threads", "4", *extra])
    run_calling(args)


def _pass_records(vcf):
    from octopus_tpu.io.vcf import VcfReader
    return [r for r in VcfReader(vcf).records()
            if r.alts and r.filters == ["PASS"]]


def _all_records(vcf):
    from octopus_tpu.io.vcf import VcfReader
    return [r for r in VcfReader(vcf).records() if r.alts]


def _near(pos_set, p, tol=5):
    return any(abs(p - q) <= tol for q in pos_set)


def bench_trio(kb=100, depth=30, seed=5):
    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = _make_seq(rng, n)
    tmp = tempfile.mkdtemp()
    fa = write_reference(tmp, seq)
    mom = [list(seq), list(seq)]
    dad = [list(seq), list(seq)]
    germline = set()
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(900, 2400))
        if pos >= n - 1500:
            break
        kind = _random_variant(rng, seq, pos)
        carrier = mom if rng.random() < 0.5 else dad
        members = (0, 1) if rng.random() < 0.3 else (int(rng.random() < 0.5),)
        _mutate(carrier, pos, kind, members, seq)
        germline.add(pos)
    # child: haplotype 0 from mom (her hap 0), haplotype 1 from dad (his hap 1)
    kid = [list(mom[0]), list(dad[1])]
    denovo = set()
    for _ in range(10):
        pos = int(rng.integers(2000, n - 2000))
        if _near(germline, pos, 50) or _near(denovo, pos, 50):
            continue
        base = seq[pos]
        alt = "ACGT"[("ACGT".index(base) + 1) % 4]
        kid[int(rng.random() < 0.5)][pos] = alt
        denovo.add(pos)
    bams = [write_sample_bam(tmp, s_, h, n, depth, 150, rng)
            for s_, h in (("MOM", mom), ("DAD", dad), ("KID", kid))]
    out = os.path.join(tmp, "trio.vcf")
    t0 = time.time()
    _run_cli(fa, bams, out, ["-M", "MOM", "-F", "DAD"])
    wall = time.time() - t0
    recs = _pass_records(out)
    dn_called = {r.pos - 1 for r in recs if r.info.get("DENOVO")}
    other_called = {r.pos - 1 for r in recs if not r.info.get("DENOVO")}
    tp = sum(1 for p in denovo if _near(dn_called, p))
    fp = sum(1 for p in dn_called if not _near(denovo, p))
    germ_tp = sum(1 for p in germline if _near(other_called | dn_called, p))
    # pre-filter accounting: the strict default de novo expression
    # (PP >= 40 etc, option_parser.cpp:736-741) is the reference's own
    # gate; the caller-level recall counts every DENOVO-flagged record
    all_dn = {r.pos - 1 for r in _all_records(out) if r.info.get("DENOVO")}
    caller_tp = sum(1 for p in denovo if _near(all_dn, p))
    caller_fp = sum(1 for p in all_dn if not _near(denovo, p))
    from bench_e2e import qual_calibration
    dn_recs = [r for r in _all_records(out) if r.info.get("DENOVO")]
    pp_cal = qual_calibration(dn_recs, {p: None for p in denovo}, field="PP")
    return {
        "metric": "e2e_trio_denovo", "kb": kb, "depth": depth,
        "wall_s": round(wall, 1),
        "n_denovo": len(denovo), "denovo_recall": round(tp / len(denovo), 4),
        "denovo_fp": fp,
        "caller_denovo_recall": round(caller_tp / len(denovo), 4),
        "caller_denovo_fp": caller_fp,
        "germline_recall": round(germ_tp / max(len(germline), 1), 4),
        "denovo_pp_calibration": pp_cal,
    }


def bench_cancer(kb=100, depth=60, seed=7, vaf=0.25):
    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = _make_seq(rng, n)
    tmp = tempfile.mkdtemp()
    fa = write_reference(tmp, seq)
    normal = [list(seq), list(seq)]
    germline = set()
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(1200, 3000))
        if pos >= n - 1500:
            break
        kind = _random_variant(rng, seq, pos)
        _mutate(normal, pos, kind,
                (0, 1) if rng.random() < 0.3 else (int(rng.random() < 0.5),),
                seq)
        germline.add(pos)
    # tumour: clone carrying somatic SNVs on one haplotype, mixed with normal
    clone = [list(normal[0]), list(normal[1])]
    somatic = set()
    for _ in range(14):
        pos = int(rng.integers(2000, n - 2000))
        if _near(germline, pos, 50) or _near(somatic, pos, 50):
            continue
        base = seq[pos]
        clone[0][pos] = "ACGT"[("ACGT".index(base) + 2) % 4]
        somatic.add(pos)
    bam_n = write_sample_bam(tmp, "NORMAL", normal, n, depth // 2, 150, rng)
    # tumour reads: fraction 2*vaf of reads from the clone pair (clone hap 0
    # carries the somatics -> expected somatic VAF = vaf)
    from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from bench_e2e import read_from_flat
    flats_n = [flatten_haplotype(h) for h in normal]
    flats_c = [flatten_haplotype(h) for h in clone]
    n_reads = int(n * depth / 150)
    reads = []
    for i in range(n_reads):
        if rng.random() < 2 * vaf:
            hap, refc = flats_c[i % 2]
        else:
            hap, refc = flats_n[i % 2]
        begin = int(rng.integers(0, len(hap) - 150))
        r = read_from_flat(hap, refc, begin, 150, rng)
        if r is None:
            continue
        p, cig, s = r
        reads.append((p, cig, s, [37] * 150, 60,
                      FLAG_REVERSE if rng.random() < 0.5 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam_t = os.path.join(tmp, "TUMOUR.bam")
    with BamWriter(bam_t, ["chr1"], [n], samples=["TUMOUR"]) as w:
        w.write_batch(batch, sample="TUMOUR")
    build_bai(bam_t)
    out = os.path.join(tmp, "cancer.vcf")
    t0 = time.time()
    _run_cli(fa, [bam_n, bam_t], out, ["--caller", "cancer",
                                       "--normal-sample", "NORMAL"])
    wall = time.time() - t0
    recs = _pass_records(out)
    som_called = {r.pos - 1 for r in recs if r.info.get("SOMATIC")}
    tp = sum(1 for p in somatic if _near(som_called, p))
    fp = sum(1 for p in som_called if not _near(somatic, p))
    from bench_e2e import qual_calibration
    som_recs = [r for r in _all_records(out) if r.info.get("SOMATIC")]
    pp_cal = qual_calibration(som_recs, {p: None for p in somatic}, field="PP")
    return {
        "metric": "e2e_cancer_somatic", "kb": kb, "depth": depth, "vaf": vaf,
        "wall_s": round(wall, 1),
        "n_somatic": len(somatic),
        "somatic_recall": round(tp / len(somatic), 4),
        "somatic_fp": fp,
        "somatic_pp_calibration": pp_cal,
    }


def bench_population(kb=100, depth=30, seed=9, n_samples=3):
    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = _make_seq(rng, n)
    tmp = tempfile.mkdtemp()
    fa = write_reference(tmp, seq)
    samples = [[list(seq), list(seq)] for _ in range(n_samples)]
    truth: dict[int, list[list[int]]] = {}
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(900, 2400))
        if pos >= n - 1500:
            break
        kind = _random_variant(rng, seq, pos)
        af = rng.choice([0.17, 0.33, 0.5, 0.83])
        gts = []
        any_alt = False
        for s_ in range(n_samples):
            gt = [int(rng.random() < af), int(rng.random() < af)]
            if any(gt):
                any_alt = True
            gts.append(gt)
        if not any_alt:
            gts[int(rng.integers(0, n_samples))][0] = 1
        for s_, gt in enumerate(gts):
            members = tuple(h for h in (0, 1) if gt[h])
            if members:
                _mutate(samples[s_], pos, kind, members, seq)
        truth[pos] = gts
    bams = [write_sample_bam(tmp, f"S{i}", h, n, depth, 150, rng)
            for i, h in enumerate(samples)]
    out = os.path.join(tmp, "pop.vcf")
    t0 = time.time()
    _run_cli(fa, bams, out, ["--caller", "population"])
    wall = time.time() - t0
    recs = _pass_records(out)
    called = {r.pos - 1 for r in recs} | {r.pos for r in recs}
    tp = sum(1 for p in truth if _near(called, p))
    fp = sum(1 for r in recs
             if not _near(set(truth), r.pos - 1) and not _near(set(truth), r.pos))
    # genotype concordance at matched sites
    gt_ok = gt_tot = 0
    truth_pos = sorted(truth)
    for r in recs:
        p0 = r.pos - 1
        match = [q for q in truth_pos if abs(q - p0) <= 5]
        if not match:
            continue
        gts = truth[match[0]]
        for s_, sv in enumerate(r.sample_values[:len(gts)]):
            gt_str = sv.get("GT", ".").replace("|", "/")
            try:
                got = sorted(int(x) > 0 for x in gt_str.split("/"))
            except ValueError:
                continue
            gt_tot += 1
            gt_ok += got == sorted(bool(x) for x in gts[s_])
    return {
        "metric": "e2e_population_joint", "kb": kb, "depth": depth,
        "n_samples": n_samples, "wall_s": round(wall, 1),
        "n_truth": len(truth),
        "recall": round(tp / max(len(truth), 1), 4),
        "fp": fp,
        "gt_concordance": round(gt_ok / max(gt_tot, 1), 4),
    }


def bench_polyclone(kb=50, depth=120, seed=13, fractions=(0.5, 0.3, 0.2)):
    """Polyclonal haploid mixture (mixed infection): clones at uneven
    fractions with shared (trunk) and private variants.  Mirrors the
    reference's polyclone use-case (polyclone_caller.cpp:92-110 clonality
    k-sweep); accuracy = trunk + private recall, recovered clone count."""
    from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from bench_e2e import read_from_flat

    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = _make_seq(rng, n)
    tmp = tempfile.mkdtemp()
    fa = write_reference(tmp, seq)
    n_clones = len(fractions)
    clones = [[list(seq)] for _ in range(n_clones)]     # haploid: 1 hap each
    trunk, private = set(), {}                          # pos -> clone idx
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(800, 2000))
        if pos >= n - 1500:
            break
        kind = _random_variant(rng, seq, pos)
        if rng.random() < 0.4:                          # trunk: all clones
            for c in clones:
                _mutate(c, pos, kind, (0,), seq)
            trunk.add(pos)
        else:                                           # private to one clone
            ci = int(rng.integers(0, n_clones))
            _mutate(clones[ci], pos, kind, (0,), seq)
            private[pos] = ci
    flats = [flatten_haplotype(c[0]) for c in clones]
    n_reads = int(n * depth / 150)
    cum = np.cumsum(fractions)
    reads = []
    for _ in range(n_reads):
        ci = int(np.searchsorted(cum, rng.random()))
        hap, refc = flats[min(ci, n_clones - 1)]
        begin = int(rng.integers(0, len(hap) - 150))
        r = read_from_flat(hap, refc, begin, 150, rng)
        if r is None:
            continue
        p, cig, s = r
        reads.append((p, cig, s, [37] * 150, 60,
                      FLAG_REVERSE if rng.random() < 0.5 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    bam = os.path.join(tmp, "POOL.bam")
    with BamWriter(bam, ["chr1"], [n], samples=["POOL"]) as w:
        w.write_batch(batch, sample="POOL")
    build_bai(bam)
    out = os.path.join(tmp, "poly.vcf")
    t0 = time.time()
    _run_cli(fa, [bam], out, ["--caller", "polyclone", "--max-clones", "4",
                              "--organism-ploidy", "1"])
    wall = time.time() - t0
    recs = _all_records(out)
    called = {r.pos - 1 for r in recs} | {r.pos for r in recs}
    trunk_tp = sum(1 for p in trunk if _near(called, p))
    priv_tp = sum(1 for p in private if _near(called, p))
    # recall of the minor clone's private variants (hardest: VAF = min frac)
    minor = [p for p, ci in private.items() if ci == n_clones - 1]
    minor_tp = sum(1 for p in minor if _near(called, p))
    truth_all = trunk | set(private)
    fp = sum(1 for r in recs
             if not _near(truth_all, r.pos - 1) and not _near(truth_all, r.pos))
    clones_info = [r.info.get("CLONES") for r in recs if r.info.get("CLONES")]
    from collections import Counter
    k_mode = Counter(clones_info).most_common(1)[0][0] if clones_info else 0
    return {
        "metric": "e2e_polyclone", "kb": kb, "depth": depth,
        "fractions": list(fractions), "wall_s": round(wall, 1),
        "n_trunk": len(trunk), "n_private": len(private),
        "trunk_recall": round(trunk_tp / max(len(trunk), 1), 4),
        "private_recall": round(priv_tp / max(len(private), 1), 4),
        "minor_clone_recall": round(minor_tp / max(len(minor), 1), 4),
        "fp": fp, "clones_mode": int(k_mode),
    }


def bench_cell(kb=30, n_cells=8, depth=12, seed=17):
    """Single cells from a known clone phylogeny with allelic dropout.
    Phylogeny: founder (germline hets) -> clone A (+somatics) -> clone B
    (+more somatics); cells split across the three clones.  Mirrors the
    reference's CellCaller (cell_caller.cpp:103-135, single_cell_model).
    Accuracy = germline + somatic recall, somatic-cell-count sanity."""
    from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
    from octopus_tpu.io.bam_writer import BamWriter, build_bai
    from bench_e2e import read_from_flat

    rng = np.random.default_rng(seed)
    n = kb * 1000
    seq = _make_seq(rng, n)
    tmp = tempfile.mkdtemp()
    fa = write_reference(tmp, seq)
    founder = [list(seq), list(seq)]
    germline = set()
    pos = 1500
    while pos < n - 1500:
        pos += int(rng.integers(1000, 2500))
        if pos >= n - 1500:
            break
        kind = _random_variant(rng, seq, pos)
        _mutate(founder, pos, kind,
                (0, 1) if rng.random() < 0.3 else (int(rng.random() < 0.5),),
                seq)
        germline.add(pos)
    # clone A: founder + somatic SNVs on hap 0; clone B: A + more somatics
    clone_a = [list(founder[0]), list(founder[1])]
    clone_b = None
    som_a, som_b = set(), set()
    for _ in range(5):
        pos = int(rng.integers(2000, n - 2000))
        if _near(germline, pos, 50) or _near(som_a, pos, 50):
            continue
        clone_a[0][pos] = "ACGT"[("ACGT".index(seq[pos]) + 2) % 4]
        som_a.add(pos)
    clone_b = [list(clone_a[0]), list(clone_a[1])]
    for _ in range(4):
        pos = int(rng.integers(2000, n - 2000))
        if _near(germline | som_a, pos, 50) or _near(som_b, pos, 50):
            continue
        clone_b[0][pos] = "ACGT"[("ACGT".index(seq[pos]) + 1) % 4]
        som_b.add(pos)
    clone_of_cell = ([0] * (n_cells - n_cells // 2 - n_cells // 4)
                     + [1] * (n_cells // 2) + [2] * (n_cells // 4))
    clone_haps = [founder, clone_a, clone_b]
    bams = []
    for ci in range(n_cells):
        haps = clone_haps[clone_of_cell[ci]]
        flats = [flatten_haplotype(h) for h in haps]
        # allelic dropout: per-cell haplotype sampling weights from a
        # Dirichlet (WGA amplification bias) — some cells are mostly one hap
        w0 = float(rng.beta(2.0, 2.0))
        n_reads = int(n * depth / 150)
        reads = []
        for _ in range(n_reads):
            hap, refc = flats[0] if rng.random() < w0 else flats[1]
            begin = int(rng.integers(0, len(hap) - 150))
            r = read_from_flat(hap, refc, begin, 150, rng)
            if r is None:
                continue
            p, cig, s = r
            reads.append((p, cig, s, [37] * 150, 60,
                          FLAG_REVERSE if rng.random() < 0.5 else 0))
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        name = f"CELL{ci}"
        bam = os.path.join(tmp, f"{name}.bam")
        with BamWriter(bam, ["chr1"], [n], samples=[name]) as w:
            w.write_batch(batch, sample=name)
        build_bai(bam)
        bams.append(bam)
    out = os.path.join(tmp, "cell.vcf")
    t0 = time.time()
    _run_cli(fa, bams, out, ["--caller", "cell", "--max-phylogeny-size", "3"])
    wall = time.time() - t0
    recs = _all_records(out)
    som_truth = som_a | som_b
    som_called = {r.pos - 1 for r in recs if r.info.get("SOMATIC")}
    called_all = {r.pos - 1 for r in recs} | {r.pos for r in recs}
    germ_tp = sum(1 for p in germline if _near(called_all, p))
    som_tp = sum(1 for p in som_truth if _near(som_called, p))
    som_tp_any = sum(1 for p in som_truth if _near(called_all, p))
    truth_all = germline | som_truth
    fp = sum(1 for r in recs
             if not _near(truth_all, r.pos - 1) and not _near(truth_all, r.pos))
    # somatic cell-count sanity: CELLS should approximate the number of
    # cells carrying the somatic clone (A+B for som_a, B only for som_b)
    n_a = sum(1 for c in clone_of_cell if c >= 1)
    n_b = sum(1 for c in clone_of_cell if c == 2)
    cells_err = []
    for r in recs:
        if r.info.get("SOMATIC") and r.info.get("CELLS") is not None:
            p = r.pos - 1
            want = n_a if _near(som_a, p) else (n_b if _near(som_b, p) else None)
            if want:
                cells_err.append(abs(int(r.info["CELLS"]) - want))
    return {
        "metric": "e2e_cell_phylogeny", "kb": kb, "n_cells": n_cells,
        "depth": depth, "wall_s": round(wall, 1),
        "n_germline": len(germline), "n_somatic": len(som_truth),
        "germline_recall": round(germ_tp / max(len(germline), 1), 4),
        "somatic_recall": round(som_tp / max(len(som_truth), 1), 4),
        "somatic_called_any": round(som_tp_any / max(len(som_truth), 1), 4),
        "fp": fp,
        "mean_cells_err": round(float(np.mean(cells_err)), 2) if cells_err else None,
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    kb = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/octopus_tpu_jax_cache")
    _install_compile_counter()
    from octopus_tpu.core.likelihood.likelihood_array import warm_kernels
    warm_kernels((150,), pads=(8, 16))
    if mode in ("all", "cancer", "polyclone", "cell"):
        # the VB executable ladder (the run-level warm-up thread only
        # engages on >= 1 Mb runs; these benches are 100 kb)
        from octopus_tpu.core.models.subclone_vb import warm_vb
        warm_vb(max_reads=512, ks=(2, 3), seeds_iters=((2, 40),), max_g=64)
    warm = dict(COMPILES)
    runs = {
        "trio": lambda: bench_trio(kb, depth),
        "cancer": lambda: bench_cancer(kb, max(depth, 60)),
        "population": lambda: bench_population(kb, depth),
        "polyclone": lambda: bench_polyclone(),
        "cell": lambda: bench_cell(),
    }
    for name, fn in runs.items():
        if mode not in ("all", name):
            continue
        before = dict(COMPILES)
        result = fn()
        result["n_compiles"] = COMPILES["n"] - before["n"]
        result["compile_s"] = round(COMPILES["secs"] - before["secs"], 2)
        result["warm_compiles"] = warm["n"]
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
