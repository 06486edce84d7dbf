import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import decode_sequence, encode_sequence
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.vargen.assembler import (
    LocalReassembler, AssemblerOptions, DeBruijnGraph, global_align,
    variants_from_alignment)


def make_ref(seed=0, n=500):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


class TestGlobalAligner:
    def test_simple_snv(self):
        a = encode_sequence("ACGTACGT")
        b = encode_sequence("ACGGACGT")
        ops = global_align(a, b)
        assert ops == [(8, "M")]
        vs = variants_from_alignment(100, a, b, ops, 100)
        assert len(vs) == 1 and vs[0].begin == 103 and vs[0].is_snv()

    def test_deletion(self):
        a = encode_sequence("ACGTTTACGT")
        b = encode_sequence("ACGTACGT")
        ops = global_align(a, b)
        vs = variants_from_alignment(0, a, b, ops, 100)
        dels = [v for v in vs if v.is_deletion()]
        assert len(dels) == 1 and dels[0].indel_size() == 2

    def test_insertion(self):
        a = encode_sequence("ACGTACGT")
        b = encode_sequence("ACGTGGACGT")
        ops = global_align(a, b)
        vs = variants_from_alignment(0, a, b, ops, 100)
        ins = [v for v in vs if v.is_insertion()]
        assert len(ins) == 1 and ins[0].indel_size() == 2


class TestReassembler:
    def _reads_from(self, hap, n=30, read_len=80, seed=1, muts=0.0):
        rng = np.random.default_rng(seed)
        reads = []
        for i in range(n):
            begin = int(rng.integers(0, len(hap) - read_len))
            reads.append((begin, f"{read_len}M", hap[begin:begin + read_len],
                          [35] * read_len, 60, FLAG_REVERSE if i % 3 == 0 else 0))
        return reads

    def test_finds_deletion_missing_from_alignments(self):
        """A 12 bp deletion visible only through assembly (reads presented
        as soft-clipped fragments so the cigar scanner can't see it)."""
        ref, seq = make_ref(seed=2)
        deleted = seq[:250] + seq[262:]
        # reads drawn from the deleted haplotype but with cigars that claim
        # pure matches on their mapped prefix (mapper-style representation)
        rng = np.random.default_rng(3)
        reads = []
        for i in range(40):
            # spans chosen so reads cross the junction with >= k context
            begin = int(rng.integers(170, 245))
            s = deleted[begin:begin + 80]
            reads.append((begin, "80M", s, [35] * 80, 60, 0))
        # also clean coverage from the ref haplotype
        for i in range(20):
            begin = int(rng.integers(150, 300))
            s = seq[begin:begin + 80]
            reads.append((begin, "80M", s, [35] * 80, 60, FLAG_REVERSE))
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        asm = LocalReassembler(ref, "chr1", AssemblerOptions(min_kmer_observations=2))
        variants = asm.generate(batch, 100, 400)
        dels = [v for v in variants if v.is_deletion() and v.indel_size() == 12]
        assert dels, [str(v) for v in variants]

    def test_clean_reads_no_candidates(self):
        ref, seq = make_ref(seed=4)
        batch = make_read_batch("chr1", self._reads_from(seq, n=40)).sorted_by_begin()
        asm = LocalReassembler(ref, "chr1", AssemblerOptions(min_kmer_observations=2))
        assert asm.generate(batch, 0, 500) == []

    def test_clustered_snvs_found(self):
        """Clustered SNVs trigger assembly (the reference's default triggers
        are indel+clustered; an isolated SNV is the pileup scanner's job and
        does not gate in the assembler, assembler_active_region_generator.hpp)."""
        ref, seq = make_ref(seed=5)
        alt = "T" if seq[250] != "T" else "A"
        alt2 = "G" if seq[262] != "G" else "C"
        hap = seq[:250] + alt + seq[251:262] + alt2 + seq[263:]
        batch = make_read_batch("chr1", self._reads_from(hap, n=40, seed=6)).sorted_by_begin()
        asm = LocalReassembler(ref, "chr1", AssemblerOptions(min_kmer_observations=2))
        variants = asm.generate(batch, 0, 500)
        assert any(v.is_snv() and v.begin == 250 for v in variants)
        assert any(v.is_snv() and v.begin == 262 for v in variants)


def test_assembler_deletion_called_end_to_end():
    """Deletion reachable only by assembly flows through the caller."""
    from octopus_tpu.core.callers.individual import IndividualCaller, CallerConfig
    ref, seq = make_ref(seed=9)
    deleted = seq[:250] + seq[258:]   # 8bp deletion
    rng = np.random.default_rng(10)
    reads = []
    for i in range(50):
        begin = int(rng.integers(150, 245))
        s = deleted[begin:begin + 80]
        reads.append((begin, "80M", s, [35] * 80, 60, FLAG_REVERSE if i % 2 else 0))
    for i in range(50):
        begin = int(rng.integers(150, 320))
        s = seq[begin:begin + 80]
        reads.append((begin, "80M", s, [35] * 80, 60, FLAG_REVERSE if i % 2 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    cfg = CallerConfig(use_device=False, use_assembler=True)
    cfg.assembler.min_kmer_observations = 2
    caller = IndividualCaller(ref, "chr1", cfg)
    calls = caller.call(100, 400, batch)
    dels = [c for c in calls if any(v.is_deletion() and v.indel_size() == 8
                                    for v in c.alts)]
    assert dels, [(c.begin, [str(v) for v in c.alts]) for c in calls]
    assert sorted(dels[0].genotypes[0]) == [0, 1]


def test_native_bubbles_match_python():
    """The C++ extract_bubbles is bit-identical to the python DeBruijnGraph
    (same graph semantics, same insertion-order + FIFO tie-breaking)."""
    from octopus_tpu import _native
    from octopus_tpu.core.vargen.assembler import DeBruijnGraph

    rng = np.random.default_rng(123)
    for trial in range(60):
        n_ref = int(rng.integers(60, 400))
        ref = rng.integers(0, 4, n_ref).astype(np.uint8)
        # two haplotypes: ref and a mutated copy (SNVs + an indel)
        hap = ref.copy()
        for _ in range(int(rng.integers(1, 6))):
            p = int(rng.integers(5, n_ref - 5))
            hap[p] = (hap[p] + int(rng.integers(1, 4))) % 4
        if rng.random() < 0.5 and n_ref > 60:
            cut = int(rng.integers(20, n_ref - 30))
            hap = np.concatenate([hap[:cut], hap[cut + int(rng.integers(1, 6)):]])
        reads = []
        for _ in range(int(rng.integers(5, 60))):
            src = hap if rng.random() < 0.5 else ref
            if len(src) < 30:
                continue
            b = int(rng.integers(0, len(src) - 25))
            r = src[b:b + int(rng.integers(20, min(80, len(src) - b) + 1))].copy()
            # sprinkle masked bases and errors
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(0, len(r)))] = 4
            reads.append(r.tobytes())
        ref_bytes = ref.tobytes()
        for k in (7, 10, 15):
            min_w = int(rng.integers(1, 3))
            max_b = int(rng.integers(3, 40))
            min_s = float(rng.integers(1, 3))
            max_ext = int(rng.integers(20, 200))
            max_steps = int(rng.integers(50, 5000))
            g = DeBruijnGraph(k)
            g.insert_reference(ref_bytes)
            if g.valid:
                for s in reads:
                    g.insert_read(s)
                g.prune(min_w)
                expect = g.extract_bubbles(max_b, min_s, max_ext, max_steps)
            else:
                expect = None
            got = _native.extract_bubbles(ref_bytes, list(reads), k, min_w,
                                          max_b, min_s, max_ext, max_steps)
            assert got == expect, (trial, k, got, expect)
