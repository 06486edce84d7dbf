import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import decode_sequence, encode_sequence
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.vargen import CigarScanner, ScannerOptions


def make_ref(seq="ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" * 5):
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def reads_with_snv(ref_seq, pos, alt_char, n=6, read_len=30, begin0=None, mapq=60):
    """n reads covering pos, each carrying the SNV."""
    reads = []
    for i in range(n):
        begin = (begin0 if begin0 is not None else pos - read_len // 2) - i
        begin = max(0, begin)
        seq = list(ref_seq[begin:begin + read_len])
        seq[pos - begin] = alt_char
        flags = FLAG_REVERSE if i % 2 else 0
        reads.append((begin, f"{read_len}M", "".join(seq), [35] * read_len, mapq, flags))
    return make_read_batch("chr1", reads)


class TestCigarScanner:
    def test_snv_called_with_support(self):
        ref, seq = make_ref()
        batch = reads_with_snv(seq, 50, "T" if seq[50] != "T" else "A")
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, batch)
        variants = sc.generate(0, 200)
        assert len(variants) == 1
        v = variants[0]
        assert v.begin == 50 and v.is_snv()

    def test_lone_low_quality_snv_excluded(self):
        ref, seq = make_ref()
        alt = "T" if seq[50] != "T" else "A"
        reads = [(35, "30M", seq[35:50] + alt + seq[51:65], [10] * 30, 60, 0)]
        # plus clean coverage so depth >= 4
        for i in range(5):
            reads.append((30 + i, "30M", seq[30 + i:60 + i], [35] * 30, 60, 0))
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, make_read_batch("chr1", reads))
        assert sc.generate(0, 200) == []

    def test_insertion_candidate(self):
        ref, seq = make_ref()
        ins = "GG"
        reads = []
        for i in range(6):
            begin = 40 - i
            s = seq[begin:55] + ins + seq[55:begin + 28]
            cigar = f"{55 - begin}M2I{begin + 28 - 55}M"
            reads.append((begin, cigar, s, [35] * len(s), 60, FLAG_REVERSE if i % 2 else 0))
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, make_read_batch("chr1", reads))
        variants = sc.generate(0, 200)
        assert any(v.is_insertion() and v.begin == 55 and
                   decode_sequence(v.alt_codes) == "GG" for v in variants)

    def test_deletion_candidate(self):
        ref, seq = make_ref()
        reads = []
        for i in range(6):
            begin = 40 - i
            s = seq[begin:55] + seq[58:begin + 31]
            cigar = f"{55 - begin}M3D{begin + 31 - 58}M"
            reads.append((begin, cigar, s, [35] * len(s), 60, FLAG_REVERSE if i % 2 else 0))
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, make_read_batch("chr1", reads))
        variants = sc.generate(0, 200)
        dels = [v for v in variants if v.is_deletion()]
        assert len(dels) == 1
        assert dels[0].begin == 55 and dels[0].end == 58

    def test_misaligned_read_candidates_suppressed(self):
        ref, seq = make_ref()
        # one read with many high-quality mismatches -> likely misaligned
        begin = 40
        s = list(seq[begin:begin + 30])
        for j in range(0, 30, 3):
            s[j] = "T" if s[j] != "T" else "A"
        reads = [(begin, "30M", "".join(s), [38] * 30, 60, 0)]
        for i in range(5):  # clean depth
            reads.append((begin - i, "30M", seq[begin - i:begin - i + 30], [35] * 30, 60, 0))
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, make_read_batch("chr1", reads))
        assert sc.generate(0, 200) == []

    def test_strand_bias_filter(self):
        ref, seq = make_ref()
        alt = "T" if seq[50] != "T" else "A"
        # 25 supporting reads, all forward, in deep coverage both strands
        reads = []
        for i in range(25):
            begin = 50 - 15 - (i % 5)
            s = seq[begin:50] + alt + seq[51:begin + 30]
            reads.append((begin, "30M", s, [35] * 30, 60, 0))
        for i in range(50):
            begin = 50 - 15 - (i % 5)
            reads.append((begin, "30M", seq[begin:begin + 30], [35] * 30, 60,
                          FLAG_REVERSE if i % 2 else 0))
        sc = CigarScanner(ref, "chr1")
        sc.add_reads(0, make_read_batch("chr1", reads))
        assert sc.generate(0, 200) == []

    def test_threshold_inclusion(self):
        ref, seq = make_ref()
        batch = reads_with_snv(seq, 50, "T" if seq[50] != "T" else "A", n=2)
        sc = CigarScanner(ref, "chr1", ScannerOptions(inclusion="threshold", min_observations=2,
                                                      use_misalignment_filter=False))
        sc.add_reads(0, batch)
        assert len(sc.generate(0, 200)) == 1


def test_fast_fisher_matches_scipy():
    import scipy.stats as sps
    from octopus_tpu.core.vargen.cigar_scanner import _fisher_two_sided_p
    import numpy as np
    rng = np.random.default_rng(0)
    for _ in range(60):
        a, b, c, d = (int(x) for x in rng.integers(0, 40, 4))
        want = sps.fisher_exact([[a, b], [c, d]])[1]
        got = _fisher_two_sided_p(a, b, c, d)
        assert abs(got - want) < 1e-9, (a, b, c, d, got, want)


def test_fast_poisson_lnsf_matches_scipy():
    import scipy.stats as sps
    from octopus_tpu.core.vargen.cigar_scanner import _poisson_lnsf
    for k in (0, 1, 2, 5, 9, 20):
        for mu in (0.1, 0.45, 1.5, 3.2):
            want = float(sps.poisson.logsf(k, mu))
            got = _poisson_lnsf(k, mu)
            assert abs(got - want) < 1e-6 * max(abs(want), 1), (k, mu)
