"""End-to-end slice: synthetic reads -> IndividualCaller -> VCF records."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import decode_sequence, encode_sequence
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.callers.individual import IndividualCaller, CallerConfig
from octopus_tpu.core.tools.vcf_record_factory import make_vcf_header, site_call_to_record


def make_reference(seed=0, n=800):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    return ReferenceGenome(InMemoryReference({"chr1": seq})), seq


def simulate_reads(ref_seq, hap_variants, n_reads=80, read_len=100, seed=1,
                   error_rate=0.0):
    """Diploid read simulation: hap_variants = (hapA_muts, hapB_muts), each a
    dict pos -> alt_char (SNVs) for simplicity."""
    rng = np.random.default_rng(seed)
    haps = []
    for muts in hap_variants:
        s = list(ref_seq)
        for pos, alt in muts.items():
            s[pos] = alt
        haps.append("".join(s))
    reads = []
    for i in range(n_reads):
        hap = haps[i % 2]
        begin = int(rng.integers(0, len(hap) - read_len))
        seq = list(hap[begin:begin + read_len])
        if error_rate > 0:
            for j in range(read_len):
                if rng.random() < error_rate:
                    seq[j] = "ACGT"[rng.integers(0, 4)]
        quals = [37] * read_len
        flags = FLAG_REVERSE if i % 2 else 0
        reads.append((begin, f"{read_len}M", "".join(seq), quals, 60, flags))
    return make_read_batch("chr1", reads).sorted_by_begin()


def other_base(c):
    return "T" if c != "T" else "A"


class TestIndividualCallerE2E:
    def test_het_snv(self):
        ref, seq = make_reference()
        alt = other_base(seq[400])
        batch = simulate_reads(seq, ({400: alt}, {}))
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        assert len(calls) == 1
        c = calls[0]
        assert c.begin == 400
        assert sorted(c.genotype) == [0, 1]
        assert c.quality > 100
        assert decode_sequence(c.alts[0].alt_codes) == alt

    def test_hom_snv(self):
        ref, seq = make_reference(seed=2)
        alt = other_base(seq[300])
        batch = simulate_reads(seq, ({300: alt}, {300: alt}))
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        assert len(calls) == 1
        assert calls[0].genotype == [1, 1]

    def test_two_phased_hets(self):
        ref, seq = make_reference(seed=3)
        a1, a2 = other_base(seq[390]), other_base(seq[430])
        batch = simulate_reads(seq, ({390: a1, 430: a2}, {}), n_reads=120)
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        assert len(calls) == 2
        # both sites het, in the same phase set, with the alts on the SAME
        # haplotype index (cis phasing)
        alt_positions = [c.genotype.index(1) for c in calls]
        assert calls[0].phase_set == calls[1].phase_set
        assert alt_positions[0] == alt_positions[1]

    def test_no_variants_no_calls(self):
        ref, seq = make_reference(seed=4)
        batch = simulate_reads(seq, ({}, {}))
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        assert caller.call(0, 800, batch) == []

    def test_sequencing_noise_not_called(self):
        ref, seq = make_reference(seed=5)
        batch = simulate_reads(seq, ({}, {}), error_rate=0.002, n_reads=60)
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        assert calls == []

    def test_het_deletion(self):
        ref, seq = make_reference(seed=6)
        # deletion of 3 bases at 400 on hap A
        hapA = seq[:400] + seq[403:]
        rng = np.random.default_rng(9)
        reads = []
        for i in range(100):
            src = hapA if i % 2 == 0 else seq
            begin = int(rng.integers(300, 420))
            if i % 2 == 0:
                # from deleted haplotype
                s = hapA[begin:begin + 100]
                if begin < 400 < begin + 100:
                    m = 400 - begin
                    cigar = f"{m}M3D{100 - m}M"
                else:
                    cigar = "100M"
                reads.append((begin if begin < 400 else begin + 3, cigar, s,
                              [37] * 100, 60, FLAG_REVERSE if i % 4 == 0 else 0))
            else:
                s = seq[begin:begin + 100]
                reads.append((begin, "100M", s, [37] * 100, 60,
                              FLAG_REVERSE if (i + 1) % 4 == 0 else 0))
        batch = make_read_batch("chr1", reads).sorted_by_begin()
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        dels = [c for c in calls if any(v.is_deletion() for v in c.alts)]
        assert len(dels) == 1
        assert dels[0].begin == 400 or abs(dels[0].begin - 400) <= 3  # left-shift
        assert sorted(dels[0].genotype) == [0, 1]

    def test_vcf_record_output(self):
        ref, seq = make_reference(seed=7)
        alt = other_base(seq[200])
        batch = simulate_reads(seq, ({200: alt}, {}))
        caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
        calls = caller.call(0, 800, batch)
        rec = site_call_to_record(calls[0], "chr1", ref)
        assert rec.pos == 201
        assert rec.ref == seq[200]
        assert rec.alts == [alt]
        assert rec.sample_values[0]["GT"] in ("0|1", "1|0")
        line = rec.to_line()
        assert line.startswith("chr1\t201\t")


def test_paired_linkage_phases_distant_hets():
    """Mates carry two het sites individually; linked scoring phases them."""
    import numpy as np
    from octopus_tpu.basics.reads import ReadBatch
    ref, seq = make_reference(seed=40)
    a1, a2 = other_base(seq[300]), other_base(seq[500])
    hapA = seq[:300] + a1 + seq[301:500] + a2 + seq[501:]
    rng = np.random.default_rng(41)
    reads = []
    names = []
    for i in range(60):
        hap = hapA if i % 2 == 0 else seq
        b1 = 300 - int(rng.integers(10, 60))
        b2 = 500 - int(rng.integers(10, 60))
        reads.append((b1, "80M", hap[b1:b1 + 80], [37] * 80, 60, 0))
        reads.append((b2, "80M", hap[b2:b2 + 80], [37] * 80, 60, FLAG_REVERSE))
        names.extend([f"frag{i}", f"frag{i}"])
    from octopus_tpu.basics.reads import make_read_batch
    batch = make_read_batch("chr1", reads)
    batch.name_hashes = np.asarray([hash(n) & 0xFFFFFFFF for n in names],
                                   np.uint64)
    batch = batch.sorted_by_begin()
    cfg = CallerConfig(use_device=False)
    cfg.read_linkage = "paired"
    # force the two sites into one active region so phasing is attempted
    from octopus_tpu.core.callers.individual import IndividualCaller
    caller = IndividualCaller(ref, "chr1", cfg)
    import octopus_tpu.core.hapgen.generator as hg
    calls = caller.call(0, 800, batch)
    got = {c.begin for c in calls}
    assert got == {300, 500}
    for c in calls:
        assert sorted(c.genotype) == [0, 1]
