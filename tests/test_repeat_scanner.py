import numpy as np
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.vargen.repeat_scanner import RepeatScanner


def test_str_indel_normalised_and_proposed():
    rng = np.random.default_rng(0)
    left = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    right = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    seq = left + "AT" * 10 + right          # 20bp AT repeat at 100..120
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    reads = []
    # carriers show a 2bp (one unit) deletion placed at DIFFERENT offsets in
    # the tract by the "mapper"
    for i, del_off in enumerate([4, 6, 8, 10]):
        begin = 70
        s = seq[begin:100 + del_off] + seq[100 + del_off + 2:begin + 82]
        cigar = f"{100 + del_off - begin}M2D{begin + 82 - 100 - del_off - 2}M"
        reads.append((begin, cigar, s, [35] * 80, 60, FLAG_REVERSE if i % 2 else 0))
    for i in range(4):
        begin = 70 + i
        reads.append((begin, "80M", seq[begin:begin + 80], [35] * 80, 60, 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    sc = RepeatScanner(ref, "chr1")
    variants = sc.generate(batch, 0, 300)
    dels = [v for v in variants if v.is_deletion() and v.indel_size() == 2]
    assert len(dels) == 1
    assert dels[0].begin == 99    # left-aligned to tract start
