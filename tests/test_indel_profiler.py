import numpy as np
from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome
from octopus_tpu.core.tools.indel_profiler import profile_indels


def test_profile_counts_repeat_errors(tmp_path):
    rng = np.random.default_rng(0)
    left = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    right = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    seq = left + "A" * 12 + right
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    reads = []
    for i in range(20):
        begin = 60
        if i < 3:   # 3 reads slip one A in the homopolymer
            s = seq[begin:105] + seq[106:begin + 81]
            reads.append((begin, "45M1D35M", s, [35] * 80, 60, 0))
        else:
            reads.append((begin, "80M", seq[begin:begin + 80], [35] * 80, 60, 0))
    batch = make_read_batch("chr1", reads)
    prof = profile_indels(ref, "chr1", batch, 0, 300)
    key = (1, 12)
    assert key in prof.counts
    n, k = prof.counts[key]
    assert n == 20 and k == 3
    out = tmp_path / "profile.csv"
    prof.write_csv(str(out))
    text = out.read_text()
    assert "period,periodicity" in text and ",20,3," in text
