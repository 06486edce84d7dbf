import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch
from octopus_tpu.basics.sequence import decode_sequence, encode_sequence
from octopus_tpu.basics.cigar import cigar_to_string
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.core.types.haplotypes import Haplotype
from octopus_tpu.core.tools.bam_realigner import realign_evidence
from octopus_tpu.io.bam import BamFile


def test_evidence_bam_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    ref = rng.integers(0, 4, 400).astype(np.uint8)
    fetch = lambda b, e: ref[b:e]
    v = Variant.make(200, ref[200:203], np.zeros(0, np.uint8))  # 3bp del
    h_ref = Haplotype.build(0, 400, [], fetch)
    h_alt = Haplotype.build(0, 400, [v], fetch)
    reads = []
    for i in range(12):
        begin = 160 + 2 * i
        if i % 2 == 0:
            # from deleted haplotype; aligned naively with mismatches (as a
            # mapper might) — the realigner should recover the 3D cigar
            hb = begin
            seq = decode_sequence(h_alt.sequence[hb:hb + 60])
            reads.append((begin, "60M", seq, [35] * 60, 60, 0))
        else:
            seq = decode_sequence(h_ref.sequence[begin:begin + 60])
            reads.append((begin, "60M", seq, [35] * 60, 60, 0))
    batch = make_read_batch("chr1", reads)
    out = tmp_path / "evidence.bam"
    support = realign_evidence(batch, [h_ref, h_alt], [0, 1], 0, str(out),
                               ["chr1"], [400], sample="S")
    assert support[0] > 0 and support[1] > 0
    got = BamFile(str(out)).fetch("chr1", 0, 400)["S"]
    assert len(got) == 12
    # at least one read should now carry the 3D cigar
    cigars = [cigar_to_string(got.cigar(i)) for i in range(len(got))]
    assert any("3D" in c for c in cigars), cigars
