"""Variants at contig edges: a read ending exactly at the contig (=
haplotype) end must score its true alignment — the anchor in-range filter
used to require `pad` bases of right window slack and shifted such reads
out of band, flooring every read at the mismap cap and silently dropping
or mis-genotyping edge variants."""

import numpy as np

from octopus_tpu.basics.reads import FLAG_REVERSE, make_read_batch
from octopus_tpu.core.callers.individual import CallerConfig, IndividualCaller
from octopus_tpu.io.fasta import InMemoryReference, ReferenceGenome


def _scene(seed=8, n=3000):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    ref = ReferenceGenome(InMemoryReference({"chr1": seq}))
    return ref, seq


def _edge_reads(seq, muts, seed=5, n_reads=60, read_len=100):
    """Reads piled on both contig edges with jittered starts/strands."""
    rng = np.random.default_rng(seed)
    n = len(seq)
    hap = list(seq)
    for pos, alt in muts.items():
        hap[pos] = alt
    hap = "".join(hap)
    reads = []
    for i in range(n_reads):
        src = hap if i % 2 == 0 else seq                 # het
        if i % 4 < 2:                                    # left edge
            b = int(rng.integers(0, 3))
        else:                                            # right edge
            b = n - read_len - int(rng.integers(0, 3))
        reads.append((b, f"{read_len}M", src[b:b + read_len],
                      [37] * read_len, 60,
                      FLAG_REVERSE if i % 3 == 0 else 0))
    return make_read_batch("chr1", reads).sorted_by_begin()


def test_het_variants_at_both_contig_edges():
    ref, seq = _scene()
    n = len(seq)
    alt0 = "T" if seq[2] != "T" else "A"
    alt1 = "T" if seq[n - 3] != "T" else "A"
    batch = _edge_reads(seq, {2: alt0, n - 3: alt1})
    caller = IndividualCaller(ref, "chr1", CallerConfig(use_device=False))
    calls = caller.call(0, n, [batch])
    by_pos = {c.begin: c for c in calls}
    assert 2 in by_pos, f"left-edge variant missing: {sorted(by_pos)}"
    assert n - 3 in by_pos, f"right-edge variant missing: {sorted(by_pos)}"
    assert sorted(by_pos[2].genotypes[0]) == [0, 1]
    assert sorted(by_pos[n - 3].genotypes[0]) == [0, 1]


def test_read_ending_at_haplotype_end_scores_truly():
    """Direct likelihood check: ref reads ending at the contig end score
    ~0 against the reference haplotype (they were floored at the MQ60
    mismap cap, -13.8 nats)."""
    from octopus_tpu.core.likelihood.likelihood_array import (
        HaplotypeLikelihoodArray, LikelihoodConfig)
    from octopus_tpu.core.types.haplotypes import Haplotype
    ref, seq = _scene(seed=11)
    n = len(seq)
    reads = [(n - 100, "100M", seq[n - 100:], [37] * 100, 60,
              FLAG_REVERSE if i % 2 else 0) for i in range(6)]
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    fetch = lambda b, e: ref.fetch_codes("chr1", b, e)
    hap = Haplotype.build(n - 200, n, [], fetch)
    lik = HaplotypeLikelihoodArray(LikelihoodConfig())
    lik.populate([batch], [hap.sequence], n - 200, pad=8)
    scores = lik.sample_matrix(0)[0]
    assert (scores > -1e-6).all(), scores
