"""HaplotypeLikelihoodArray vs the per-read host golden path."""

import numpy as np
import pytest

from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import decode_sequence
from octopus_tpu.core.likelihood import pairhmm_ref as ph
from octopus_tpu.core.likelihood.error_models import make_error_models
from octopus_tpu.core.likelihood.kmer_mapper import (
    HaplotypeKmerIndex,
    read_kmer_hashes,
)
from octopus_tpu.core.likelihood.likelihood_array import (
    HaplotypeLikelihoodArray,
    LikelihoodConfig,
)


def synth_case(seed, n_reads=30, hap_len=300, n_haps=4, read_len=100, exact_len=True):
    """Reads sampled from mutated copies of a reference chunk."""
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, hap_len).astype(np.uint8)
    haps = [ref.copy()]
    for _ in range(n_haps - 1):
        h = ref.copy()
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(20, hap_len - 20))
            h[i] = (h[i] + rng.integers(1, 4)) % 4
        if rng.random() < 0.5:  # indel haplotype
            i = int(rng.integers(30, hap_len - 30))
            if rng.random() < 0.5:
                h = np.concatenate((h[:i], h[i + 1:], rng.integers(0, 4, 1)))
            else:
                h = np.concatenate((h[:i], rng.integers(0, 4, 1), h[i:]))[:hap_len]
        haps.append(h.astype(np.uint8))
    reads = []
    for r in range(n_reads):
        src = haps[int(rng.integers(0, n_haps))]
        L = read_len if exact_len else int(rng.integers(read_len - 20, read_len + 1))
        start = int(rng.integers(10, len(src) - L - 10))
        seq = src[start:start + L].copy()
        nerr = int(rng.integers(0, 3))
        for _ in range(nerr):
            i = int(rng.integers(0, L))
            seq[i] = (seq[i] + rng.integers(1, 4)) % 4
        q = rng.integers(15, 42, L)
        flags = FLAG_REVERSE if rng.random() < 0.5 else 0
        reads.append((start, f"{L}M", decode_sequence(seq), q, int(rng.integers(20, 61)), flags))
    batch = make_read_batch("chr1", reads)
    return haps, batch


def golden_matrix(haps, batch, cfg: LikelihoodConfig):
    """Reference computation: per-read evaluate via pairhmm_ref."""
    snv_model, indel_model = make_error_models(cfg.error_model)
    H = len(haps)
    out = np.zeros((H, len(batch)))
    hashes_flat, hash_offsets = read_kmer_hashes(batch.seq, batch.seq_offsets)
    for h, codes in enumerate(haps):
        indel = indel_model.set_penalties(codes)
        snv = snv_model.evaluate(codes)
        index = HaplotypeKmerIndex(codes)
        anchors = index.map_reads(hashes_flat, hash_offsets)
        for r in range(len(batch)):
            rev = bool(batch.is_reverse()[r])
            params = ph.HmmParams(
                gap_open=indel.gap_open,
                gap_extend=indel.gap_extend,
                snv_mask=snv.reverse_mask if rev else snv.forward_mask,
                snv_prior=snv.reverse_priors if rev else snv.forward_priors,
                nuc_prior=cfg.nuc_prior,
            )
            out[h, r] = ph.evaluate_read(
                codes,
                batch.sequence(r),
                batch.qualities(r),
                [int(p) for p in anchors[r]],
                max(0, int(batch.begins[r])),
                params,
                mapping_quality=int(batch.mapq[r]) if cfg.use_mapping_quality else None,
                pad=cfg.max_indel_error,
            )
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_host_golden(seed):
    haps, batch = synth_case(seed)
    cfg = LikelihoodConfig()
    arr = HaplotypeLikelihoodArray(cfg).populate([batch], haps, haplotype_begin=0)
    got = arr.sample_matrix(0)
    want = golden_matrix(haps, batch, cfg)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_ragged_lengths_match(seed=3):
    haps, batch = synth_case(seed, n_reads=20, exact_len=False)
    cfg = LikelihoodConfig()
    arr = HaplotypeLikelihoodArray(cfg).populate([batch], haps, haplotype_begin=0)
    got = arr.sample_matrix(0)
    want = golden_matrix(haps, batch, cfg)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_perfect_reads_on_their_haplotype_score_zeroish():
    haps, batch = synth_case(7, n_reads=10)
    cfg = LikelihoodConfig()
    arr = HaplotypeLikelihoodArray(cfg).populate([batch], haps, haplotype_begin=0)
    got = arr.sample_matrix(0)
    # every read should score ~0 against at least one haplotype ... only true
    # for error-free reads; just check the matrix is finite and <= 0
    assert np.all(np.isfinite(got))
    assert np.all(got <= 0)


def test_score_cache_is_transparent():
    """populate with a shared cache returns identical matrices, including
    the subset-then-superset pattern used by beam pruning."""
    import numpy as np
    from octopus_tpu.basics.reads import make_read_batch
    from octopus_tpu.core.likelihood.likelihood_array import (
        HaplotypeLikelihoodArray, LikelihoodConfig)
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 400).astype(np.uint8)
    hap1 = ref[100:300].copy()
    hap2 = hap1.copy(); hap2[100] = (hap2[100] + 1) % 4
    reads = []
    for i in range(40):
        b = int(rng.integers(100, 220))
        src = hap1 if i % 2 else np.concatenate([ref[100:200], hap2[100:]])
        r = src[b - 100:b - 100 + 80].copy()
        if rng.random() < 0.5:
            r[int(rng.integers(0, 80))] = (r[0] + 1) % 4
        reads.append((b, "80M", "".join("ACGT"[c] for c in r),
                      list(rng.integers(20, 40, 80)), 60, 16 if i % 3 else 0))
    batch = make_read_batch("chr1", reads).sorted_by_begin()
    sub = batch.take((batch.begins >= 120) & (batch.ends <= 280))
    haps = [hap1, hap2]
    cfg = LikelihoodConfig()
    cache = {}
    a1 = HaplotypeLikelihoodArray(cfg).populate([sub], haps, 100, cache=cache)
    m_sub_cached = a1.sample_matrix(0).copy()
    a2 = HaplotypeLikelihoodArray(cfg).populate([batch], haps, 100, cache=cache)
    m_full_cached = a2.sample_matrix(0).copy()
    assert len(cache) > 0
    b1 = HaplotypeLikelihoodArray(cfg).populate([sub], haps, 100)
    b2 = HaplotypeLikelihoodArray(cfg).populate([batch], haps, 100)
    np.testing.assert_array_equal(m_sub_cached, b1.sample_matrix(0))
    np.testing.assert_array_equal(m_full_cached, b2.sample_matrix(0))
    # second cached populate is a pure replay
    a3 = HaplotypeLikelihoodArray(cfg).populate([batch], haps, 100, cache=cache)
    np.testing.assert_array_equal(a3.sample_matrix(0), m_full_cached)
