// Golden flank-score harness: drives the REFERENCE pair-HMM kernel's
// align-with-traceback + calculate_flank_score path (included directly from
// the read-only reference checkout; nothing is copied into this repo) on
// test cases read from stdin, emitting one flank-corrected score per line.
//
// Mirrors pair_hmm.hpp:735-766 (simd_evaluate_helper adjusted-score branch)
// with the truth window passed directly (alignment_offset = 0), so the
// lhs/rhs flank sizes below are window-relative.
//
// stdin format per case:
//   R W pad nuc_prior lhs_flank rhs_flank
//   target codes (R ints 0..4)
//   quals (R ints)
//   truth window codes (W ints)
//   gap_open (W ints)
//   gap_extend (W ints)
//   snv_mask codes (W ints)   [-1 first value => no snv model]
//   snv_prior (W ints)
// output: "<score>" per case (phred int), or "skip" if pad unsupported.
#include <cstdint>
#include <cstdio>
#include <vector>
#include <string>
#include "simd_pair_hmm.hpp"
#include "sse2_pair_hmm_impl.hpp"
#include "rolling_initializer.hpp"

using namespace octopus::hmm::simd;

static const char* CODE = "ACGTN";

template <int Band>
int run_case(const std::string& truth, const std::string& target,
             const std::vector<std::int8_t>& quals,
             const std::vector<std::int8_t>& go, const std::vector<std::int8_t>& ge,
             const std::string& mask, const std::vector<std::int8_t>& prior,
             bool use_snv, int nuc_prior, int lhs, int rhs)
{
    PairHMM<SSE2PairHMMInstructionSet<Band, short>, InsertRollingInitializer> hmm;
    const int W = (int)truth.size();
    const int R = (int)target.size();
    const std::size_t max_aln = 2 * (target.size() + Band);
    std::vector<char> a1(max_aln + 1, 0), a2(max_aln + 1, 0);
    int first_pos;
    int score;
    if (use_snv) {
        score = hmm.align(truth.data(), target.data(), quals.data(), W, R,
                          mask.data(), prior.data(), go.data(), ge.data(),
                          (short)nuc_prior, first_pos, a1.data(), a2.data());
    } else {
        score = hmm.align(truth.data(), target.data(), quals.data(), W, R,
                          go.data(), ge.data(), (short)nuc_prior,
                          first_pos, a1.data(), a2.data());
    }
    if (first_pos == -1) return -1;   // overflow sentinel
    int mask_size;
    // always use the snv-mask flank overload (the NullType one lacks the
    // target); a never-matching mask ('X') with max priors is a no-op
    std::string fmask = mask;
    std::vector<std::int8_t> fprior = prior;
    if (!use_snv) {
        fmask.assign(W, 'X');
        fprior.assign(W, 127);
    }
    int fscore = hmm.calculate_flank_score(W, lhs, rhs, target.data(),
                                           quals.data(), fmask.data(),
                                           fprior.data(), go.data(), ge.data(),
                                           (short)nuc_prior, first_pos,
                                           a1.data(), a2.data(), mask_size);
    if (R - mask_size < 2) fscore = 0;
    return (fscore <= score) ? score - fscore : score + fscore;
}

int main() {
    int R, W, pad, nuc_prior, lhs, rhs;
    while (std::scanf("%d %d %d %d %d %d", &R, &W, &pad, &nuc_prior, &lhs, &rhs) == 6) {
        auto read_seq = [&](int n) {
            std::string s(n, 'N');
            for (int i = 0; i < n; ++i) { int v; std::scanf("%d", &v); s[i] = CODE[v]; }
            return s;
        };
        auto read_i8 = [&](int n) {
            std::vector<std::int8_t> v(n);
            for (int i = 0; i < n; ++i) { int x; std::scanf("%d", &x); v[i] = (std::int8_t)x; }
            return v;
        };
        std::string target = read_seq(R);
        auto quals = read_i8(R);
        std::string truth = read_seq(W);
        auto go = read_i8(W);
        auto ge = read_i8(W);
        // snv mask line: -1 first => disabled (still consume W ints)
        std::vector<int> mask_raw(W);
        for (int i = 0; i < W; ++i) std::scanf("%d", &mask_raw[i]);
        bool use_snv = mask_raw[0] >= 0;
        std::string mask(W, 'N');
        for (int i = 0; i < W; ++i) mask[i] = CODE[use_snv && mask_raw[i] >= 0 ? mask_raw[i] : 4];
        auto prior = read_i8(W);
        int score;
        if (pad == 8) {
            score = run_case<8>(truth, target, quals, go, ge, mask, prior, use_snv, nuc_prior, lhs, rhs);
        } else if (pad == 16) {
            score = run_case<16>(truth, target, quals, go, ge, mask, prior, use_snv, nuc_prior, lhs, rhs);
        } else if (pad == 32) {
            score = run_case<32>(truth, target, quals, go, ge, mask, prior, use_snv, nuc_prior, lhs, rhs);
        } else {
            std::printf("skip\n");
            continue;
        }
        std::printf("%d\n", score);
    }
    return 0;
}
