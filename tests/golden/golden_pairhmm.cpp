// Golden-score harness: drives the REFERENCE pair-HMM kernel (included
// directly from the read-only reference checkout; nothing is copied into this
// repo) on test cases read from stdin, emitting one score per line.
//
// stdin format per case:
//   R W pad nuc_prior
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
             bool use_snv, int nuc_prior)
{
    PairHMM<SSE2PairHMMInstructionSet<Band, short>, InsertRollingInitializer> hmm;
    if (use_snv) {
        return hmm.align(truth.data(), target.data(), quals.data(),
                         (int)truth.size(), (int)target.size(),
                         mask.data(), prior.data(), go.data(), ge.data(), (short)nuc_prior);
    }
    return hmm.align(truth.data(), target.data(), quals.data(),
                     (int)truth.size(), (int)target.size(),
                     go.data(), ge.data(), (short)nuc_prior);
}

int main() {
    int R, W, pad, nuc_prior;
    while (std::scanf("%d %d %d %d", &R, &W, &pad, &nuc_prior) == 4) {
        auto read_seq = [&](int n) {
            std::string s(n, 'N');
            for (int i = 0; i < n; ++i) { int v; std::scanf("%d", &v); s[i] = CODE[v]; }
            return s;
        };
        auto read_pen = [&](int n) {
            std::vector<std::int8_t> p(n);
            for (int i = 0; i < n; ++i) { int v; std::scanf("%d", &v); p[i] = (std::int8_t)v; }
            return p;
        };
        std::string target = read_seq(R);
        auto quals = read_pen(R);
        std::string truth = read_seq(W);
        auto gov = read_pen(W);
        auto gev = read_pen(W);
        int first_mask; std::scanf("%d", &first_mask);
        bool use_snv = first_mask >= 0;
        std::string mask(W, 'N');
        if (use_snv) {
            mask[0] = CODE[first_mask];
            for (int i = 1; i < W; ++i) { int v; std::scanf("%d", &v); mask[i] = CODE[v]; }
        } else {
            for (int i = 1; i < W; ++i) { int v; std::scanf("%d", &v); }
        }
        auto prior = read_pen(W);
        int score = -1;
        switch (pad) {
            case 8:  score = run_case<8>(truth, target, quals, gov, gev, mask, prior, use_snv, nuc_prior); break;
            case 16: score = run_case<16>(truth, target, quals, gov, gev, mask, prior, use_snv, nuc_prior); break;
            case 32: score = run_case<32>(truth, target, quals, gov, gev, mask, prior, use_snv, nuc_prior); break;
            default: std::printf("skip\n"); continue;
        }
        std::printf("%d\n", score);
    }
    return 0;
}
