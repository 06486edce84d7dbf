// Reference-kernel throughput benchmark (baseline for bench.py):
// runs the reference SSE2 pair-HMM (included in place from the read-only
// checkout) on random cases. usage: golden_bench <R> <n_pairs>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <string>
#include <chrono>
#include <random>
#include "simd_pair_hmm.hpp"
#include "sse2_pair_hmm_impl.hpp"
#include "rolling_initializer.hpp"

using namespace octopus::hmm::simd;
static const char* CODE = "ACGTN";

int main(int argc, char** argv) {
    const int R = argc > 1 ? std::atoi(argv[1]) : 150;
    const int n = argc > 2 ? std::atoi(argv[2]) : 20000;
    constexpr int pad = 8;
    const int W = R + 2 * pad - 1;
    std::mt19937 rng(42);
    std::uniform_int_distribution<int> base(0, 3), qual(10, 40), go(10, 50), ge(1, 8), pr(3, 40);
    std::string truth(W, 'A'), target(R, 'A'), mask(W, 'A');
    std::vector<std::int8_t> quals(R), gov(W), gev(W), prior(W);
    PairHMM<SSE2PairHMMInstructionSet<8, short>, InsertRollingInitializer> hmm;
    long long acc = 0;
    // pre-generate one case set; regenerate cheap fields per iteration so
    // timing is dominated by the kernel
    for (int i = 0; i < W; ++i) {
        truth[i] = CODE[base(rng)]; mask[i] = CODE[base(rng)];
        gov[i] = (std::int8_t)go(rng); gev[i] = (std::int8_t)ge(rng); prior[i] = (std::int8_t)pr(rng);
    }
    for (int i = 0; i < R; ++i) { target[i] = CODE[base(rng)]; quals[i] = (std::int8_t)qual(rng); }
    auto t0 = std::chrono::steady_clock::now();
    for (int it = 0; it < n; ++it) {
        // mutate a few positions so the kernel cannot shortcut
        target[it % R] = CODE[base(rng)];
        truth[(it * 7) % W] = CODE[base(rng)];
        acc += hmm.align(truth.data(), target.data(), quals.data(), W, R,
                         mask.data(), prior.data(), gov.data(), gev.data(), (short)2);
    }
    auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    std::printf("{\"pairs\": %d, \"seconds\": %.4f, \"pairs_per_s\": %.1f, \"acc\": %lld}\n",
                n, dt, n / dt, acc);
    return 0;
}
