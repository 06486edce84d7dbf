// Golden harness: drives the REFERENCE's vendored tandem library in place
// (/root/reference/lib/tandem) to produce ground-truth maximal exact tandem
// repeats for parity testing of octopus_tpu.utils.tandem and the native
// tandem_repeats kernel.
//
// Protocol: each stdin line is "<min_period> <max_period> <sequence>";
// stdout echoes one line per input: space-separated pos,length,period
// triples (sorted by pos then period), or "-" when none.
#include <algorithm>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "tandem.hpp"

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream iss(line);
        unsigned min_p, max_p;
        std::string seq;
        if (!(iss >> min_p >> max_p >> seq)) continue;
        auto runs = tandem::extract_exact_tandem_repeats(seq, min_p, max_p);
        std::sort(runs.begin(), runs.end(),
                  [](const tandem::Repeat& a, const tandem::Repeat& b) {
                      return a.pos != b.pos ? a.pos < b.pos
                                            : a.period < b.period;
                  });
        if (runs.empty()) {
            std::cout << "-\n";
            continue;
        }
        bool first = true;
        for (const auto& r : runs) {
            if (!first) std::cout << ' ';
            first = false;
            std::cout << r.pos << ',' << r.length << ',' << r.period;
        }
        std::cout << '\n';
    }
    return 0;
}
