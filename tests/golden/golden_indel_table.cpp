// Golden harness: dumps the REFERENCE's generated indel mutation tables
// (/root/reference/src/core/models/mutation/indel_mutation_model_config.hpp,
// which depends only on <array>) as raw little-endian float64 so the repo can
// ship bit-exact copies in resources/indel_tables.npz.
//
// Output (stdout, binary): enrichment_model (11*31 doubles, row-major)
// followed by extension_model (11*51*101 doubles, row-major).
#include <array>
#include <cstdio>

#include "indel_mutation_model_config.hpp"

int main() {
    std::fwrite(octopus::enrichment_model.data(),
                sizeof(double), 11 * 31, stdout);
    std::fwrite(octopus::extension_model.data(),
                sizeof(double), 11 * 51 * 101, stdout);
    return 0;
}
