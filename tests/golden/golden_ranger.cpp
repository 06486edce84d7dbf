// Golden oracle for the ranger .forest file format: drives the REFERENCE's
// vendored ranger library in place (/root/reference/lib/ranger).
//
//   golden_ranger train   <data.tsv> <out_prefix> <num_trees> <seed>
//       trains a ForestProbability on the whitespace table (dependent
//       column "TP") and writes <out_prefix>.forest via Forest::saveToFile
//       (Forest.cpp:403-411) — the exact serializer that produced the
//       shipped resources/forests/*.forest artifacts.
//
//   golden_ranger predict <forest_file> <data.tsv> <out_prefix>
//       mirrors octopus's own prediction call verbatim
//       (src/core/csr/filters/random_forest_filter.cpp:380-391):
//       initCpp with load_forest_filename, run, writePredictionFile ->
//       <out_prefix>.prediction.
//
// The repo's python reader (octopus_tpu/core/csr/random_forest.py:
// load_ranger_forest) must reproduce the structure and the predictions.
#include <iostream>
#include <memory>
#include <string>
#include <vector>

#include "ranger/ForestProbability.h"
#include "ranger/globals.h"

using namespace ranger;

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: golden_ranger train|predict ...\n";
        return 2;
    }
    const std::string mode = argv[1];
    const std::vector<std::string> none;
    try {
        std::unique_ptr<Forest> forest = std::make_unique<ForestProbability>();
        if (mode == "train") {
            if (argc != 6) { std::cerr << "train <data> <prefix> <ntrees> <seed>\n"; return 2; }
            forest->initCpp("TP", MemoryMode::MEM_DOUBLE, argv[2], 0, argv[3],
                            static_cast<uint>(std::stoul(argv[4])), nullptr,
                            static_cast<uint>(std::stoul(argv[5])), 1, "",
                            ImportanceMode::IMP_NONE, 1, "", none, "", true, none,
                            false, SplitRule::LOGRANK, "", false, 1.0,
                            DEFAULT_ALPHA, DEFAULT_MINPROP, false,
                            PredictionType::RESPONSE, DEFAULT_NUM_RANDOM_SPLITS,
                            DEFAULT_MAXDEPTH);
            forest->run(false, false);
            forest->saveToFile();
        } else if (mode == "predict") {
            if (argc != 5) { std::cerr << "predict <forest> <data> <prefix>\n"; return 2; }
            forest->initCpp("", MemoryMode::MEM_DOUBLE, argv[3], 0, argv[4],
                            1000, nullptr, 12, 1, argv[2],
                            ImportanceMode::IMP_GINI, 1, "", none, "", true, none,
                            false, SplitRule::LOGRANK, "", false, 1.0,
                            DEFAULT_ALPHA, DEFAULT_MINPROP, false,
                            PredictionType::RESPONSE, DEFAULT_NUM_RANDOM_SPLITS,
                            DEFAULT_MAXDEPTH);
            forest->run(false, false);
            forest->writePredictionFile();
        } else {
            std::cerr << "unknown mode " << mode << "\n";
            return 2;
        }
    } catch (const std::exception& e) {
        std::cerr << "golden_ranger: " << e.what() << "\n";
        return 1;
    }
    return 0;
}
