// Stub satisfying lib/ranger/Forest.cpp:24's include; the actual
// gzip_decompressor lives with the filtering_istream stub.
#pragma once
#include "../filtering_stream.hpp"
