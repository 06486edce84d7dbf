// Minimal stand-in for boost::iostreams::filtering_istream, just enough to
// compile the reference's vendored ranger library in place as a golden
// oracle (lib/ranger/Forest.h:27, Forest.cpp:909-1009).  The real library
// chains stream filters; ranger only ever uses the chain
// [optional gzip_decompressor] -> ifstream, so this stub slurps the file,
// inflates with zlib when the decompressor was pushed, and exposes the
// bytes through a std::istream interface.
#pragma once

#include <fstream>
#include <istream>
#include <iterator>
#include <sstream>
#include <stdexcept>
#include <string>

#include <zlib.h>

namespace boost {
namespace iostreams {

struct gzip_decompressor {
    gzip_decompressor() = default;
};

class filtering_istream : public std::istream {
public:
    filtering_istream() : std::istream(nullptr) {}

    void push(const gzip_decompressor&) { gz_ = true; }

    void push(std::ifstream& file) {
        std::string raw {std::istreambuf_iterator<char>(file),
                         std::istreambuf_iterator<char>()};
        if (gz_) raw = inflate_gz(raw);
        buf_.str(raw);
        this->rdbuf(&buf_);  // sets the buffer and clears stream state
    }

private:
    static std::string inflate_gz(const std::string& in) {
        z_stream zs {};
        // 15 + 32: zlib auto-detects gzip or zlib headers
        if (inflateInit2(&zs, 15 + 32) != Z_OK) {
            throw std::runtime_error("inflateInit2 failed");
        }
        zs.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(in.data()));
        zs.avail_in = static_cast<uInt>(in.size());
        std::string out;
        char chunk[1 << 16];
        int rc = Z_OK;
        do {
            zs.next_out = reinterpret_cast<Bytef*>(chunk);
            zs.avail_out = sizeof(chunk);
            rc = inflate(&zs, Z_NO_FLUSH);
            if (rc != Z_OK && rc != Z_STREAM_END) {
                inflateEnd(&zs);
                throw std::runtime_error("gzip inflate failed");
            }
            out.append(chunk, sizeof(chunk) - zs.avail_out);
        } while (rc != Z_STREAM_END && zs.avail_in > 0);
        inflateEnd(&zs);
        return out;
    }

    std::stringbuf buf_;
    bool gz_ = false;
};

}  // namespace iostreams
}  // namespace boost
