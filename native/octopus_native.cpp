// Native host-side kernels for octopus_tpu.
//
// The reference links htslib for BGZF/BAM decoding (src/io/read/
// htslib_sam_facade.cpp); this extension provides the equivalent hot loops
// natively — BGZF block inflation (zlib) and BAM record boundary scanning —
// exposed through the CPython C API (no pybind11 in this environment).
// Python falls back to pure-python implementations when the extension is
// not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// Inflate a concatenation of BGZF blocks. Returns the decompressed bytes and
// (optionally) per-block (compressed_offset, uncompressed_offset) pairs.
static PyObject* inflate_bgzf(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
    const Py_ssize_t n = buf.len;

    std::string out;
    out.reserve(static_cast<size_t>(n) * 4);
    std::vector<uint64_t> block_coffsets, block_uoffsets;

    Py_ssize_t off = 0;
    bool error = false;
    std::string error_msg;
    Py_BEGIN_ALLOW_THREADS
    std::vector<uint8_t> scratch(1 << 17);
    while (off + 18 <= n) {
        if (data[off] != 0x1f || data[off + 1] != 0x8b) {
            error = true; error_msg = "bad gzip magic"; break;
        }
        const uint16_t xlen = data[off + 10] | (data[off + 11] << 8);
        // find BSIZE in the extra field
        Py_ssize_t p = off + 12, pend = off + 12 + xlen;
        int bsize = -1;
        while (p + 4 <= pend && p + 4 <= n) {
            const uint8_t si1 = data[p], si2 = data[p + 1];
            const uint16_t slen = data[p + 2] | (data[p + 3] << 8);
            if (si1 == 66 && si2 == 67 && slen == 2 && p + 6 <= n) {
                bsize = (data[p + 4] | (data[p + 5] << 8)) + 1;
                break;
            }
            p += 4 + slen;
        }
        if (bsize <= 0 || off + bsize > n) {
            if (bsize <= 0) { error = true; error_msg = "missing BSIZE"; }
            break;
        }
        const Py_ssize_t cdata_off = off + 12 + xlen;
        const Py_ssize_t cdata_len = bsize - 12 - xlen - 8;
        const uint32_t isize = data[off + bsize - 4] | (data[off + bsize - 3] << 8)
                             | (data[off + bsize - 2] << 16)
                             | (static_cast<uint32_t>(data[off + bsize - 1]) << 24);
        if (isize > 0) {
            if (scratch.size() < isize) scratch.resize(isize);
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            inflateInit2(&zs, -15);
            zs.next_in = const_cast<uint8_t*>(data + cdata_off);
            zs.avail_in = static_cast<uInt>(cdata_len);
            zs.next_out = scratch.data();
            zs.avail_out = static_cast<uInt>(scratch.size());
            const int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) { error = true; error_msg = "inflate failed"; break; }
            block_coffsets.push_back(static_cast<uint64_t>(off));
            block_uoffsets.push_back(static_cast<uint64_t>(out.size()));
            out.append(reinterpret_cast<char*>(scratch.data()), zs.total_out);
        } else {
            block_coffsets.push_back(static_cast<uint64_t>(off));
            block_uoffsets.push_back(static_cast<uint64_t>(out.size()));
        }
        off += bsize;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (error) {
        PyErr_SetString(PyExc_ValueError, error_msg.c_str());
        return nullptr;
    }
    PyObject* py_out = PyBytes_FromStringAndSize(out.data(), static_cast<Py_ssize_t>(out.size()));
    PyObject* py_coffs = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(block_coffsets.data()),
        static_cast<Py_ssize_t>(block_coffsets.size() * 8));
    PyObject* py_uoffs = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(block_uoffsets.data()),
        static_cast<Py_ssize_t>(block_uoffsets.size() * 8));
    PyObject* tuple = PyTuple_Pack(3, py_out, py_coffs, py_uoffs);
    Py_XDECREF(py_out);
    Py_XDECREF(py_coffs);
    Py_XDECREF(py_uoffs);
    return tuple;
}

// Scan BAM record boundaries in a decompressed buffer starting at `start`.
// Returns record start offsets (uint64 little-endian bytes).
static PyObject* scan_bam_records(PyObject*, PyObject* args) {
    Py_buffer buf;
    Py_ssize_t start = 0;
    if (!PyArg_ParseTuple(args, "y*|n", &buf, &start)) return nullptr;
    const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
    const Py_ssize_t n = buf.len;
    std::vector<uint64_t> offsets;
    Py_BEGIN_ALLOW_THREADS
    Py_ssize_t off = start;
    while (off + 4 <= n) {
        const int32_t block_size = data[off] | (data[off + 1] << 8)
            | (data[off + 2] << 16) | (static_cast<int32_t>(data[off + 3]) << 24);
        if (block_size <= 0 || off + 4 + block_size > n) break;
        offsets.push_back(static_cast<uint64_t>(off));
        off += 4 + block_size;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(offsets.data()),
        static_cast<Py_ssize_t>(offsets.size() * 8));
}

// ---------------------------------------------------------------------------
// rANS 4x8 (CRAM block method 4) — decode hot loops.
//
// The CRAM container layer (octopus_tpu/io/cram.py) replaces the reference's
// htslib dependency; quality/base streams dominate decode time and the
// per-byte state machine is unvectorisable in numpy, so it lives here.
// Format per the CRAM codecs spec: 4 interleaved 32-bit states, 12-bit
// normalised frequencies, RLE'd frequency tables.
// ---------------------------------------------------------------------------

namespace rans {

constexpr uint32_t kTfShift = 12;
constexpr uint32_t kTotFreq = 1u << kTfShift;
constexpr uint32_t kLow = 1u << 23;

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;
    uint8_t byte() {
        if (p >= end) { ok = false; return 0; }
        return *p++;
    }
};

// order-0 frequency table: symbol RLE + 1/2-byte frequencies
static bool read_freqs(Reader& r, uint32_t* freq) {
    std::memset(freq, 0, 256 * sizeof(uint32_t));
    int rle = 0;
    int j = r.byte();
    do {
        uint32_t f = r.byte();
        if (f >= 128) f = ((f & 127) << 8) | r.byte();
        if (j < 0 || j > 255) return false;
        freq[j] = f;
        if (rle > 0) {
            rle--;
            j++;
        } else if (r.p < r.end && *r.p == j + 1) {
            j = r.byte();
            rle = r.byte();
        } else {
            j = r.byte();
        }
    } while (j != 0 && r.ok);
    return r.ok;
}

struct Table {
    uint32_t freq[256];
    uint32_t cum[256];
    uint8_t sym[kTotFreq];
    void build() {
        uint32_t x = 0;
        for (int s = 0; s < 256; s++) {
            cum[s] = x;
            for (uint32_t k = 0; k < freq[s] && x + k < kTotFreq; k++) sym[x + k] = s;
            x += freq[s];
        }
    }
};

static inline void renorm(uint32_t& x, Reader& r) {
    while (x < kLow && r.p < r.end) x = (x << 8) | *r.p++;
}

static bool decode0(Reader& r, uint8_t* out, size_t out_sz) {
    Table t;
    if (!read_freqs(r, t.freq)) return false;
    t.build();
    if (r.end - r.p < 16) return false;
    uint32_t st[4];
    for (int j = 0; j < 4; j++) {
        std::memcpy(&st[j], r.p, 4);
        r.p += 4;
    }
    for (size_t i = 0; i < out_sz; i++) {
        uint32_t& x = st[i & 3];
        const uint32_t slot = x & (kTotFreq - 1);
        const uint8_t s = t.sym[slot];
        out[i] = s;
        x = t.freq[s] * (x >> kTfShift) + slot - t.cum[s];
        renorm(x, r);
    }
    return true;
}

static bool decode1(Reader& r, uint8_t* out, size_t out_sz) {
    std::vector<Table> tables(256);
    std::vector<bool> present(256, false);
    int rle = 0;
    int c = r.byte();
    do {
        if (c < 0 || c > 255) return false;
        if (!read_freqs(r, tables[c].freq)) return false;
        present[c] = true;
        if (rle > 0) {
            rle--;
            c++;
        } else if (r.p < r.end && *r.p == c + 1) {
            c = r.byte();
            rle = r.byte();
        } else {
            c = r.byte();
        }
    } while (c != 0 && r.ok);
    if (!r.ok) return false;
    for (int i = 0; i < 256; i++)
        if (present[i]) tables[i].build();
    if (r.end - r.p < 16) return false;
    uint32_t st[4];
    for (int j = 0; j < 4; j++) {
        std::memcpy(&st[j], r.p, 4);
        r.p += 4;
    }
    const size_t isz4 = out_sz >> 2;
    size_t pos[4] = {0, isz4, 2 * isz4, 3 * isz4};
    uint8_t ctx[4] = {0, 0, 0, 0};
    auto step = [&](int j) {
        uint32_t& x = st[j];
        Table& t = tables[ctx[j]];
        const uint32_t slot = x & (kTotFreq - 1);
        const uint8_t s = t.sym[slot];
        out[pos[j]] = s;
        x = t.freq[s] * (x >> kTfShift) + slot - t.cum[s];
        renorm(x, r);
        ctx[j] = s;
        pos[j]++;
    };
    for (size_t i = 0; i < isz4; i++)
        for (int j = 0; j < 4; j++) step(j);
    while (pos[3] < out_sz) step(3);
    return true;
}

}  // namespace rans

static PyObject* rans_uncompress(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    const uint8_t* data = static_cast<const uint8_t*>(buf.buf);
    const Py_ssize_t n = buf.len;
    if (n < 9) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "truncated rANS stream");
        return nullptr;
    }
    const uint8_t order = data[0];
    uint32_t out_sz;
    std::memcpy(&out_sz, data + 5, 4);
    PyObject* result = PyBytes_FromStringAndSize(nullptr, out_sz);
    if (!result) {
        PyBuffer_Release(&buf);
        return nullptr;
    }
    bool ok = true;
    if (out_sz > 0) {
        uint8_t* out = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(result));
        rans::Reader r{data + 9, data + n};
        Py_BEGIN_ALLOW_THREADS
        ok = (order == 0) ? rans::decode0(r, out, out_sz)
             : (order == 1) ? rans::decode1(r, out, out_sz)
                            : false;
        Py_END_ALLOW_THREADS
    }
    PyBuffer_Release(&buf);
    if (!ok) {
        Py_DECREF(result);
        PyErr_SetString(PyExc_ValueError, "corrupt rANS stream");
        return nullptr;
    }
    return result;
}

static PyMethodDef methods[] = {
    {"inflate_bgzf", inflate_bgzf, METH_VARARGS,
     "Inflate concatenated BGZF blocks -> (data, block_coffsets_u64, block_uoffsets_u64)."},
    {"scan_bam_records", scan_bam_records, METH_VARARGS,
     "Scan BAM record boundaries -> uint64-le offsets bytes."},
    {"rans_uncompress", rans_uncompress, METH_VARARGS,
     "Decode a CRAM rANS-4x8 stream (order 0 or 1) -> bytes."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native", "octopus_tpu native host kernels",
    -1, methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
    return PyModule_Create(&moduledef);
}
