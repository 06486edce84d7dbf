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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <string>
#include <tuple>
#include <unordered_map>
#include <utility>
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

// ---------------------------------------------------------------------------
// De-Bruijn bubble extraction (host assembler hot loop)
//
// Mirrors octopus_tpu/core/vargen/assembler.py:DeBruijnGraph bit-for-bit:
// edge iteration follows Python-dict insertion order and the best-first
// search breaks score ties by global push counter, so the extracted bubble
// list is identical to the pure-python implementation (tested in
// tests/test_assembler.py). Capability-equivalent to the reference's
// Assembler bubble extraction (src/core/tools/vargen/utils/assembler.cpp).
// ---------------------------------------------------------------------------

namespace dbg {

struct Edge {
    int dst;
    int weight;
    bool is_ref;   // edge on the reference path
    int ref_order; // index on the reference path, -1 otherwise
};

struct Graph {
    int k;
    // node id <-> (k-1)-mer
    std::unordered_map<std::string, int> ids;
    std::vector<std::string> kmers;
    // adjacency preserving insertion order (Python dict semantics)
    std::vector<std::vector<Edge>> adj;
    std::vector<int> ref_path;       // node ids along the reference
    std::vector<int> ref_index;      // node id -> position on ref path (-1)
    bool valid = true;

    int intern(const char* s, int len) {
        auto it = ids.find(std::string(s, len));
        if (it != ids.end()) return it->second;
        int id = (int)kmers.size();
        ids.emplace(std::string(s, len), id);
        kmers.emplace_back(s, len);
        adj.emplace_back();
        return id;
    }

    Edge* find_edge(int src, int dst) {
        for (auto& e : adj[src])
            if (e.dst == dst) return &e;
        return nullptr;
    }

    void insert_reference(const char* seq, Py_ssize_t n) {
        if (n < k) { valid = false; return; }
        std::vector<int> nodes;
        nodes.reserve(n - k + 2);
        for (Py_ssize_t i = 0; i + k - 1 <= n; ++i)
            nodes.push_back(intern(seq + i, k - 1));
        {   // reference (k-1)-mers must be unique at this k
            std::vector<char> seen(kmers.size(), 0);
            for (int id : nodes) {
                if (seen[id]) { valid = false; return; }
                seen[id] = 1;
            }
        }
        ref_path = nodes;
        for (size_t i = 0; i + 1 < nodes.size(); ++i) {
            int src = nodes[i], dst = nodes[i + 1];
            Edge* e = find_edge(src, dst);
            if (!e) adj[src].push_back(Edge{dst, 0, true, (int)i});
            else { e->is_ref = true; e->ref_order = (int)i; }
        }
        ref_index.assign(kmers.size(), -1);
        for (size_t i = 0; i < ref_path.size(); ++i)
            ref_index[ref_path[i]] = (int)i;
    }

    void insert_clean(const char* seq, Py_ssize_t n) {
        int prev = intern(seq, k - 1);
        for (Py_ssize_t i = 0; i + k <= n; ++i) {
            int node = intern(seq + i + 1, k - 1);
            if (prev >= (int)ref_index.size()) ref_index.resize(kmers.size(), -1);
            Edge* e = find_edge(prev, node);
            if (e) e->weight += 1;
            else adj[prev].push_back(Edge{node, 1, false, -1});
            prev = node;
        }
        if (ref_index.size() < kmers.size()) ref_index.resize(kmers.size(), -1);
    }

    void insert_read(const char* seq, Py_ssize_t n) {
        Py_ssize_t start = 0;
        for (Py_ssize_t i = 0; i <= n; ++i) {
            if (i == n || (unsigned char)seq[i] == 4) {
                if (i - start >= k) insert_clean(seq + start, i - start);
                start = i + 1;
            }
        }
    }

    void prune(int min_weight) {
        // strict threshold (see DeBruijnGraph.prune: the reference's
        // junction leniency keeps single-read noise paths alive in this
        // simpler pipeline)
        for (auto& edges : adj) {
            edges.erase(std::remove_if(edges.begin(), edges.end(),
                                       [&](const Edge& e) {
                                           return e.weight < min_weight && !e.is_ref;
                                       }),
                        edges.end());
        }
    }
};

struct PathEntry {
    int node;
    int parent;  // index into arena, -1 for root
    int start_i; // seed position on the reference path
    int min_w;
    int depth;   // number of nodes on the alt path
};

struct HeapItem {
    int score;       // min edge support along the path
    long counter;    // global push order (FIFO tie-break)
    int entry;       // arena index
    bool operator<(const HeapItem& o) const {
        // max-heap on score, then min on counter
        if (score != o.score) return score < o.score;
        return counter > o.counter;
    }
};

struct Bubble {
    int start_i, end_i;
    std::string alt;
    double score;
};

static bool path_contains(const std::vector<PathEntry>& arena, int entry, int node) {
    for (int e = entry; e >= 0; e = arena[e].parent)
        if (arena[e].node == node) return true;
    return false;
}

static std::vector<Bubble> extract(Graph& g, int max_bubbles, double min_score,
                                   int max_extension, long max_steps) {
    std::vector<Bubble> out;
    std::vector<PathEntry> arena;
    std::priority_queue<HeapItem> heap;
    long counter = 0;
    for (size_t i = 0; i + 1 < g.ref_path.size(); ++i) {
        int src = g.ref_path[i];
        for (const Edge& e : g.adj[src]) {
            if (e.is_ref && e.ref_order == (int)i) continue;
            if (e.weight <= 0) continue;
            if (counter >= max_steps) break;
            arena.push_back(PathEntry{e.dst, -1, (int)i, e.weight, 1});
            heap.push(HeapItem{e.weight, counter++, (int)arena.size() - 1});
        }
    }
    std::set<std::tuple<int, int, std::string>> seen;
    while (!heap.empty() && (int)out.size() < max_bubbles) {
        HeapItem item = heap.top();
        heap.pop();
        const PathEntry ent = arena[item.entry];
        int node = ent.node;
        int ridx = node < (int)g.ref_index.size() ? g.ref_index[node] : -1;
        if (ridx >= 0 && ridx > ent.start_i) {
            // rejoined the reference: alt = first ref node + last char of
            // each path node in root->leaf order
            std::string tail(ent.depth, '\0');
            int e = item.entry;
            for (int d = ent.depth - 1; d >= 0; --d, e = arena[e].parent)
                tail[d] = g.kmers[arena[e].node].back();
            std::string alt = g.kmers[g.ref_path[ent.start_i]] + tail;
            auto key = std::make_tuple(ent.start_i, ridx, alt);
            if (!seen.count(key) && ent.min_w >= min_score) {
                seen.insert(key);
                out.push_back(Bubble{ent.start_i, ridx, alt, (double)ent.min_w});
            }
            continue;
        }
        if (ent.depth > max_extension) continue;
        for (const Edge& e : g.adj[node]) {
            if (e.weight <= 0 && !e.is_ref) continue;
            if (e.dst == g.ref_path[ent.start_i] ||
                path_contains(arena, item.entry, e.dst))
                continue;
            if (counter >= max_steps) break;
            int eff = e.is_ref ? ent.min_w : std::min(ent.min_w, e.weight);
            arena.push_back(PathEntry{e.dst, item.entry, ent.start_i, eff,
                                      ent.depth + 1});
            heap.push(HeapItem{eff, counter++, (int)arena.size() - 1});
        }
    }
    return out;
}

}  // namespace dbg

// extract_bubbles(ref: bytes, reads: list[bytes], k, min_weight, max_bubbles,
//                 min_score, max_extension, max_steps)
//   -> list[(start_i, end_i, alt, score)] | None
static PyObject* extract_bubbles(PyObject*, PyObject* args) {
    Py_buffer ref_buf;
    PyObject* reads;
    int k, min_weight, max_bubbles, max_extension;
    long max_steps = 100000;
    double min_score;
    if (!PyArg_ParseTuple(args, "y*O!iiidi|l", &ref_buf, &PyList_Type, &reads,
                          &k, &min_weight, &max_bubbles, &min_score,
                          &max_extension, &max_steps))
        return nullptr;
    if (k < 2) {
        PyBuffer_Release(&ref_buf);
        PyErr_SetString(PyExc_ValueError, "k must be >= 2");
        return nullptr;
    }
    std::vector<std::pair<const char*, Py_ssize_t>> read_views;
    Py_ssize_t n_reads = PyList_GET_SIZE(reads);
    read_views.reserve(n_reads);
    for (Py_ssize_t i = 0; i < n_reads; ++i) {
        PyObject* item = PyList_GET_ITEM(reads, i);
        char* data;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(item, &data, &len) < 0) {
            PyBuffer_Release(&ref_buf);
            return nullptr;
        }
        read_views.emplace_back(data, len);
    }
    dbg::Graph g;
    g.k = k;
    std::vector<dbg::Bubble> bubbles;
    Py_BEGIN_ALLOW_THREADS
    g.insert_reference((const char*)ref_buf.buf, ref_buf.len);
    if (g.valid) {
        for (auto& rv : read_views) g.insert_read(rv.first, rv.second);
        g.prune(min_weight);
        bubbles = dbg::extract(g, max_bubbles, min_score, max_extension,
                               max_steps);
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&ref_buf);
    if (!g.valid) Py_RETURN_NONE;
    PyObject* out = PyList_New((Py_ssize_t)bubbles.size());
    if (!out) return nullptr;
    for (size_t i = 0; i < bubbles.size(); ++i) {
        const auto& b = bubbles[i];
        PyObject* alt = PyBytes_FromStringAndSize(b.alt.data(),
                                                  (Py_ssize_t)b.alt.size());
        if (!alt) { Py_DECREF(out); return nullptr; }
        PyObject* tup = Py_BuildValue("iiNd", b.start_i, b.end_i, alt, b.score);
        if (!tup) { Py_DECREF(out); return nullptr; }
        PyList_SET_ITEM(out, (Py_ssize_t)i, tup);
    }
    return out;
}

// ---------------------------------------------------------------------------
// Exact tandem repeat finding + repeat-based error-model penalty tracks.
//
// Mirrors octopus_tpu.utils.tandem (itself capability-equivalent to the
// reference's vendored lib/tandem) and the hot loops of
// octopus_tpu.core.likelihood.error_models (reference:
// src/core/models/error/repeat_based_{snv,indel}_error_model.cpp).
// ---------------------------------------------------------------------------

struct RepeatRec {
    int32_t pos, length, period;
};

// ---------------------------------------------------------------------------
// Reference-exact tandem repeat finding.
//
// The reference's error models call tandem::extract_exact_tandem_repeats
// (lib/tandem/tandem.hpp): a naive per-period scan for max_period <= 3 (the
// SNV model's 1..3 call) and the Kolpakov-Kucherov maximal-repetition
// algorithm over a Lempel-Ziv factorisation for larger periods (the indel
// model's 1..5 call).  The two algorithms anchor and report runs
// differently, so both are implemented here and fuzz-verified bit-exact
// against the reference library driven in place (tests/golden/
// golden_tandem.cpp).  This is an independent implementation of the
// published algorithms (Main 1989; Kolpakov & Kucherov 1999; Crochemore
// et al. 2008) matching the reference's output conventions.
// ---------------------------------------------------------------------------

namespace tandem_exact {

using std::uint32_t;
using std::size_t;

static const uint32_t kNone = 0xFFFFFFFFu;

// maximal single-base runs of length >= 2 (tandem.hpp extract_homopolymers)
static void homopolymer_runs(const uint8_t* s, int64_t n,
                             std::vector<RepeatRec>& out) {
    int64_t i = 0;
    while (i + 1 < n) {
        if (s[i] != s[i + 1]) { ++i; continue; }
        int64_t j = i + 1;
        while (j < n && s[j] == s[i]) ++j;
        out.push_back({(int32_t)i, (int32_t)(j - i), 1});
        i = j;
    }
}

// naive period-N runs: anchor at a position where adjacent characters
// differ, extend s[anchor+N..] against s[anchor..]; a match of >= N emits
// the run and restarts at the mismatch point (tandem.hpp:411-436 behaviour)
static void naive_period_runs(const uint8_t* s, int64_t n, int N,
                              std::vector<RepeatRec>& out) {
    if (n < 2 * N) return;
    int64_t a = 0;                       // adjacent_find(!=)
    while (a + 1 < n && s[a] == s[a + 1]) ++a;
    if (a + 1 >= n) return;
    int64_t b = a + N;
    while (b < n) {
        int64_t m = 0;
        while (b + m < n && s[b + m] == s[a + m]) ++m;
        if (a + m >= b) {
            out.push_back({(int32_t)a, (int32_t)(b + m - a), (int32_t)N});
            a += m;
        } else {
            ++a;
        }
        while (a + 1 < n && s[a] == s[a + 1]) ++a;
        if (a + 1 >= n) break;
        b = a + N;
    }
}

// stable merge by pos, earlier-period source first (detail::merge)
static void merge_by_pos(std::vector<RepeatRec>& dst,
                         std::vector<RepeatRec>& src) {
    std::vector<RepeatRec> merged;
    merged.reserve(dst.size() + src.size());
    size_t i = 0, j = 0;
    while (i < dst.size() && j < src.size()) {
        if (src[j].pos < dst[i].pos)
            merged.push_back(src[j++]);
        else
            merged.push_back(dst[i++]);
    }
    for (; i < dst.size(); ++i) merged.push_back(dst[i]);
    for (; j < src.size(); ++j) merged.push_back(src[j]);
    dst.swap(merged);
}

static void extract_naive(const uint8_t* s, int64_t n, int min_p, int max_p,
                          std::vector<RepeatRec>& out) {
    if (min_p == 1) homopolymer_runs(s, n, out);
    for (int p = std::max(2, min_p); p <= max_p; ++p) {
        std::vector<RepeatRec> runs;
        naive_period_runs(s, n, p, runs);
        merge_by_pos(out, runs);
    }
}

// suffix array by radix-sort prefix doubling, O(n log n)
// (output identical to any correct SA)
static std::vector<uint32_t> suffix_array(const std::vector<uint8_t>& s) {
    const int64_t n = (int64_t)s.size();
    std::vector<uint32_t> sa(n), sa2(n);
    std::vector<int64_t> rank(n), tmp(n);
    {   // initial counting sort by character
        int64_t cnt[257] = {0};
        for (int64_t i = 0; i < n; ++i) ++cnt[s[i] + 1];
        for (int i = 0; i < 256; ++i) cnt[i + 1] += cnt[i];
        for (int64_t i = 0; i < n; ++i) sa[cnt[s[i]]++] = (uint32_t)i;
        rank[sa[0]] = 0;
        for (int64_t i = 1; i < n; ++i)
            rank[sa[i]] = rank[sa[i - 1]] + (s[sa[i]] != s[sa[i - 1]] ? 1 : 0);
    }
    std::vector<int64_t> cnt(n + 1);
    for (int64_t k = 1; rank[sa[n - 1]] != n - 1; k *= 2) {
        // second key: suffixes i >= n-k have empty second half (smallest);
        // then positions sa[j]-k in first-key order
        int64_t p = 0;
        for (int64_t i = n - k; i < n; ++i) sa2[p++] = (uint32_t)i;
        for (int64_t j = 0; j < n; ++j)
            if ((int64_t)sa[j] >= k) sa2[p++] = sa[j] - (uint32_t)k;
        // stable counting sort by first key
        std::fill(cnt.begin(), cnt.end(), 0);
        for (int64_t i = 0; i < n; ++i) ++cnt[rank[i] + 1];
        for (int64_t i = 0; i < n; ++i) cnt[i + 1] += cnt[i];
        for (int64_t j = 0; j < n; ++j) sa[cnt[rank[sa2[j]]]++] = sa2[j];
        // re-rank
        tmp[sa[0]] = 0;
        for (int64_t i = 1; i < n; ++i) {
            const uint32_t x = sa[i - 1], y = sa[i];
            const int64_t rx2 = x + k < n ? rank[x + k] : -1;
            const int64_t ry2 = y + k < n ? rank[y + k] : -1;
            tmp[y] = tmp[x] + ((rank[x] != rank[y] || rx2 != ry2) ? 1 : 0);
        }
        std::copy(tmp.begin(), tmp.end(), rank.begin());
    }
    return sa;
}

// Kasai LCP; lcp[r] = LCP(sa[r-1], sa[r])
static std::vector<uint32_t> lcp_array(const std::vector<uint8_t>& s,
                                       const std::vector<uint32_t>& sa) {
    const int64_t n = (int64_t)sa.size();
    std::vector<uint32_t> rank(n), lcp(n, 0);
    for (int64_t r = 0; r < n; ++r) rank[sa[r]] = (uint32_t)r;
    int64_t h = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (rank[i] > 0) {
            const int64_t j = sa[rank[i] - 1];
            while (i + h < n && j + h < n && s[i + h] == s[j + h]) ++h;
            lcp[rank[i]] = (uint32_t)h;
            if (h > 0) --h;
        }
    }
    return lcp;
}

// LPF + previous-occurrence arrays (Crochemore et al. 2008 stack pass,
// with the reference's one-slot zero padding of sa/lcp: tandem.hpp
// make_lpf_and_prev_occ_arrays via make_suffix_array(str, 1))
static void lpf_prev_occ(std::vector<uint32_t> sa, std::vector<uint32_t> lcp,
                         std::vector<uint32_t>& lpf,
                         std::vector<uint32_t>& prev) {
    const size_t n = sa.size();       // includes the padding slot
    lpf.assign(n, 0);
    prev.assign(n, 0);
    sa.push_back(kNone);
    lcp.push_back(0);
    std::vector<std::pair<uint32_t, uint32_t>> st;  // (lcp, sa) stack
    st.emplace_back(0, sa[0]);
    for (uint32_t i = 1; i <= n; ++i) {
        uint32_t u = lcp[i];
        while (!st.empty() && (sa[i] == kNone || sa[i] < st.back().second)) {
            const auto top = st.back();
            const uint32_t lo = std::min(top.first, u);
            const uint32_t hi = std::max(top.first, u);
            u = lo;
            lpf[top.second] = hi;
            st.pop_back();
            if (lpf[top.second] == 0) {
                prev[top.second] = kNone;
            } else if (top.first > u) {
                prev[top.second] = st.back().second;
            } else {
                prev[top.second] = sa[i];
            }
        }
        if (i < n) st.emplace_back(u, sa[i]);
    }
}

struct LZBlock {
    uint32_t pos, length;
};

// forward LCE: matched length of s[i..] vs s[j..] with the first range
// bounded by `limit`
static uint32_t lce_fwd(const std::vector<uint8_t>& s, uint32_t i, uint32_t j,
                        uint32_t limit) {
    uint32_t k = 0;
    while (i + k < limit && s[i + k] == s[j + k]) ++k;
    return k;
}

// backward LCE: matched length of s[i],s[i-1],... vs s[j],s[j-1],...,
// scanning the first range down to s[floor] inclusive (j >= i >= floor)
static uint32_t lce_bwd(const std::vector<uint8_t>& s, uint32_t i, uint32_t j,
                        uint32_t floor) {
    uint32_t k = 0;
    while (k <= i - floor && s[i - k] == s[j - k]) ++k;
    return k;
}

// Main (1989): maximal periodicities touching the boundary of `block`
static void add_block_periodicities(const std::vector<uint8_t>& s,
                                    const LZBlock& prev_block,
                                    const LZBlock& block,
                                    uint32_t min_p, uint32_t max_p,
                                    std::vector<RepeatRec>& out) {
    const uint32_t u = block.pos;
    const uint32_t n = block.length;
    const uint32_t m = std::min(u, 2 * prev_block.length + n);
    const uint32_t t = u - m;
    const uint32_t end = u + n;
    for (uint32_t j = min_p; j <= std::min(n, max_p); ++j) {   // rightmax
        const uint32_t ls = lce_bwd(s, u - 1, u + j - 1, t);
        const uint32_t lp = lce_fwd(s, u + j, u, end);
        if (ls + lp >= j && j + lp < n)
            out.push_back({(int32_t)(u - ls), (int32_t)(j + lp + ls),
                           (int32_t)j});
    }
    for (uint32_t j = min_p; j < std::min(m, max_p); ++j) {    // leftmax
        const uint32_t ls = lce_bwd(s, u - j - 1, u - 1, t);
        const uint32_t lp = lce_fwd(s, u, u - j, end);
        if (ls + lp >= j)
            out.push_back({(int32_t)(u - (ls + j)), (int32_t)(j + lp + ls),
                           (int32_t)j});
    }
}

// Kolpakov & Kucherov (1999) over the LZ factorisation, matching the
// reference's bucket conventions (dedup by (pos, length) only; shifted
// copies inserted at the front of each start bucket)
static void extract_lz(const std::vector<uint8_t>& s, uint32_t min_p,
                       uint32_t max_p, std::vector<RepeatRec>& out) {
    const size_t n = s.size();
    // LZ factorisation with previous block occurrences
    std::vector<uint32_t> sa = suffix_array(s);
    std::vector<uint32_t> lcp = lcp_array(s, sa);
    sa.push_back(0);                  // the reference's one-slot padding
    lcp.push_back(0);
    std::vector<uint32_t> lpf, prev;
    lpf_prev_occ(sa, lcp, lpf, prev);
    std::vector<LZBlock> blocks;
    std::vector<uint32_t> block_prev;
    blocks.push_back({0, 1});
    block_prev.push_back(kNone);
    for (uint32_t end = 1; end < n;) {
        const uint32_t m = std::max(uint32_t{1}, lpf[end]);
        blocks.push_back({end, m});
        block_prev.push_back(prev[end]);
        end += m;
    }
    // leftmost maximal repetitions (Main 1989), bucketed by END position
    // with (pos, length) dedup, then re-bucketed by START
    std::vector<RepeatRec> lmrs;
    for (size_t h = 1; h < blocks.size(); ++h)
        add_block_periodicities(s, blocks[h - 1], blocks[h], min_p, max_p,
                                lmrs);
    std::vector<std::vector<RepeatRec>> end_buckets(n);
    for (const auto& r : lmrs) {
        auto& bucket = end_buckets[r.pos + r.length - 1];
        bool dup = false;
        for (const auto& e : bucket)
            if (e.pos == r.pos && e.length == r.length) { dup = true; break; }
        if (!dup) bucket.push_back(r);
    }
    std::vector<std::vector<RepeatRec>> start_buckets(n);
    for (auto& bucket : end_buckets)
        for (const auto& r : bucket)
            start_buckets[r.pos].push_back(r);
    // propagate repeats into later LZ-block occurrences
    for (size_t k = 0; k < blocks.size(); ++k) {
        const auto& block = blocks[k];
        const uint32_t block_end = block.pos + block.length;
        const uint32_t delta =
            block.pos - (block_prev[k] != kNone ? block_prev[k] : 0);
        const uint32_t max_target_end = block_end - delta;
        for (uint32_t j = block.pos; j < block_end; ++j) {
            const uint32_t target_start = j - delta;
            auto& target = start_buckets[target_start];
            uint32_t target_end = max_target_end;
            if (!start_buckets[j].empty())
                target_end = std::min(
                    target_start + (uint32_t)start_buckets[j].front().length,
                    max_target_end);
            // first run whose end reaches target_end (buckets are kept
            // sorted by end via construction order)
            size_t cnt = 0;
            while (cnt < target.size()
                   && (uint32_t)(target[cnt].pos + target[cnt].length)
                          < target_end)
                ++cnt;
            if (cnt > 0) {
                std::vector<RepeatRec> shifted(target.begin(),
                                               target.begin() + cnt);
                for (auto& r : shifted) r.pos += (int32_t)delta;
                start_buckets[j].insert(start_buckets[j].begin(),
                                        shifted.begin(), shifted.end());
            }
        }
    }
    for (auto& bucket : start_buckets)
        for (const auto& r : bucket) out.push_back(r);
}

// base-code -> ASCII mapping: the reference runs on 'ACGTN' characters and
// the suffix-array ORDER matters ('N' sorts between 'G' and 'T')
static std::vector<uint8_t> to_ascii(const uint8_t* codes, int64_t n) {
    static const uint8_t kMap[5] = {'A', 'C', 'G', 'T', 'N'};
    std::vector<uint8_t> s(n);
    for (int64_t i = 0; i < n; ++i) s[i] = kMap[codes[i] < 5 ? codes[i] : 4];
    return s;
}

static void extract(const uint8_t* codes, int64_t n, int min_p, int max_p,
                    std::vector<RepeatRec>& out) {
    if (min_p == 0) min_p = 1;
    if (n == 0 || n < min_p) return;
    if (max_p <= 3) {
        extract_naive(codes, n, min_p, max_p, out);
    } else {
        const auto s = to_ascii(codes, n);
        extract_lz(s, (uint32_t)min_p, (uint32_t)max_p, out);
    }
}

}  // namespace tandem_exact

static void find_tandem_repeats(const uint8_t* s, Py_ssize_t n,
                                int min_p, int max_p,
                                std::vector<RepeatRec>& out) {
    for (int p = std::max(1, min_p); p <= max_p; ++p) {
        if (p == 1) {
            Py_ssize_t i = 0;
            while (i < n) {
                Py_ssize_t j = i + 1;
                while (j < n && s[j] == s[i]) ++j;
                if (j - i >= 2)
                    out.push_back({(int32_t)i, (int32_t)(j - i), 1});
                i = j;
            }
        } else {
            if (n < 2 * p) continue;
            const Py_ssize_t m = n - p;     // eq[i] = s[i] == s[i+p]
            Py_ssize_t i = 0;
            while (i < m) {
                if (s[i] != s[i + p]) { ++i; continue; }
                Py_ssize_t e = i + 1;       // maximal eq-run [i, e)
                while (e < m && s[e] == s[e + p]) ++e;
                Py_ssize_t len = (e - i) + p;
                if (len >= 2 * p) {
                    // advance start past a leading homopolymer run (tandem.py
                    // _find_period_runs; reference tandem.hpp:411-436)
                    Py_ssize_t pos = i;
                    while (pos + 1 < e && s[pos] == s[pos + 1] &&
                           pos + 1 + 2 * p <= e + p)
                        ++pos;
                    len = e + p - pos;
                    if (len >= 2 * p) {
                        bool primitive = true;  // motif not a repetition itself
                        for (int d = 1; d < p && primitive; ++d) {
                            if (p % d) continue;
                            bool all = true;
                            for (int k = 0; k < p; ++k)
                                if (s[pos + k] != s[pos + k % d]) { all = false; break; }
                            if (all) primitive = false;
                        }
                        if (primitive)
                            out.push_back({(int32_t)pos, (int32_t)len, (int32_t)p});
                    }
                }
                i = e;
            }
        }
    }
    std::sort(out.begin(), out.end(), [](const RepeatRec& a, const RepeatRec& b) {
        return a.pos != b.pos ? a.pos < b.pos : a.period < b.period;
    });
}

// tandem_repeats(codes: u8 buffer, min_period, max_period)
//   -> int32-le bytes of (pos, length, period) triples
static PyObject* tandem_repeats(PyObject*, PyObject* args) {
    Py_buffer buf;
    int min_p, max_p;
    if (!PyArg_ParseTuple(args, "y*ii", &buf, &min_p, &max_p)) return nullptr;
    std::vector<RepeatRec> reps;
    Py_BEGIN_ALLOW_THREADS
    tandem_exact::extract((const uint8_t*)buf.buf, buf.len, min_p, max_p, reps);
    std::sort(reps.begin(), reps.end(),
              [](const RepeatRec& a, const RepeatRec& b) {
                  return a.pos != b.pos ? a.pos < b.pos : a.period < b.period;
              });
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    PyObject* result = PyBytes_FromStringAndSize(
        (const char*)reps.data(), (Py_ssize_t)(reps.size() * sizeof(RepeatRec)));
    return result;
}

static void count_runs_impl(const int16_t* mask, Py_ssize_t n, int max_gap,
                            int32_t* out) {
    if (n == 0) return;
    std::memset(out, 0, n * sizeof(int32_t));
    int16_t prev = mask[0];
    int32_t count = prev > 0 ? 1 : 0;
    int gap = 0;
    for (Py_ssize_t i = 1; i < n; ++i) {
        int16_t x = mask[i];
        int32_t emitted = 0;
        if (x == 0) {
            ++gap;
            if (count > 0) {
                if (gap == 1) {
                    emitted = count;
                    if (max_gap < 1) count = 0;
                } else if (gap > max_gap) {
                    count = 0;
                }
            }
        } else if (prev == x) {
            gap = 0;
            ++count;
        } else {
            prev = x;
            emitted = count;
            count = 1;
        }
        out[i] = emitted;
    }
}

// snv_priors(codes: u8, subst_mask: u8 (may be empty), max_q,
//            caps1: i16 buffer, caps2: i16, caps3: i16)
//   -> (fwd int16-le bytes, rev int16-le bytes)
// Full RepeatBasedSnvErrorModel.evaluate (error_models.py:110-135).
static PyObject* snv_priors(PyObject*, PyObject* args) {
    Py_buffer codes_b, sub_b, c1_b, c2_b, c3_b;
    int max_q;
    if (!PyArg_ParseTuple(args, "y*y*iy*y*y*", &codes_b, &sub_b, &max_q,
                          &c1_b, &c2_b, &c3_b))
        return nullptr;
    const uint8_t* codes = (const uint8_t*)codes_b.buf;
    const Py_ssize_t n = codes_b.len;
    const uint8_t* sub = (const uint8_t*)sub_b.buf;
    const bool has_sub = sub_b.len == n;
    const int16_t* caps[3] = {(const int16_t*)c1_b.buf, (const int16_t*)c2_b.buf,
                              (const int16_t*)c3_b.buf};
    const Py_ssize_t ncaps[3] = {
        c1_b.len / (Py_ssize_t)sizeof(int16_t),
        c2_b.len / (Py_ssize_t)sizeof(int16_t),
        c3_b.len / (Py_ssize_t)sizeof(int16_t)};
    PyObject* fwd_o = PyBytes_FromStringAndSize(nullptr, n * sizeof(int16_t));
    PyObject* rev_o = PyBytes_FromStringAndSize(nullptr, n * sizeof(int16_t));
    if (!fwd_o || !rev_o) {
        Py_XDECREF(fwd_o); Py_XDECREF(rev_o);
        PyBuffer_Release(&codes_b); PyBuffer_Release(&sub_b);
        PyBuffer_Release(&c1_b); PyBuffer_Release(&c2_b); PyBuffer_Release(&c3_b);
        return nullptr;
    }
    int16_t* fwd = (int16_t*)PyBytes_AS_STRING(fwd_o);
    int16_t* rev = (int16_t*)PyBytes_AS_STRING(rev_o);
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; ++i) { fwd[i] = (int16_t)max_q; rev[i] = (int16_t)max_q; }
    std::vector<RepeatRec> reps;
    tandem_exact::extract(codes, n, 1, 3, reps);
    std::vector<int16_t> mask(n), rmask(n);
    std::vector<int32_t> runs(n);
    for (int period = 1; period <= 3; ++period) {
        std::fill(mask.begin(), mask.end(), 0);
        bool any = false;
        for (const auto& r : reps) {
            if (r.period != period) continue;
            any = true;
            // base-sum motif hash so adjacent distinct repeats break runs
            int32_t h = period + 1;
            for (int k = 0; k < period; ++k) h += codes[r.pos + k];
            for (int32_t j = r.pos; j < r.pos + r.length && j < n; ++j)
                mask[j] = (int16_t)h;
        }
        if (!any) continue;
        const int16_t* cp = caps[period - 1];
        const Py_ssize_t nc = ncaps[period - 1];
        const int max_gap = period + 1;
        count_runs_impl(mask.data(), n, max_gap, runs.data());
        for (Py_ssize_t i = 0; i < n; ++i) {
            Py_ssize_t k = runs[i] < nc - 1 ? runs[i] : nc - 1;
            if (cp[k] < fwd[i]) fwd[i] = cp[k];
        }
        for (Py_ssize_t i = 0; i < n; ++i) rmask[i] = mask[n - 1 - i];
        count_runs_impl(rmask.data(), n, max_gap, runs.data());
        for (Py_ssize_t i = 0; i < n; ++i) {
            Py_ssize_t k = runs[n - 1 - i] < nc - 1 ? runs[n - 1 - i] : nc - 1;
            if (cp[k] < rev[i]) rev[i] = cp[k];
        }
    }
    if (has_sub) {
        for (Py_ssize_t i = 0; i < n; ++i)
            if (sub[i]) { fwd[i] = (int16_t)max_q; rev[i] = (int16_t)max_q; }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&codes_b); PyBuffer_Release(&sub_b);
    PyBuffer_Release(&c1_b); PyBuffer_Release(&c2_b); PyBuffer_Release(&c3_b);
    PyObject* tup = PyTuple_Pack(2, fwd_o, rev_o);
    Py_DECREF(fwd_o); Py_DECREF(rev_o);
    return tup;
}

// indel_penalties(codes: u8, default_open, default_extend,
//                 at_open: i16, cg_open: i16, di_open: i16, tri_open: i16,
//                 homo_ext: i16, di_ext: i16, tri_ext: i16)
//   -> (gap_open int16-le bytes, gap_extend int16-le bytes)
// Full RepeatBasedIndelErrorModel.set_penalties (error_models.py:242-254).
// Base codes: A=0 C=1 G=2 T=3.
static PyObject* indel_penalties(PyObject*, PyObject* args) {
    Py_buffer codes_b, at_b, cg_b, di_b, tri_b, he_b, de_b, te_b;
    int def_open, def_ext;
    if (!PyArg_ParseTuple(args, "y*iiy*y*y*y*y*y*y*", &codes_b, &def_open,
                          &def_ext, &at_b, &cg_b, &di_b, &tri_b, &he_b, &de_b,
                          &te_b))
        return nullptr;
    const uint8_t* codes = (const uint8_t*)codes_b.buf;
    const Py_ssize_t n = codes_b.len;
    PyObject* open_o = PyBytes_FromStringAndSize(nullptr, n * sizeof(int16_t));
    PyObject* ext_o = PyBytes_FromStringAndSize(nullptr, n * sizeof(int16_t));
    if (!open_o || !ext_o) {
        Py_XDECREF(open_o); Py_XDECREF(ext_o);
        PyBuffer_Release(&codes_b); PyBuffer_Release(&at_b); PyBuffer_Release(&cg_b);
        PyBuffer_Release(&di_b); PyBuffer_Release(&tri_b); PyBuffer_Release(&he_b);
        PyBuffer_Release(&de_b); PyBuffer_Release(&te_b);
        return nullptr;
    }
    int16_t* gap_open = (int16_t*)PyBytes_AS_STRING(open_o);
    int16_t* gap_ext = (int16_t*)PyBytes_AS_STRING(ext_o);
    Py_BEGIN_ALLOW_THREADS
    auto lookup = [](const Py_buffer& b, Py_ssize_t idx) -> int16_t {
        const int16_t* t = (const int16_t*)b.buf;
        Py_ssize_t m = b.len / (Py_ssize_t)sizeof(int16_t);
        return t[idx < m ? idx : m - 1];
    };
    for (Py_ssize_t i = 0; i < n; ++i) {
        gap_open[i] = (int16_t)def_open;
        gap_ext[i] = (int16_t)def_ext;
    }
    std::vector<RepeatRec> reps;
    tandem_exact::extract(codes, n, 1, 5, reps);
    std::sort(reps.begin(), reps.end(),
              [](const RepeatRec& a, const RepeatRec& b) {
                  return a.pos != b.pos ? a.pos < b.pos : a.period < b.period;
              });
    std::stable_sort(reps.begin(), reps.end(),
                     [](const RepeatRec& a, const RepeatRec& b) {
                         return a.length < b.length;
                     });
    for (const auto& r : reps) {
        const int period = r.period;
        const Py_ssize_t periodicity = r.length / period;
        int16_t opn, ext;
        if (period == 1) {
            const uint8_t b0 = codes[r.pos];
            opn = (b0 == 0 || b0 == 3) ? lookup(at_b, periodicity)
                                       : lookup(cg_b, periodicity);
            ext = lookup(he_b, periodicity);
        } else if (period == 2) {
            opn = lookup(di_b, periodicity);
            const uint8_t b0 = codes[r.pos], b1 = codes[r.pos + 1];
            // CG dinucleotide repeats are extra error-prone
            if (opn > 7 && ((b0 == 1 && b1 == 2) || (b0 == 2 && b1 == 1)))
                opn -= 2;
            ext = lookup(de_b, periodicity);
        } else {
            opn = lookup(tri_b, periodicity);
            ext = lookup(te_b, periodicity);
        }
        const Py_ssize_t lo = r.pos;
        const Py_ssize_t hi = std::min((Py_ssize_t)(r.pos + r.length), n);
        for (Py_ssize_t i = lo; i < hi; ++i) {
            if (opn < gap_open[i]) gap_open[i] = opn;
            gap_ext[i] = ext;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&codes_b); PyBuffer_Release(&at_b); PyBuffer_Release(&cg_b);
    PyBuffer_Release(&di_b); PyBuffer_Release(&tri_b); PyBuffer_Release(&he_b);
    PyBuffer_Release(&de_b); PyBuffer_Release(&te_b);
    PyObject* tup = PyTuple_Pack(2, open_o, ext_o);
    Py_DECREF(open_o); Py_DECREF(ext_o);
    return tup;
}

// ---------------------------------------------------------------------------
// Full BAM record decode.
//
// Mirrors octopus_tpu.io.bam.BamFile._decode_records (reference:
// src/io/read/htslib_sam_facade.cpp record conversion): one pass over the
// inflated BGZF buffer, region/flag filtering, 4-bit sequence decode, CIGAR
// expansion, reference-span computation and FNV-1a name hashing — the
// numpy fancy-index gathers and per-record python loops collapse into one
// native call.
// ---------------------------------------------------------------------------

// decode_bam_records(buf: y*, ref_id, begin: L, end: L, seq4_table: y* 16)
//   -> (pos_i64, ends_i64, mapq_u8, flags_u16, next_ref_i32, next_pos_i64,
//       tlen_i32, name_hash_u64, name_blob_u8, name_offsets_i64,
//       seq_u8, quals_u8, seq_offsets_i64, cigar_i32, cigar_offsets_i64,
//       aux_start_i64, aux_end_i64)  all little-endian bytes objects
static PyObject* decode_bam_records(PyObject*, PyObject* args) {
    Py_buffer buf_b, tbl_b;
    int ref_id;
    long long begin, end;
    if (!PyArg_ParseTuple(args, "y*iLLy*", &buf_b, &ref_id, &begin, &end,
                          &tbl_b))
        return nullptr;
    if (tbl_b.len < 16) {
        PyBuffer_Release(&buf_b); PyBuffer_Release(&tbl_b);
        PyErr_SetString(PyExc_ValueError, "seq4 table must be 16 bytes");
        return nullptr;
    }
    const uint8_t* data = (const uint8_t*)buf_b.buf;
    const Py_ssize_t n_bytes = buf_b.len;
    const uint8_t* tbl = (const uint8_t*)tbl_b.buf;
    std::vector<int64_t> pos_v, ends_v, next_pos_v, name_off_v{0}, seq_off_v{0},
        cig_off_v{0}, aux_s_v, aux_e_v;
    std::vector<uint8_t> mapq_v, name_blob, seq_v, qual_v;
    std::vector<uint16_t> flags_v;
    std::vector<int32_t> next_ref_v, tlen_v, cig_v;
    std::vector<uint64_t> hash_v;
    Py_BEGIN_ALLOW_THREADS
    auto rd_i32 = [&](Py_ssize_t o) -> int32_t {
        return (int32_t)(data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
                         | ((uint32_t)data[o + 3] << 24));
    };
    auto rd_u16 = [&](Py_ssize_t o) -> uint16_t {
        return (uint16_t)(data[o] | (data[o + 1] << 8));
    };
    Py_ssize_t off = 0;
    while (off + 4 <= n_bytes) {
        const int32_t block_size = rd_i32(off);
        if (block_size <= 0 || off + 4 + block_size > n_bytes) break;
        const Py_ssize_t rec = off;
        off += 4 + block_size;
        const int32_t rec_ref = rd_i32(rec + 4);
        const int64_t rec_pos = rd_i32(rec + 8);
        const uint16_t flags = rd_u16(rec + 18);
        if (rec_ref != ref_id || rec_pos >= end || (flags & 0x4)) continue;
        const int l_read_name = data[rec + 12];
        const uint8_t mapq = data[rec + 13];
        const int n_cigar = rd_u16(rec + 16);
        const int64_t l_seq = rd_i32(rec + 20);
        const int32_t next_ref = rd_i32(rec + 24);
        const int64_t next_pos = rd_i32(rec + 28);
        const int32_t tlen = rd_i32(rec + 32);
        const Py_ssize_t name_off = rec + 36;
        const Py_ssize_t cigar_off = name_off + l_read_name;
        const Py_ssize_t seq_off = cigar_off + 4 * (Py_ssize_t)n_cigar;
        const Py_ssize_t qual_off = seq_off + (l_seq + 1) / 2;
        const Py_ssize_t aux_off = qual_off + l_seq;
        const Py_ssize_t rec_end = rec + 4 + block_size;
        if (aux_off > rec_end) continue;  // malformed
        // reference span from cigar (ops M=0 D=2 N=3 EQ=7 X=8 consume ref)
        int64_t span = 0;
        for (int c = 0; c < n_cigar; ++c) {
            const uint32_t w = (uint32_t)rd_i32(cigar_off + 4 * c);
            const uint32_t op = w & 0xF;
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                span += w >> 4;
        }
        const int64_t rec_endpos = rec_pos + span;
        if (rec_endpos <= begin) continue;
        pos_v.push_back(rec_pos);
        ends_v.push_back(rec_endpos);
        mapq_v.push_back(mapq);
        flags_v.push_back(flags);
        next_ref_v.push_back(next_ref);
        next_pos_v.push_back(next_pos);
        tlen_v.push_back(tlen);
        // FNV-1a over the NUL-terminated read name (without the NUL)
        uint64_t h = 1469598103934665603ull;
        for (int k = 0; k + 1 < l_read_name; ++k) {
            h ^= data[name_off + k];
            h *= 1099511628211ull;
        }
        hash_v.push_back(h);
        name_blob.insert(name_blob.end(), data + name_off,
                         data + name_off + (l_read_name > 0 ? l_read_name - 1 : 0));
        name_off_v.push_back((int64_t)name_blob.size());
        for (int c = 0; c < n_cigar; ++c) {
            const uint32_t w = (uint32_t)rd_i32(cigar_off + 4 * c);
            cig_v.push_back((int32_t)(w >> 4));
            cig_v.push_back((int32_t)(w & 0xF));
        }
        cig_off_v.push_back((int64_t)(cig_v.size() / 2));
        for (int64_t k = 0; k < l_seq; ++k) {
            const uint8_t nib = data[seq_off + k / 2];
            seq_v.push_back(tbl[(k % 2 == 0) ? (nib >> 4) : (nib & 0xF)]);
            const uint8_t q = data[qual_off + k];
            qual_v.push_back(q == 0xFF ? 30 : q);
        }
        seq_off_v.push_back((int64_t)seq_v.size());
        aux_s_v.push_back((int64_t)aux_off);
        aux_e_v.push_back((int64_t)rec_end);
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf_b); PyBuffer_Release(&tbl_b);
    auto mk = [](const void* p, size_t nbytes) {
        return PyBytes_FromStringAndSize((const char*)p, (Py_ssize_t)nbytes);
    };
    PyObject* tup = Py_BuildValue(
        "(NNNNNNNNNNNNNNNNN)",
        mk(pos_v.data(), pos_v.size() * 8),
        mk(ends_v.data(), ends_v.size() * 8),
        mk(mapq_v.data(), mapq_v.size()),
        mk(flags_v.data(), flags_v.size() * 2),
        mk(next_ref_v.data(), next_ref_v.size() * 4),
        mk(next_pos_v.data(), next_pos_v.size() * 8),
        mk(tlen_v.data(), tlen_v.size() * 4),
        mk(hash_v.data(), hash_v.size() * 8),
        mk(name_blob.data(), name_blob.size()),
        mk(name_off_v.data(), name_off_v.size() * 8),
        mk(seq_v.data(), seq_v.size()),
        mk(qual_v.data(), qual_v.size()),
        mk(seq_off_v.data(), seq_off_v.size() * 8),
        mk(cig_v.data(), cig_v.size() * 4),
        mk(cig_off_v.data(), cig_off_v.size() * 8),
        mk(aux_s_v.data(), aux_s_v.size() * 8),
        mk(aux_e_v.data(), aux_e_v.size() * 8));
    return tup;
}

// ---------------------------------------------------------------------------
// CIGAR candidate scan.
//
// Mirrors octopus_tpu.core.vargen.cigar_scanner._scan_read (reference:
// src/core/tools/vargen/cigar_scanner.cpp:80-260) over a whole ReadBatch in
// one call: mismatch/ins/del candidate extraction + the Poisson-tail
// misalignment filter.  Returns packed candidate records; Python slices the
// ref/alt byte strings from buffers it already holds.
// ---------------------------------------------------------------------------

static double poisson_lnsf(int64_t k_minus_1, double mu) {
    // ln P(Poisson(mu) >= k), direct upper-tail sum in log space
    // (cigar_scanner.py:_poisson_lnsf)
    const int64_t k = k_minus_1 + 1;
    if (mu <= 0.0) return k <= 0 ? 0.0 : -std::numeric_limits<double>::infinity();
    const double lead = -mu + k * std::log(mu) - std::lgamma((double)k + 1.0);
    double total = 1.0, ratio = 1.0;
    int64_t i = k;
    for (;;) {
        ++i;
        ratio *= mu / (double)i;
        if (ratio < 1e-18) break;
        total += ratio;
    }
    return std::min(lead + std::log(total), 0.0);
}

struct ScanCand {
    int32_t read;       // read index in batch
    int32_t offset;     // alt start offset within read
    int32_t alt_len;
    int32_t sum_q;
    int64_t begin, end; // ref coordinates
    uint8_t at_edge, misaligned;
    uint8_t pad_[6];
};

// scan_cigar_reads(ref_chunk: u8, chunk_begin: i64,
//                  begins: i64, ends: i64, mapq: u8,
//                  seq: u8, quals: u8, seq_offsets: i64,
//                  cigar_ops: i32 (total, 2), cigar_offsets: i64,
//                  snv_threshold, snv_penalty, indel_penalty, clip_penalty,
//                  max_unpenalised_clip, max_variant_size,
//                  use_misalign_filter, max_expected_mutation_rate,
//                  min_ln_prob_correctly_aligned)
//   -> bytes of ScanCand records (48 bytes each)
static PyObject* scan_cigar_reads(PyObject*, PyObject* args) {
    Py_buffer ref_b, beg_b, end_b, mq_b, seq_b, qual_b, soff_b, cig_b, coff_b;
    long long chunk_begin;
    int snv_threshold, max_clip, use_filter;
    long long max_var_size;
    double snv_pen, indel_pen, clip_pen, mut_rate, min_ln_prob;
    if (!PyArg_ParseTuple(args, "y*Ly*y*y*y*y*y*y*y*idddiLidd",
                          &ref_b, &chunk_begin, &beg_b, &end_b, &mq_b,
                          &seq_b, &qual_b, &soff_b, &cig_b, &coff_b,
                          &snv_threshold, &snv_pen, &indel_pen, &clip_pen,
                          &max_clip, &max_var_size, &use_filter,
                          &mut_rate, &min_ln_prob))
        return nullptr;
    const uint8_t* ref = (const uint8_t*)ref_b.buf;
    const Py_ssize_t ref_n = ref_b.len;
    const int64_t* begins = (const int64_t*)beg_b.buf;
    const int64_t* ends = (const int64_t*)end_b.buf;
    const uint8_t* mapq = (const uint8_t*)mq_b.buf;
    const uint8_t* seq = (const uint8_t*)seq_b.buf;
    const uint8_t* quals = (const uint8_t*)qual_b.buf;
    const int64_t* soff = (const int64_t*)soff_b.buf;
    const int32_t* cig = (const int32_t*)cig_b.buf;
    const int64_t* coff = (const int64_t*)coff_b.buf;
    const Py_ssize_t n_reads = beg_b.len / (Py_ssize_t)sizeof(int64_t);
    std::vector<ScanCand> out;
    out.reserve(256);
    Py_BEGIN_ALLOW_THREADS
    std::vector<ScanCand> found;
    for (Py_ssize_t r = 0; r < n_reads; ++r) {
        const int64_t begin = begins[r], end = ends[r];
        const uint8_t* rs = seq + soff[r];
        const uint8_t* rq = quals + soff[r];
        int64_t ref_i = begin;
        int64_t read_i = 0;
        double penalty = 0.0;
        found.clear();
        for (int64_t c = coff[r]; c < coff[r + 1]; ++c) {
            const int32_t length = cig[2 * c];
            const int32_t op = cig[2 * c + 1];
            switch (op) {
            case 0: case 7: case 8: {          // M, EQ, X
                const int64_t ro = ref_i - chunk_begin;
                for (int32_t i = 0; i < length; ++i) {
                    if (ro + i < 0 || ro + i >= ref_n) continue;
                    const uint8_t rb = ref[ro + i], qb = rs[read_i + i];
                    if (rb != qb && rb != 4 && qb != 4) {
                        found.push_back({(int32_t)r, (int32_t)(read_i + i), 1, 0,
                                         ref_i + i, ref_i + i + 1, 0, 0, {}});
                        if (rq[read_i + i] >= snv_threshold) penalty += snv_pen;
                    }
                }
                read_i += length;
                ref_i += length;
                break;
            }
            case 1:                            // I
                found.push_back({(int32_t)r, (int32_t)read_i, length, 0,
                                 ref_i, ref_i, 0, 0, {}});
                read_i += length;
                penalty += indel_pen;
                break;
            case 2:                            // D
                found.push_back({(int32_t)r, (int32_t)read_i, 0, 0,
                                 ref_i, ref_i + length, 0, 0, {}});
                ref_i += length;
                penalty += indel_pen;
                break;
            case 4:                            // S
                read_i += length;
                if (length > max_clip) penalty += clip_pen;
                break;
            case 5:                            // H
                if (length > max_clip) penalty += clip_pen;
                break;
            case 3: case 6:                    // NSKIP, P
                ref_i += length;
                break;
            default:
                break;
            }
        }
        uint8_t misaligned = 0;
        if (use_filter) {
            const int64_t k = (int64_t)std::floor(penalty);
            if (k > 0) {
                const double ln_missmap = -(std::log(10.0) / 10.0) * mapq[r];
                const double ln_mapped =
                    mapq[r] > 0 ? std::log1p(-std::exp(ln_missmap))
                                : -std::numeric_limits<double>::infinity();
                const double mu = mut_rate * (double)(end - begin);
                if (ln_mapped + poisson_lnsf(k - 1, mu) < min_ln_prob)
                    misaligned = 1;
            }
        }
        for (auto& f : found) {
            if (f.end - f.begin > max_var_size) continue;
            int32_t sum_q = 0;
            for (int32_t i = 0; i < f.alt_len; ++i) sum_q += rq[f.offset + i];
            f.sum_q = sum_q;
            f.at_edge = (f.begin == begin || f.end == end) ? 1 : 0;
            f.misaligned = misaligned;
            out.push_back(f);
        }
    }
    Py_END_ALLOW_THREADS
    PyObject* result = PyBytes_FromStringAndSize(
        (const char*)out.data(), (Py_ssize_t)(out.size() * sizeof(ScanCand)));
    PyBuffer_Release(&ref_b); PyBuffer_Release(&beg_b); PyBuffer_Release(&end_b);
    PyBuffer_Release(&mq_b); PyBuffer_Release(&seq_b); PyBuffer_Release(&qual_b);
    PyBuffer_Release(&soff_b); PyBuffer_Release(&cig_b); PyBuffer_Release(&coff_b);
    return result;
}

// ---------------------------------------------------------------------------
// Affine-gap global alignment (GlobalAligner equivalent; reference:
// src/core/tools/vargen/utils/global_aligner.cpp).  Mirrors
// octopus_tpu.core.vargen.assembler.global_align exactly, including its
// argmax tie-breaking (M before X before Y) and gap-open backtrack
// preference.
// ---------------------------------------------------------------------------

// global_align(a: u8, b: u8, match, mismatch, gap_open, gap_extend)
//   -> int32-le bytes of (length, op) pairs; op: 0=M 1=I 2=D
static PyObject* global_align_native(PyObject*, PyObject* args) {
    Py_buffer a_b, b_b;
    int match, mismatch, gap_open, gap_extend;
    if (!PyArg_ParseTuple(args, "y*y*iiii", &a_b, &b_b, &match, &mismatch,
                          &gap_open, &gap_extend))
        return nullptr;
    const uint8_t* a = (const uint8_t*)a_b.buf;
    const uint8_t* b = (const uint8_t*)b_b.buf;
    const int64_t n = a_b.len, m = b_b.len;
    std::vector<int32_t> out_ops;
    Py_BEGIN_ALLOW_THREADS
    const int64_t NEG = -((int64_t)1 << 30);
    const int64_t w = m + 1;
    std::vector<int64_t> M((n + 1) * w, NEG), X((n + 1) * w, NEG),
        Y((n + 1) * w, NEG);
    M[0] = 0;
    for (int64_t i = 1; i <= n; ++i) X[i * w] = gap_open + (i - 1) * gap_extend;
    for (int64_t j = 1; j <= m; ++j) Y[j] = gap_open + (j - 1) * gap_extend;
    for (int64_t i = 1; i <= n; ++i) {
        const uint8_t ai = a[i - 1];
        for (int64_t j = 1; j <= m; ++j) {
            const int64_t pm = M[(i - 1) * w + j - 1], px = X[(i - 1) * w + j - 1],
                          py = Y[(i - 1) * w + j - 1];
            int64_t best = pm > px ? pm : px;
            if (py > best) best = py;
            M[i * w + j] = best + (ai == b[j - 1] ? match : mismatch);
            const int64_t xo = M[(i - 1) * w + j] + gap_open,
                          xe = X[(i - 1) * w + j] + gap_extend;
            X[i * w + j] = xo > xe ? xo : xe;
            const int64_t yo = M[i * w + j - 1] + gap_open,
                          ye = Y[i * w + j - 1] + gap_extend;
            Y[i * w + j] = yo > ye ? yo : ye;
        }
    }
    int64_t i = n, j = m;
    auto argmax3 = [](int64_t x0, int64_t x1, int64_t x2) -> int {
        // first max wins, matching np.argmax([M, X, Y])
        if (x0 >= x1 && x0 >= x2) return 0;
        if (x1 >= x2) return 1;
        return 2;
    };
    int state = argmax3(M[n * w + m], X[n * w + m], Y[n * w + m]);
    std::vector<std::pair<int32_t, int32_t>> ops;  // (length, op)
    auto push = [&ops](int32_t op) {
        if (!ops.empty() && ops.back().second == op)
            ++ops.back().first;
        else
            ops.push_back({1, op});
    };
    while (i > 0 || j > 0) {
        if (state == 0 && i > 0 && j > 0) {
            const int prev = argmax3(M[(i - 1) * w + j - 1],
                                     X[(i - 1) * w + j - 1],
                                     Y[(i - 1) * w + j - 1]);
            push(0);
            --i; --j;
            state = prev;
        } else if (state == 1 && i > 0) {
            if (X[i * w + j] == M[(i - 1) * w + j] + gap_open) state = 0;
            push(2);  // D consumes a
            --i;
        } else if (state == 2 && j > 0) {
            if (Y[i * w + j] == M[i * w + j - 1] + gap_open) state = 0;
            push(1);  // I consumes b
            --j;
        } else {
            state = i > 0 ? 1 : 2;
        }
    }
    out_ops.reserve(ops.size() * 2);
    for (auto it = ops.rbegin(); it != ops.rend(); ++it) {
        out_ops.push_back(it->first);
        out_ops.push_back(it->second);
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&a_b); PyBuffer_Release(&b_b);
    return PyBytes_FromStringAndSize(
        (const char*)out_ops.data(),
        (Py_ssize_t)(out_ops.size() * sizeof(int32_t)));
}

// count_runs(mask: int16 buffer, max_gap) -> int32 bytes
// Mirrors octopus_tpu.core.likelihood.error_models._count_runs (which in
// turn mirrors count_runs in repeat_based_snv_error_model.cpp): for each
// position, the length of the repeat run that just ended there.
static PyObject* count_runs(PyObject*, PyObject* args) {
    Py_buffer buf;
    int max_gap;
    if (!PyArg_ParseTuple(args, "y*i", &buf, &max_gap)) return nullptr;
    const int16_t* mask = (const int16_t*)buf.buf;
    Py_ssize_t n = buf.len / (Py_ssize_t)sizeof(int16_t);
    PyObject* result = PyBytes_FromStringAndSize(nullptr, n * sizeof(int32_t));
    if (!result) { PyBuffer_Release(&buf); return nullptr; }
    int32_t* out = (int32_t*)PyBytes_AS_STRING(result);
    if (n > 0) {
        std::memset(out, 0, n * sizeof(int32_t));
        int16_t prev = mask[0];
        int32_t count = prev > 0 ? 1 : 0;
        int gap = 0;
        for (Py_ssize_t i = 1; i < n; ++i) {
            int16_t x = mask[i];
            int32_t emitted = 0;
            if (x == 0) {
                ++gap;
                if (count > 0) {
                    if (gap == 1) {
                        emitted = count;
                        if (max_gap < 1) count = 0;
                    } else if (gap > max_gap) {
                        count = 0;
                    }
                }
            } else if (prev == x) {
                gap = 0;
                ++count;
            } else {
                prev = x;
                emitted = count;
                count = 1;
            }
            out[i] = emitted;
        }
    }
    PyBuffer_Release(&buf);
    return result;
}

// ---------------------------------------------------------------------------
// Batched banded pair-HMM align + flank-score discount.
//
// Mirrors the reference's traceback-and-subtract flank correction
// (src/core/models/pairhmm/simd_pair_hmm.hpp:352-430 calculate_flank_score)
// and the repo's host golden model (pairhmm_ref.banded_align +
// flank_score_of_path), batched over the flank-overlapping rows of one
// device launch. Inputs are the same packed per-row windows the device
// kernel consumes; output is the flank-corrected phred score per row.
// ---------------------------------------------------------------------------

static const int32_t kInf = 1 << 29;
static const int32_t kNScore = 2;   // pairhmm_ref.N_SCORE
static const int32_t kNCode = 4;

struct FlankDP {
    // tables sized (R+1, D); backpointers 0=M,1=I,2=D,3=START
    std::vector<int32_t> M, I, D;
    std::vector<int8_t> Mb, Ib, Db;
    std::vector<char> ops;   // traceback scratch
    void resize(int rows, int d) {
        size_t n = (size_t)rows * d;
        M.assign(n, kInf); I.assign(n, kInf); D.assign(n, kInf);
        Mb.assign(n, 0); Ib.assign(n, 0); Db.assign(n, 0);
    }
};

static inline int32_t match_cost(int32_t t, int32_t w, int32_t q,
                                 int32_t m, int32_t pr) {
    int32_t pen = (t == w) ? 0 : ((m == t) ? std::min(q, pr) : q);
    if (w == kNCode) pen = std::min(pen, kNScore);
    return pen;
}

// ---------------------------------------------------------------------------
// Lane-batched score-only banded DP: G independent (read, window) pairs of
// identical length advance in lockstep, lane-minor, so every recurrence is
// a straight vertical vector op (the serial in-band deletion scan is
// unaffected — lanes are independent pairs).  Bit-identical min-plus math
// to the scalar traceback path above; used for rows that need no flank
// discount.  target_clones lets gcc emit AVX2/AVX-512 versions and pick at
// runtime without changing the baseline build flags.
// ---------------------------------------------------------------------------

static const int kLanes = 16;

#if defined(__x86_64__) && defined(__gnu_linux__)
__attribute__((target_clones("default", "avx2", "arch=x86-64-v4")))
#endif
static void banded_scores_group(
    int G, int R, int Dn, int nuc_prior,
    const int32_t* tgtT, const int32_t* qualT,   // (L, G) lane-minor
    const int32_t* winT, const int32_t* opnT, const int32_t* extT,
    const int32_t* mskT, const int32_t* priT,    // (W, G) lane-minor
    int32_t* M_prev, int32_t* I_prev, int32_t* D_prev,   // (Dn, G) scratch
    int32_t* M_cur, int32_t* I_cur, int32_t* D_cur,
    int32_t* out_scores) {
    const int GD = G;
    // row 0: M = 0 everywhere; I = inf; D via the odd-diagonal gap chain
    for (int d = 0; d < Dn; ++d)
        for (int g = 0; g < GD; ++g) {
            M_prev[d * GD + g] = 0;
            I_prev[d * GD + g] = kInf;
            D_prev[d * GD + g] = kInf;
        }
    for (int d = 1; d < Dn; ++d) {
        const int32_t m0 = ((d - 1) % 2 == 1) ? 0 : kInf;
        const int32_t* opn_x = opnT + (size_t)(d - 1) * GD;
        const int32_t* ext_x = extT + (size_t)(d - 1) * GD;
        for (int g = 0; g < GD; ++g) {
            const int32_t vo = m0 + opn_x[g];
            const int32_t ve = D_prev[(d - 1) * GD + g] + ext_x[g];
            D_prev[d * GD + g] = vo <= ve ? vo : ve;
        }
    }
    for (int y = 1; y <= R; ++y) {
        const int32_t* tgt_y = tgtT + (size_t)(y - 1) * GD;
        const int32_t* qual_y = qualT + (size_t)(y - 1) * GD;
        for (int d = 0; d < Dn; ++d) {
            const size_t x = (size_t)(y - 1 + d) * GD;
            const int32_t* win_x = winT + x;
            const int32_t* msk_x = mskT + x;
            const int32_t* pri_x = priT + x;
            const int32_t* opn_x = opnT + x;
            const int32_t* ext_x = extT + x;
            int32_t* Mc = M_cur + (size_t)d * GD;
            const int32_t* Mp = M_prev + (size_t)d * GD;
            const int32_t* Ip = I_prev + (size_t)d * GD;
            const int32_t* Dp = D_prev + (size_t)d * GD;
            for (int g = 0; g < GD; ++g) {
                const int32_t t = tgt_y[g], w = win_x[g], q = qual_y[g];
                int32_t pen = (t == w) ? 0
                              : ((msk_x[g] == t) ? (q < pri_x[g] ? q : pri_x[g])
                                                 : q);
                pen = (w == kNCode && pen > kNScore) ? kNScore : pen;
                int32_t best = Mp[g];
                if (Ip[g] < best) best = Ip[g];
                if (Dp[g] < best) best = Dp[g];
                Mc[g] = pen + best;
            }
            int32_t* Ic = I_cur + (size_t)d * GD;
            if (d + 1 < Dn) {
                const int32_t* Mp1 = M_prev + (size_t)(d + 1) * GD;
                const int32_t* Ip1 = I_prev + (size_t)(d + 1) * GD;
                const int32_t m0 = ((d + 1) % 2 == 1) ? 0 : kInf;
                for (int g = 0; g < GD; ++g) {
                    const int32_t mp = (y == 1) ? m0 : Mp1[g];
                    const int32_t vo = mp + opn_x[g];
                    const int32_t ve = Ip1[g] + ext_x[g];
                    Ic[g] = nuc_prior + (vo <= ve ? vo : ve);
                }
            } else {
                for (int g = 0; g < GD; ++g) Ic[g] = kInf;
            }
            int32_t* Dc = D_cur + (size_t)d * GD;
            if (d > 0) {
                const size_t xd = (size_t)(y + d - 1) * GD;
                const int32_t* opn_d = opnT + xd;
                const int32_t* ext_d = extT + xd;
                const int32_t* Mdm1 = M_cur + (size_t)(d - 1) * GD;
                const int32_t* Idm1 = I_cur + (size_t)(d - 1) * GD;
                const int32_t* Ddm1 = D_cur + (size_t)(d - 1) * GD;
                for (int g = 0; g < GD; ++g) {
                    int32_t bd = Mdm1[g] + opn_d[g];
                    const int32_t c1 = Idm1[g] + opn_d[g];
                    const int32_t c2 = Ddm1[g] + ext_d[g];
                    if (c1 < bd) bd = c1;
                    if (c2 < bd) bd = c2;
                    Dc[g] = bd;
                }
            } else {
                for (int g = 0; g < GD; ++g) Dc[g] = kInf;
            }
        }
        std::swap(M_prev, M_cur);
        std::swap(I_prev, I_cur);
        std::swap(D_prev, D_cur);
    }
    for (int g = 0; g < GD; ++g) out_scores[g] = kInf;
    for (int d = 0; d < Dn; ++d) {
        for (int g = 0; g < GD; ++g) {
            const int32_t m = M_prev[d * GD + g];
            const int32_t i = I_prev[d * GD + g];
            const int32_t dd = D_prev[d * GD + g];
            int32_t s = m;
            if (i < s) s = i;
            if (dd < s) s = dd;
            if (s < out_scores[g]) out_scores[g] = s;
        }
    }
}

// flank_banded_scores(n, L, W, pad, nuc_prior,
//                     tgt, quals,            # (n, L) int32
//                     win, opn, ext, mask, prior,   # (n, W) int32
//                     lens, lhs_w, rhs_w)    # (n,) int32
// -> bytes of n int32 flank-corrected scores
static PyObject* flank_banded_scores(PyObject*, PyObject* args) {
    int n, L, W, pad, nuc_prior;
    Py_buffer tgt_b, qual_b, win_b, opn_b, ext_b, mask_b, prior_b;
    Py_buffer len_b, lhs_b, rhs_b;
    if (!PyArg_ParseTuple(args, "iiiiiy*y*y*y*y*y*y*y*y*y*",
                          &n, &L, &W, &pad, &nuc_prior,
                          &tgt_b, &qual_b, &win_b, &opn_b, &ext_b, &mask_b,
                          &prior_b, &len_b, &lhs_b, &rhs_b))
        return nullptr;
    PyObject* result = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)n * 4);
    if (!result) return nullptr;
    int32_t* out = (int32_t*)PyBytes_AS_STRING(result);
    const int32_t* tgt_a = (const int32_t*)tgt_b.buf;
    const int32_t* qual_a = (const int32_t*)qual_b.buf;
    const int32_t* win_a = (const int32_t*)win_b.buf;
    const int32_t* opn_a = (const int32_t*)opn_b.buf;
    const int32_t* ext_a = (const int32_t*)ext_b.buf;
    const int32_t* mask_a = (const int32_t*)mask_b.buf;
    const int32_t* prior_a = (const int32_t*)prior_b.buf;
    const int32_t* lens = (const int32_t*)len_b.buf;
    const int32_t* lhs_a = (const int32_t*)lhs_b.buf;
    const int32_t* rhs_a = (const int32_t*)rhs_b.buf;
    const int Dn = 2 * pad;

    Py_BEGIN_ALLOW_THREADS
    // rows needing no flank discount take the lane-batched score-only DP,
    // grouped by read length; flank rows keep the scalar traceback path
    std::vector<uint8_t> done((size_t)n, 0);
    {
        std::map<int, std::vector<int>> by_len;
        for (int i = 0; i < n; ++i)
            if (lhs_a[i] == 0 && rhs_a[i] == 0) by_len[lens[i]].push_back(i);
        const int G = kLanes;
        std::vector<int32_t> tgtT((size_t)L * G), qualT((size_t)L * G),
            winT((size_t)W * G), opnT((size_t)W * G), extT((size_t)W * G),
            mskT((size_t)W * G), priT((size_t)W * G);
        std::vector<int32_t> Mp((size_t)Dn * G), Ip((size_t)Dn * G),
            Dp((size_t)Dn * G), Mc((size_t)Dn * G), Ic((size_t)Dn * G),
            Dc((size_t)Dn * G), scores(G);
        for (auto& kv : by_len) {
            const int R = kv.first;
            if (R <= 0) continue;
            const int Wr = R + 2 * pad - 1;
            const std::vector<int>& rows = kv.second;
            for (size_t lo = 0; lo < rows.size(); lo += G) {
                const int valid = (int)std::min((size_t)G, rows.size() - lo);
                int lane_row[kLanes];
                for (int g = 0; g < G; ++g)
                    lane_row[g] = rows[lo + (g < valid ? g : 0)];
                for (int x = 0; x < Wr; ++x) {
                    for (int g = 0; g < G; ++g) {
                        const size_t src = (size_t)lane_row[g] * W + x;
                        const size_t dst = (size_t)x * G + g;
                        winT[dst] = win_a[src];
                        opnT[dst] = opn_a[src];
                        extT[dst] = ext_a[src];
                        mskT[dst] = mask_a[src];
                        priT[dst] = prior_a[src];
                    }
                }
                for (int y = 0; y < R; ++y) {
                    for (int g = 0; g < G; ++g) {
                        const size_t src = (size_t)lane_row[g] * L + y;
                        const size_t dst = (size_t)y * G + g;
                        tgtT[dst] = tgt_a[src];
                        qualT[dst] = qual_a[src];
                    }
                }
                banded_scores_group(G, R, Dn, nuc_prior,
                                    tgtT.data(), qualT.data(), winT.data(),
                                    opnT.data(), extT.data(), mskT.data(),
                                    priT.data(), Mp.data(), Ip.data(),
                                    Dp.data(), Mc.data(), Ic.data(),
                                    Dc.data(), scores.data());
                for (int g = 0; g < valid; ++g) {
                    out[rows[lo + g]] = scores[g];
                    done[rows[lo + g]] = 1;
                }
            }
        }
    }
    FlankDP dp;
    dp.ops.reserve((size_t)L + Dn);
    for (int i = 0; i < n; ++i) {
        if (done[i]) continue;
        const int R = lens[i];
        const int Wr = R + 2 * pad - 1;   // this row's real window width
        const int32_t* tgt = tgt_a + (size_t)i * L;
        const int32_t* qual = qual_a + (size_t)i * L;
        const int32_t* win = win_a + (size_t)i * W;
        const int32_t* opn = opn_a + (size_t)i * W;
        const int32_t* ext = ext_a + (size_t)i * W;
        const int32_t* msk = mask_a + (size_t)i * W;
        const int32_t* pri = prior_a + (size_t)i * W;
        dp.resize(R + 1, Dn);
        auto at = [Dn](std::vector<int32_t>& v, int y, int d) -> int32_t& {
            return v[(size_t)y * Dn + d];
        };
        auto bt = [Dn](std::vector<int8_t>& v, int y, int d) -> int8_t& {
            return v[(size_t)y * Dn + d];
        };
        // row 0: M free start anywhere; gap ops may start only from ODD
        // diagonals (half-step parity quirk, pairhmm_ref.banded_score)
        for (int d = 0; d < Dn; ++d) { at(dp.M, 0, d) = 0; bt(dp.Mb, 0, d) = 3; }
        auto m0_gap = [](int d) -> int32_t { return (d % 2 == 1) ? 0 : kInf; };
        for (int d = 1; d < Dn; ++d) {
            int32_t via_open = m0_gap(d - 1) + opn[d - 1];
            int32_t via_ext = at(dp.D, 0, d - 1) + ext[d - 1];
            if (via_open <= via_ext) { at(dp.D, 0, d) = via_open; bt(dp.Db, 0, d) = 0; }
            else { at(dp.D, 0, d) = via_ext; bt(dp.Db, 0, d) = 2; }
        }
        for (int y = 1; y <= R; ++y) {
            for (int d = 0; d < Dn; ++d) {
                const int x_im1 = y - 1 + d;
                // match: best of (M, I, D) at (y-1, d); ties prefer M<I<D
                int32_t c0 = at(dp.M, y - 1, d), c1 = at(dp.I, y - 1, d),
                        c2 = at(dp.D, y - 1, d);
                int k = 0; int32_t best = c0;
                if (c1 < best) { best = c1; k = 1; }
                if (c2 < best) { best = c2; k = 2; }
                at(dp.M, y, d) = match_cost(tgt[y - 1], win[x_im1],
                                            qual[y - 1], msk[x_im1],
                                            pri[x_im1]) + best;
                bt(dp.Mb, y, d) = (int8_t)k;
                // insertion from previous row, diagonal d+1
                if (d + 1 < Dn) {
                    int32_t m_prev = (y == 1) ? m0_gap(d + 1)
                                              : at(dp.M, y - 1, d + 1);
                    int32_t via_open = m_prev + opn[x_im1];
                    int32_t via_ext = at(dp.I, y - 1, d + 1) + ext[x_im1];
                    if (via_open <= via_ext) {
                        at(dp.I, y, d) = nuc_prior + via_open; bt(dp.Ib, y, d) = 0;
                    } else {
                        at(dp.I, y, d) = nuc_prior + via_ext; bt(dp.Ib, y, d) = 1;
                    }
                }
                // deletion: uses this row's M/I at d-1
                if (d > 0) {
                    const int x_del = y + d - 1;
                    int32_t cd0 = at(dp.M, y, d - 1) + opn[x_del];
                    int32_t cd1 = at(dp.I, y, d - 1) + opn[x_del];
                    int32_t cd2 = at(dp.D, y, d - 1) + ext[x_del];
                    int kd = 0; int32_t bd = cd0;
                    if (cd1 < bd) { bd = cd1; kd = 1; }
                    if (cd2 < bd) { bd = cd2; kd = 2; }
                    at(dp.D, y, d) = bd; bt(dp.Db, y, d) = (int8_t)kd;
                }
            }
        }
        // final: min over states/diagonals at y=R, ties prefer M<I<D then low d
        int state = 0, d = 0; int32_t score = kInf;
        for (int s = 0; s < 3; ++s) {
            std::vector<int32_t>& v = (s == 0) ? dp.M : (s == 1) ? dp.I : dp.D;
            for (int dd = 0; dd < Dn; ++dd) {
                if (at(v, R, dd) < score) { score = at(v, R, dd); state = s; d = dd; }
            }
        }
        // traceback
        dp.ops.clear();
        int y = R;
        while (!(y == 0 && state == 0)) {
            if (state == 0) { state = bt(dp.Mb, y, d); dp.ops.push_back('M'); --y; }
            else if (state == 1) { state = bt(dp.Ib, y, d); dp.ops.push_back('I'); --y; ++d; }
            else { state = bt(dp.Db, y, d); dp.ops.push_back('D'); --d; }
        }
        // flank walk (simd_pair_hmm.hpp:352-430; pairhmm_ref.flank_score_of_path)
        const int lhs = lhs_a[i];
        const int rhs_begin = Wr - rhs_a[i];
        int truth_idx = d, target_idx = 0, fscore = 0, mask_size = 0;
        char prev = 'M';
        for (auto it = dp.ops.rbegin(); it != dp.ops.rend(); ++it) {
            const char op = *it;
            const bool in_flank = truth_idx < lhs || truth_idx >= rhs_begin;
            if (op == 'M') {
                if (in_flank) {
                    if (tgt[target_idx] != win[truth_idx]) {
                        // truth N adds exactly the N score in the walk
                        // (simd_pair_hmm.hpp:388-393)
                        if (win[truth_idx] == kNCode) {
                            fscore += kNScore;
                        } else {
                            int32_t q = qual[target_idx];
                            if (msk[truth_idx] == tgt[target_idx])
                                q = std::min(q, pri[truth_idx]);
                            fscore += q;
                        }
                    }
                    ++mask_size;
                }
                ++truth_idx; ++target_idx;
            } else if (op == 'I') {
                if (in_flank) {
                    fscore += ((prev == 'I') ? ext[truth_idx - 1]
                                             : opn[truth_idx - 1]) + nuc_prior;
                    ++mask_size;
                }
                ++target_idx;
            } else {
                if (in_flank) {
                    fscore += (prev == 'D') ? ext[truth_idx] : opn[truth_idx];
                }
                ++truth_idx;
            }
            prev = op;
        }
        if (R - mask_size < 2) fscore = 0;
        out[i] = score - fscore;
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&tgt_b); PyBuffer_Release(&qual_b);
    PyBuffer_Release(&win_b); PyBuffer_Release(&opn_b);
    PyBuffer_Release(&ext_b); PyBuffer_Release(&mask_b);
    PyBuffer_Release(&prior_b); PyBuffer_Release(&len_b);
    PyBuffer_Release(&lhs_b); PyBuffer_Release(&rhs_b);
    return result;
}


// ---------------------------------------------------------------------------
// Per-site read support/mismatch statistics for the CSR measures
// (mirrors octopus_tpu/core/csr/measures.py _read_supports /
// _read_mismatches bit-for-bit; the python implementations remain the
// golden fallback).  Cigar ops: 0=M 1=I 2=D 3=N 4=S 5=H 6=P 7=EQ 8=X.
// ---------------------------------------------------------------------------

static bool rotations_equal(const uint8_t* a, const uint8_t* b, int64_t n) {
    if (n == 0) return true;
    for (int64_t s = 0; s < n; ++s) {
        bool ok = true;
        for (int64_t i = 0; i < n; ++i) {
            if (a[i] != b[(i + s) % n]) { ok = false; break; }
        }
        if (ok) return true;
    }
    return false;
}

static PyObject* site_read_stats(PyObject*, PyObject* args) {
    Py_buffer beg_b, seq_b, qual_b, soff_b, cig_b, coff_b, ref_b, alt_b;
    long long begin, end, ref_begin;
    int is_ins, is_del, shift_max, have_ref;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*y*Ly*LLiii",
                          &beg_b, &seq_b, &qual_b, &soff_b, &cig_b, &coff_b,
                          &ref_b, &ref_begin, &alt_b, &begin, &end,
                          &is_ins, &is_del, &shift_max))
        return nullptr;
    have_ref = ref_b.len > 0;
    const int64_t* begins = (const int64_t*)beg_b.buf;
    const uint8_t* seq = (const uint8_t*)seq_b.buf;
    const uint8_t* quals = (const uint8_t*)qual_b.buf;
    const int64_t* soff = (const int64_t*)soff_b.buf;
    const int32_t* cig = (const int32_t*)cig_b.buf;
    const int64_t* coff = (const int64_t*)coff_b.buf;
    const uint8_t* ref = (const uint8_t*)ref_b.buf;
    const Py_ssize_t ref_n = ref_b.len;
    const uint8_t* alt = (const uint8_t*)alt_b.buf;
    const int64_t alt_n = alt_b.len;
    const Py_ssize_t n = beg_b.len / (Py_ssize_t)sizeof(int64_t);

    // outputs: sup(i8), bq(i16, -1 none), off(i32, -1 none), mism(i32),
    // clipped(i8)
    PyObject* sup_o = PyBytes_FromStringAndSize(nullptr, n);
    PyObject* bq_o = PyBytes_FromStringAndSize(nullptr, n * 2);
    PyObject* off_o = PyBytes_FromStringAndSize(nullptr, n * 4);
    PyObject* mism_o = PyBytes_FromStringAndSize(nullptr, n * 4);
    PyObject* clip_o = PyBytes_FromStringAndSize(nullptr, n);
    if (!sup_o || !bq_o || !off_o || !mism_o || !clip_o) return nullptr;
    int8_t* sup = (int8_t*)PyBytes_AS_STRING(sup_o);
    int16_t* bq = (int16_t*)PyBytes_AS_STRING(bq_o);
    int32_t* off_out = (int32_t*)PyBytes_AS_STRING(off_o);
    int32_t* mism_out = (int32_t*)PyBytes_AS_STRING(mism_o);
    int8_t* clip = (int8_t*)PyBytes_AS_STRING(clip_o);

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t r = 0; r < n; ++r) {
        const uint8_t* rs = seq + soff[r];
        const uint8_t* rq = quals + soff[r];
        int64_t pos = begins[r];
        int64_t q = 0;
        int s_res = 0;
        int16_t bq_res = -1;
        int32_t off_res = -1;
        bool decided = false;
        int32_t mism = 0;
        int8_t clipped = 0;
        for (int64_t c = coff[r]; c < coff[r + 1]; ++c) {
            const int32_t length = cig[2 * c];
            const int32_t op = cig[2 * c + 1];
            switch (op) {
            case 0: case 7: case 8: {          // M, EQ, X
                if (have_ref) {                // mismatch count vs reference
                    const int64_t lo = pos - ref_begin;
                    const int64_t r0 = lo > 0 ? lo : 0;
                    const int64_t r1 = (lo + length) < ref_n ? (lo + length)
                                                             : ref_n;
                    const int64_t skip = lo < 0 ? -lo : 0;
                    const int64_t cnt = r1 - r0;
                    for (int64_t i = 0; i < cnt; ++i) {
                        if (ref[r0 + i] != rs[q + skip + i]) ++mism;
                    }
                }
                if (!decided && !is_ins && !is_del && pos <= begin
                        && begin + alt_n <= pos + length) {
                    const int64_t o = q + (begin - pos);
                    bool eq = true;
                    for (int64_t i = 0; i < alt_n; ++i) {
                        if (rs[o + i] != alt[i]) { eq = false; break; }
                    }
                    if (eq) {
                        s_res = 1;
                        int16_t mn = 32767;
                        for (int64_t i = 0; i < alt_n; ++i) {
                            if (rq[o + i] < mn) mn = (int16_t)rq[o + i];
                        }
                        bq_res = alt_n ? mn : -1;
                        off_res = (int32_t)o;
                    }
                    decided = true;            // SNV path decides either way
                }
                pos += length;
                q += length;
                break;
            }
            case 1:                            // I
                mism += length;
                if (!decided && is_ins && begin <= pos
                        && pos <= begin + shift_max && length == alt_n) {
                    if (rotations_equal(rs + q, alt, length)) {
                        s_res = 1;
                        int16_t mn = 32767;
                        for (int64_t i = 0; i < length; ++i) {
                            if (rq[q + i] < mn) mn = (int16_t)rq[q + i];
                        }
                        bq_res = length ? mn : -1;
                        off_res = (int32_t)q;
                        decided = true;
                    }
                }
                q += length;
                break;
            case 2:                            // D
                mism += length;
                if (!decided && is_del && begin <= pos
                        && pos <= begin + shift_max && length == end - begin) {
                    s_res = 1;
                    bq_res = -1;
                    off_res = (int32_t)q;
                    decided = true;
                }
                pos += length;
                break;
            case 4:                            // S
                clipped = 1;
                q += length;
                break;
            case 5:                            // H (not counted as clip:
                break;                     // measures.py counts S only)
            case 3: case 6:                    // N, P (measures.py parity)
                pos += length;
                break;
            default:
                break;
            }
        }
        sup[r] = (int8_t)s_res;
        bq[r] = bq_res;
        off_out[r] = off_res;
        mism_out[r] = have_ref ? mism : 0;
        clip[r] = clipped;
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&beg_b); PyBuffer_Release(&seq_b);
    PyBuffer_Release(&qual_b); PyBuffer_Release(&soff_b);
    PyBuffer_Release(&cig_b); PyBuffer_Release(&coff_b);
    PyBuffer_Release(&ref_b); PyBuffer_Release(&alt_b);
    PyObject* tup = PyTuple_Pack(5, sup_o, bq_o, off_o, mism_o, clip_o);
    Py_DECREF(sup_o); Py_DECREF(bq_o); Py_DECREF(off_o);
    Py_DECREF(mism_o); Py_DECREF(clip_o);
    return tup;
}

static PyMethodDef methods[] = {
    {"site_read_stats", site_read_stats, METH_VARARGS,
     "Per-read site support/bq/offset/mismatch/clip stats for measures."},
    {"flank_banded_scores", flank_banded_scores, METH_VARARGS,
     "Batched banded align + flank-score discount -> int32-le scores."},
    {"count_runs", count_runs, METH_VARARGS,
     "Repeat-run lengths ending at each position -> int32-le bytes."},
    {"decode_bam_records", decode_bam_records, METH_VARARGS,
     "Full BAM record decode for one region -> tuple of flat field buffers."},
    {"global_align", global_align_native, METH_VARARGS,
     "Affine-gap global alignment -> int32-le (length, op) pairs."},
    {"scan_cigar_reads", scan_cigar_reads, METH_VARARGS,
     "CIGAR candidate scan over a ReadBatch -> packed ScanCand records."},
    {"tandem_repeats", tandem_repeats, METH_VARARGS,
     "Maximal exact tandem repeats -> int32-le (pos, length, period) triples."},
    {"snv_priors", snv_priors, METH_VARARGS,
     "Repeat-context SNV penalty caps -> (fwd, rev) int16-le bytes."},
    {"indel_penalties", indel_penalties, METH_VARARGS,
     "Repeat-context indel gap penalties -> (open, extend) int16-le bytes."},
    {"extract_bubbles", extract_bubbles, METH_VARARGS,
     "De-Bruijn bubble extraction -> [(ref_start_i, ref_end_i, alt, score)] or None."},
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
