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
#include <cstdint>
#include <cstring>
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
    FlankDP dp;
    dp.ops.reserve((size_t)L + Dn);
    for (int i = 0; i < n; ++i) {
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

static PyMethodDef methods[] = {
    {"flank_banded_scores", flank_banded_scores, METH_VARARGS,
     "Batched banded align + flank-score discount -> int32-le scores."},
    {"count_runs", count_runs, METH_VARARGS,
     "Repeat-run lengths ending at each position -> int32-le bytes."},
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
