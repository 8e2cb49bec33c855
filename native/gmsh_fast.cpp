// Fast Gmsh 4.1 ASCII section parser — the native IO hot path.
//
// The reference engine parses meshes with C++ iostreams
// (/root/reference/src/mesh/mesh.cpp); this library plays the same role for
// the TPU framework: the bulk sections ($Nodes, $Elements) are parsed here
// with hand-rolled number scanning (no istream/locale overhead), while the
// tiny sections ($PhysicalNames, $Entities) stay in Python.  Exposed as a
// plain C ABI for ctypes; all arrays are allocated here and freed with
// cwf_gmsh_free.
//
// Build: g++ -O3 -march=native -shared -fPIC gmsh_fast.cpp -o libcwf_gmsh.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>

namespace {

struct Cursor {
    const char* p;
    const char* end;

    void skip_ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
    }

    bool parse_i64(int64_t* out) {
        skip_ws();
        if (p >= end) return false;
        bool neg = false;
        if (*p == '-') { neg = true; ++p; }
        if (p >= end || *p < '0' || *p > '9') return false;
        int64_t v = 0;
        while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
        *out = neg ? -v : v;
        return true;
    }

    bool parse_f64(double* out) {
        skip_ws();
        if (p >= end) return false;
        char* next = nullptr;
        // strtod stops at the first non-number char; sections are bounded by
        // '$' markers so this never runs away.
        double v = strtod(p, &next);
        if (next == p) return false;
        p = next;
        *out = v;
        return true;
    }
};

// element type -> node count (mesh.cpp:234-249 of the reference)
int node_count_for(int64_t t) {
    switch (t) {
        case 2: return 3;  // tri3
        case 3: return 4;  // quad4
        case 4: return 4;  // tet4
        case 5: return 8;  // hex8
        default: return -1;
    }
}

}  // namespace

extern "C" {

struct GmshNodes {
    int64_t count = 0;
    int64_t block_count = 0;
    int64_t* ids = nullptr;          // (count,)
    double* coords = nullptr;        // (count, 3)
    // per block: entity_dim, entity_tag, first_index, node_count
    int64_t* blocks = nullptr;       // (block_count, 4)
    int32_t status = 0;              // 0 ok, <0 error code
};

struct GmshElements {
    int64_t block_count = 0;
    int64_t total_count = 0;         // entries across all supported blocks
    // per block: entity_dim, entity_tag, element_type, first_index, count
    int64_t* blocks = nullptr;       // (block_count, 5)
    int64_t* tags = nullptr;         // (total_count,)
    int64_t* conn = nullptr;         // ragged: sum(count_b * nodes_per_elem_b)
    int64_t conn_len = 0;
    int64_t processed = 0;           // all elements consumed (incl. skipped dims)
    int32_t status = 0;              // 0 ok, -1 unsupported type (type in bad_type)
    int64_t bad_type = 0;
    int64_t bad_entity = 0;
};

// Parse the $Nodes body (text between $Nodes and $EndNodes).
GmshNodes* cwf_parse_nodes(const char* text, int64_t length) {
    auto* out = new GmshNodes();
    Cursor c{text, text + length};

    int64_t num_blocks, num_nodes, min_tag, max_tag;
    if (!c.parse_i64(&num_blocks) || !c.parse_i64(&num_nodes) ||
        !c.parse_i64(&min_tag) || !c.parse_i64(&max_tag)) {
        out->status = -10;
        return out;
    }
    out->ids = static_cast<int64_t*>(malloc(sizeof(int64_t) * (num_nodes > 0 ? num_nodes : 1)));
    out->coords = static_cast<double*>(malloc(sizeof(double) * 3 * (num_nodes > 0 ? num_nodes : 1)));
    out->blocks = static_cast<int64_t*>(malloc(sizeof(int64_t) * 4 * (num_blocks > 0 ? num_blocks : 1)));
    out->block_count = num_blocks;

    int64_t written = 0;
    for (int64_t b = 0; b < num_blocks; ++b) {
        int64_t dim, tag, parametric, in_block;
        if (!c.parse_i64(&dim) || !c.parse_i64(&tag) || !c.parse_i64(&parametric) ||
            !c.parse_i64(&in_block)) {
            out->status = -11;
            return out;
        }
        if (written + in_block > num_nodes) { out->status = -12; return out; }
        out->blocks[b * 4 + 0] = dim;
        out->blocks[b * 4 + 1] = tag;
        out->blocks[b * 4 + 2] = written;
        out->blocks[b * 4 + 3] = in_block;
        for (int64_t i = 0; i < in_block; ++i) {
            if (!c.parse_i64(&out->ids[written + i])) { out->status = -13; return out; }
        }
        for (int64_t i = 0; i < in_block; ++i) {
            double* xyz = out->coords + (written + i) * 3;
            if (!c.parse_f64(&xyz[0]) || !c.parse_f64(&xyz[1]) || !c.parse_f64(&xyz[2])) {
                out->status = -14;
                return out;
            }
        }
        written += in_block;
    }
    out->count = written;
    if (written != num_nodes) out->status = -15;  // "node count mismatch"
    return out;
}

// Parse the $Elements body.  Unsupported types in dims 2/3 are an error
// (matching the reference); supported types in other dims are consumed.
GmshElements* cwf_parse_elements(const char* text, int64_t length) {
    auto* out = new GmshElements();
    Cursor c{text, text + length};

    int64_t num_blocks, num_elements, min_tag, max_tag;
    if (!c.parse_i64(&num_blocks) || !c.parse_i64(&num_elements) ||
        !c.parse_i64(&min_tag) || !c.parse_i64(&max_tag)) {
        out->status = -20;
        return out;
    }

    std::vector<int64_t> blocks;
    std::vector<int64_t> tags;
    std::vector<int64_t> conn;
    blocks.reserve(num_blocks * 5);
    tags.reserve(num_elements);
    conn.reserve(num_elements * 4);

    int64_t processed = 0;
    for (int64_t b = 0; b < num_blocks; ++b) {
        int64_t dim, tag, etype, in_block;
        if (!c.parse_i64(&dim) || !c.parse_i64(&tag) || !c.parse_i64(&etype) ||
            !c.parse_i64(&in_block)) {
            out->status = -21;
            return out;
        }
        const int nc = node_count_for(etype);
        if (nc < 0) {
            out->status = -1;  // unsupported Gmsh element type
            out->bad_type = etype;
            out->bad_entity = tag;
            return out;
        }
        const bool keep = (dim == 2 || dim == 3);
        if (keep) {
            blocks.push_back(dim);
            blocks.push_back(tag);
            blocks.push_back(etype);
            blocks.push_back(static_cast<int64_t>(tags.size()));
            blocks.push_back(in_block);
        }
        for (int64_t i = 0; i < in_block; ++i) {
            int64_t etag;
            if (!c.parse_i64(&etag)) { out->status = -22; return out; }
            if (keep) tags.push_back(etag);
            for (int j = 0; j < nc; ++j) {
                int64_t node;
                if (!c.parse_i64(&node)) { out->status = -23; return out; }
                if (keep) conn.push_back(node);
            }
        }
        processed += in_block;
    }
    out->processed = processed;
    if (processed != num_elements) {
        out->status = -24;  // "element count mismatch"
        return out;
    }

    out->block_count = static_cast<int64_t>(blocks.size() / 5);
    out->total_count = static_cast<int64_t>(tags.size());
    out->conn_len = static_cast<int64_t>(conn.size());
    out->blocks = static_cast<int64_t*>(malloc(sizeof(int64_t) * (blocks.size() ? blocks.size() : 1)));
    out->tags = static_cast<int64_t*>(malloc(sizeof(int64_t) * (tags.size() ? tags.size() : 1)));
    out->conn = static_cast<int64_t*>(malloc(sizeof(int64_t) * (conn.size() ? conn.size() : 1)));
    memcpy(out->blocks, blocks.data(), sizeof(int64_t) * blocks.size());
    memcpy(out->tags, tags.data(), sizeof(int64_t) * tags.size());
    memcpy(out->conn, conn.data(), sizeof(int64_t) * conn.size());
    return out;
}

void cwf_free_nodes(GmshNodes* n) {
    if (!n) return;
    free(n->ids);
    free(n->coords);
    free(n->blocks);
    delete n;
}

void cwf_free_elements(GmshElements* e) {
    if (!e) return;
    free(e->blocks);
    free(e->tags);
    free(e->conn);
    delete e;
}

}  // extern "C"
