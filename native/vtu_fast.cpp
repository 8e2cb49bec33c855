// Native binary-VTU writer: streams the appended-raw UnstructuredGrid
// format (u32 block headers, little-endian) straight to disk without
// assembling the multi-megabyte blob in Python.  Byte-identical to
// civiwave_tpu/post/vtu.py (itself a format rebuild of the reference's
// src/post/vtu_writer.cpp:171-297).
//
// Two entry points:
//   cwf_write_vtu            — explicit connectivity (general gather path)
//   cwf_write_vtu_structured — implicit box-grid connectivity, generated
//     on the fly in fixed-size chunks while streaming.  At 50M DOF the
//     explicit path would materialize ~600 MB of connectivity/offsets on
//     the host per frame; the implicit path materializes ~32 MB total.
//     Node order is x-major (i*(ny+1)+j)*(nz+1)+k, cells i-major, Gmsh
//     hex corner order — the StructuredModel/box_mesh contract
//     (civiwave_tpu/mesh/structured.py:40-60).
//
// Exposed via ctypes (see civiwave_tpu/post/native_vtu.py); compiled on
// first use with g++ -O3 -shared.

#include <fcntl.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Block {
    const void* data;
    uint64_t bytes;
};

// Buffered O_DIRECT stream writer.  Page-cache writes can be throttled to
// ~25 MB/s on virtualized 1-vCPU hosts while O_DIRECT sustains the raw
// device rate (~550 MB/s measured) — a 3 GB 50M-DOF frame is 5 min vs 7 s.
// All bytes funnel through one aligned buffer flushed in 4096-multiple
// chunks; the unaligned tail is written after clearing O_DIRECT on close.
// Falls back to plain buffered IO when the fs rejects O_DIRECT.
class Writer {
  public:
    explicit Writer(const char* path) {
        fd_ = ::open(path, O_WRONLY | O_CREAT | O_TRUNC | O_DIRECT, 0644);
        direct_ = fd_ >= 0;
        if (fd_ < 0) fd_ = ::open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
        if (fd_ < 0) return;
        if (posix_memalign(reinterpret_cast<void**>(&buf_), kAlign, kCap)) {
            buf_ = nullptr;
            fail_ = true;
        }
    }
    ~Writer() {
        std::free(buf_);
        if (fd_ >= 0) ::close(fd_);
    }
    bool opened() const { return fd_ >= 0; }
    bool ok() const { return !fail_; }

    void write(const void* data, uint64_t bytes) {
        const char* p = static_cast<const char*>(data);
        while (!fail_ && bytes) {
            uint64_t take = kCap - fill_;
            if (take > bytes) take = bytes;
            std::memcpy(buf_ + fill_, p, take);
            fill_ += take;
            p += take;
            bytes -= take;
            if (fill_ == kCap) flush_aligned();
        }
    }

    bool close() {
        if (fail_ || fd_ < 0) return false;
        flush_aligned();
        if (!fail_ && fill_) {
            // unaligned tail: drop O_DIRECT for the final partial write
            if (direct_) {
                int flags = fcntl(fd_, F_GETFL);
                if (flags < 0 ||
                    fcntl(fd_, F_SETFL, flags & ~O_DIRECT) < 0)
                    fail_ = true;
            }
            if (!fail_ && !write_all(buf_, fill_)) fail_ = true;
            fill_ = 0;
        }
        int rc = ::close(fd_);
        fd_ = -1;
        return !fail_ && rc == 0;
    }

  private:
    static constexpr uint64_t kAlign = 4096;
    static constexpr uint64_t kCap = 32ull << 20;

    void flush_aligned() {
        uint64_t chunk = fill_ / kAlign * kAlign;
        if (!chunk) return;
        if (!write_all(buf_, chunk)) {
            fail_ = true;
            return;
        }
        std::memmove(buf_, buf_ + chunk, fill_ - chunk);
        fill_ -= chunk;
    }

    bool write_all(const char* p, uint64_t bytes) {
        while (bytes) {
            ssize_t n = ::write(fd_, p, bytes);
            if (n <= 0) return false;
            p += n;
            bytes -= uint64_t(n);
        }
        return true;
    }

    int fd_ = -1;
    bool direct_ = false;
    bool fail_ = false;
    char* buf_ = nullptr;
    uint64_t fill_ = 0;
};

void write_block_header(Writer& w, uint64_t bytes) {
    uint32_t header = static_cast<uint32_t>(bytes);
    w.write(&header, sizeof(header));
}

void write_block(Writer& w, const Block& b) {
    write_block_header(w, b.bytes);
    if (b.bytes) w.write(b.data, b.bytes);
}

// XML header + <AppendedData> prefix, shared by both entry points.  The
// appended-blob layout is: point arrays, cell arrays, points,
// connectivity, offsets, types — block_offsets must follow that order
// (points at index n_point_arrays + n_cell_arrays).
std::string build_header(int64_t n_points, int64_t n_cells, double time_value,
                         uint32_t frame, int32_t n_point_arrays,
                         const char** pa_names, const int32_t* pa_comps,
                         int32_t n_cell_arrays, const char** ca_names,
                         const int32_t* ca_comps,
                         const std::vector<uint64_t>& block_offsets) {
    std::string head;
    head.reserve(4096);
    char buf[512];
    head += "<?xml version=\"1.0\"?>\n";
    head +=
        "<VTKFile type=\"UnstructuredGrid\" version=\"1.0\" "
        "byte_order=\"LittleEndian\" header_type=\"UInt32\">\n";
    head += "  <UnstructuredGrid>\n";
    head += "    <FieldData>\n";
    std::snprintf(buf, sizeof(buf),
                  "      <DataArray type=\"Float64\" Name=\"time\" "
                  "NumberOfTuples=\"1\">%.17g</DataArray>\n",
                  time_value);
    head += buf;
    std::snprintf(buf, sizeof(buf),
                  "      <DataArray type=\"UInt32\" Name=\"frame\" "
                  "NumberOfTuples=\"1\">%u</DataArray>\n",
                  frame);
    head += buf;
    head += "    </FieldData>\n";
    std::snprintf(buf, sizeof(buf),
                  "    <Piece NumberOfPoints=\"%lld\" NumberOfCells=\"%lld\">\n",
                  static_cast<long long>(n_points),
                  static_cast<long long>(n_cells));
    head += buf;

    head += "      <PointData Scalars=\"von_mises_node\">\n";
    for (int32_t i = 0; i < n_point_arrays; ++i) {
        std::snprintf(buf, sizeof(buf),
                      "        <DataArray type=\"Float32\" Name=\"%s\" "
                      "NumberOfComponents=\"%d\" format=\"appended\" "
                      "offset=\"%llu\"/>\n",
                      pa_names[i], pa_comps[i],
                      static_cast<unsigned long long>(block_offsets[i]));
        head += buf;
    }
    head += "      </PointData>\n";

    head += "      <CellData Scalars=\"von_mises_elem\">\n";
    for (int32_t i = 0; i < n_cell_arrays; ++i) {
        std::snprintf(buf, sizeof(buf),
                      "        <DataArray type=\"Float32\" Name=\"%s\" "
                      "NumberOfComponents=\"%d\" format=\"appended\" "
                      "offset=\"%llu\"/>\n",
                      ca_names[i], ca_comps[i],
                      static_cast<unsigned long long>(
                          block_offsets[n_point_arrays + i]));
        head += buf;
    }
    head += "      </CellData>\n";

    const size_t points_idx = n_point_arrays + n_cell_arrays;
    head += "      <Points>\n";
    std::snprintf(buf, sizeof(buf),
                  "        <DataArray type=\"Float32\" NumberOfComponents=\"3\" "
                  "format=\"appended\" offset=\"%llu\"/>\n",
                  static_cast<unsigned long long>(block_offsets[points_idx]));
    head += buf;
    head += "      </Points>\n";

    head += "      <Cells>\n";
    const char* cell_names[3] = {"connectivity", "offsets", "types"};
    const char* cell_types[3] = {"Int32", "Int32", "UInt8"};
    for (int i = 0; i < 3; ++i) {
        std::snprintf(buf, sizeof(buf),
                      "        <DataArray type=\"%s\" Name=\"%s\" "
                      "format=\"appended\" offset=\"%llu\"/>\n",
                      cell_types[i], cell_names[i],
                      static_cast<unsigned long long>(
                          block_offsets[points_idx + 1 + i]));
        head += buf;
    }
    head += "      </Cells>\n";

    head += "    </Piece>\n";
    head += "  </UnstructuredGrid>\n";
    head += "  <AppendedData encoding=\"raw\">\n";
    head += "_";
    return head;
}

const char kTail[] = "\n  </AppendedData>\n</VTKFile>\n";

}  // namespace

extern "C" {

// Returns 0 on success, -1 on open failure, -2 on write failure.
// Array layout contracts match the Python writer exactly:
//   points (n_points, 3) f32; connectivity (conn_len,) i32;
//   offsets (n_cells,) i32; types (n_cells,) u8;
//   point/cell arrays: pa_data[i] has n_points * pa_comps[i] f32
//   (cell arrays n_cells * ca_comps[i]).
int cwf_write_vtu(const char* path, int64_t n_points, int64_t n_cells,
                  const float* points, const int32_t* connectivity,
                  int64_t conn_len, const int32_t* offsets,
                  const uint8_t* types, double time_value, uint32_t frame,
                  int32_t n_point_arrays, const char** pa_names,
                  const int32_t* pa_comps, const float** pa_data,
                  int32_t n_cell_arrays, const char** ca_names,
                  const int32_t* ca_comps, const float** ca_data) {
    std::vector<Block> blocks;
    std::vector<uint64_t> block_offsets;
    uint64_t running = 0;
    auto push = [&](const void* data, uint64_t bytes) {
        block_offsets.push_back(running);
        blocks.push_back(Block{data, bytes});
        running += sizeof(uint32_t) + bytes;
    };
    for (int32_t i = 0; i < n_point_arrays; ++i)
        push(pa_data[i], uint64_t(n_points) * pa_comps[i] * sizeof(float));
    for (int32_t i = 0; i < n_cell_arrays; ++i)
        push(ca_data[i], uint64_t(n_cells) * ca_comps[i] * sizeof(float));
    push(points, uint64_t(n_points) * 3 * sizeof(float));
    push(connectivity, uint64_t(conn_len) * sizeof(int32_t));
    push(offsets, uint64_t(n_cells) * sizeof(int32_t));
    push(types, uint64_t(n_cells) * sizeof(uint8_t));

    Writer w(path);
    if (!w.opened()) return -1;

    std::string head = build_header(n_points, n_cells, time_value, frame,
                                    n_point_arrays, pa_names, pa_comps,
                                    n_cell_arrays, ca_names, ca_comps,
                                    block_offsets);
    w.write(head.data(), head.size());
    for (const Block& b : blocks) write_block(w, b);
    w.write(kTail, sizeof(kTail) - 1);
    return w.close() ? 0 : -2;
}

// Padded-mesh variant: connectivity/offsets/types are streamed straight
// from the mesh's resident (n_cells, max_slots) padded element table
// (-1 sentinels in the tail slots, civiwave_tpu/mesh/model.py) in 1M-cell
// chunks — the VTU-layout ragged connectivity, cumsum offsets and types
// arrays are never materialized on the host.  At a 10M-DOF tet mesh the
// explicit path builds ~600 MB of per-frame temporaries; this path peaks
// at ~36 MB of chunk buffers.  Byte-identical to cwf_write_vtu over the
// ragged extraction (row-major first-count slots per row).
// Returns 0 success, -1 open failure, -2 write failure, -3 if the
// connectivity would overflow the Int32 offsets block.
int cwf_write_vtu_padded(const char* path, int64_t n_points, int64_t n_cells,
                         const float* points, const int32_t* elements,
                         int32_t max_slots, const int32_t* counts,
                         double time_value, uint32_t frame,
                         int32_t n_point_arrays, const char** pa_names,
                         const int32_t* pa_comps, const float** pa_data,
                         int32_t n_cell_arrays, const char** ca_names,
                         const int32_t* ca_comps, const float** ca_data) {
    int64_t conn_len = 0;
    for (int64_t c = 0; c < n_cells; ++c) conn_len += counts[c];
    if (conn_len > INT32_MAX || n_points > INT32_MAX) return -3;

    std::vector<uint64_t> block_offsets;
    uint64_t running = 0;
    std::vector<Block> data_blocks;  // point arrays, cell arrays, points
    auto push = [&](const void* data, uint64_t bytes) {
        block_offsets.push_back(running);
        data_blocks.push_back(Block{data, bytes});
        running += sizeof(uint32_t) + bytes;
    };
    for (int32_t i = 0; i < n_point_arrays; ++i)
        push(pa_data[i], uint64_t(n_points) * pa_comps[i] * sizeof(float));
    for (int32_t i = 0; i < n_cell_arrays; ++i)
        push(ca_data[i], uint64_t(n_cells) * ca_comps[i] * sizeof(float));
    push(points, uint64_t(n_points) * 3 * sizeof(float));
    const uint64_t conn_bytes = uint64_t(conn_len) * sizeof(int32_t);
    const uint64_t offs_bytes = uint64_t(n_cells) * sizeof(int32_t);
    const uint64_t types_bytes = uint64_t(n_cells) * sizeof(uint8_t);
    block_offsets.push_back(running);
    running += sizeof(uint32_t) + conn_bytes;
    block_offsets.push_back(running);
    running += sizeof(uint32_t) + offs_bytes;
    block_offsets.push_back(running);

    Writer w(path);
    if (!w.opened()) return -1;

    std::string head = build_header(n_points, n_cells, time_value, frame,
                                    n_point_arrays, pa_names, pa_comps,
                                    n_cell_arrays, ca_names, ca_comps,
                                    block_offsets);
    w.write(head.data(), head.size());
    for (const Block& b : data_blocks) write_block(w, b);

    const int64_t kChunkCells = 1 << 20;
    std::vector<int32_t> chunk(size_t(max_slots) * kChunkCells);

    // connectivity: first counts[c] slots of each padded row, row-major
    write_block_header(w, conn_bytes);
    {
        int64_t filled = 0;
        for (int64_t c = 0; w.ok() && c < n_cells; ++c) {
            const int32_t* row = elements + c * max_slots;
            const int32_t cnt = counts[c];
            std::memcpy(chunk.data() + filled, row, sizeof(int32_t) * cnt);
            filled += cnt;
            if (filled + max_slots > int64_t(chunk.size())) {
                w.write(chunk.data(), sizeof(int32_t) * size_t(filled));
                filled = 0;
            }
        }
        if (filled) w.write(chunk.data(), sizeof(int32_t) * size_t(filled));
    }

    // offsets: running cumsum of counts
    write_block_header(w, offs_bytes);
    {
        int64_t written = 0;
        int64_t acc = 0;
        while (w.ok() && written < n_cells) {
            int64_t count = std::min(kChunkCells, n_cells - written);
            for (int64_t c = 0; c < count; ++c) {
                acc += counts[written + c];
                chunk[size_t(c)] = int32_t(acc);
            }
            w.write(chunk.data(), sizeof(int32_t) * size_t(count));
            written += count;
        }
    }

    // types: 10 (VTK_TETRA) for 4-node cells, 12 (VTK_HEXAHEDRON) otherwise
    write_block_header(w, types_bytes);
    {
        std::vector<uint8_t> tchunk(static_cast<size_t>(kChunkCells), 0);
        int64_t written = 0;
        while (w.ok() && written < n_cells) {
            int64_t count = std::min(kChunkCells, n_cells - written);
            for (int64_t c = 0; c < count; ++c)
                tchunk[size_t(c)] =
                    counts[written + c] == 4 ? uint8_t(10) : uint8_t(12);
            w.write(tchunk.data(), size_t(count));
            written += count;
        }
    }

    w.write(kTail, sizeof(kTail) - 1);
    return w.close() ? 0 : -2;
}

// Structured-box variant: connectivity/offsets/types are implicit in
// (nx, ny, nz) cells and generated in 1M-cell chunks while streaming —
// nothing cell-sized is ever materialized on the host.
// Returns 0 success, -1 open failure, -2 write failure, -3 if the
// connectivity would overflow the Int32 offsets block (> 268M cells).
int cwf_write_vtu_structured(const char* path, int32_t nx, int32_t ny,
                             int32_t nz, const float* points,
                             double time_value, uint32_t frame,
                             int32_t n_point_arrays, const char** pa_names,
                             const int32_t* pa_comps, const float** pa_data,
                             int32_t n_cell_arrays, const char** ca_names,
                             const int32_t* ca_comps, const float** ca_data) {
    const int64_t n_points =
        int64_t(nx + 1) * int64_t(ny + 1) * int64_t(nz + 1);
    const int64_t n_cells = int64_t(nx) * int64_t(ny) * int64_t(nz);
    if (8 * n_cells > INT32_MAX || n_points > INT32_MAX) return -3;

    std::vector<uint64_t> block_offsets;
    uint64_t running = 0;
    std::vector<Block> data_blocks;  // point arrays, cell arrays, points
    auto push = [&](const void* data, uint64_t bytes) {
        block_offsets.push_back(running);
        data_blocks.push_back(Block{data, bytes});
        running += sizeof(uint32_t) + bytes;
    };
    for (int32_t i = 0; i < n_point_arrays; ++i)
        push(pa_data[i], uint64_t(n_points) * pa_comps[i] * sizeof(float));
    for (int32_t i = 0; i < n_cell_arrays; ++i)
        push(ca_data[i], uint64_t(n_cells) * ca_comps[i] * sizeof(float));
    push(points, uint64_t(n_points) * 3 * sizeof(float));
    // implicit blocks: record offsets without data pointers
    const uint64_t conn_bytes = uint64_t(n_cells) * 8 * sizeof(int32_t);
    const uint64_t offs_bytes = uint64_t(n_cells) * sizeof(int32_t);
    const uint64_t types_bytes = uint64_t(n_cells) * sizeof(uint8_t);
    block_offsets.push_back(running);
    running += sizeof(uint32_t) + conn_bytes;
    block_offsets.push_back(running);
    running += sizeof(uint32_t) + offs_bytes;
    block_offsets.push_back(running);

    Writer w(path);
    if (!w.opened()) return -1;

    std::string head = build_header(n_points, n_cells, time_value, frame,
                                    n_point_arrays, pa_names, pa_comps,
                                    n_cell_arrays, ca_names, ca_comps,
                                    block_offsets);
    w.write(head.data(), head.size());
    for (const Block& b : data_blocks) write_block(w, b);

    // connectivity: cell (i,j,k) i-major; corner node ids are
    // nid(i,j,k) + delta[m] with nid = (i*(ny+1)+j)*(nz+1)+k
    const int32_t dz = 1;
    const int32_t dy = nz + 1;
    const int32_t dx = (ny + 1) * (nz + 1);
    const int32_t delta[8] = {0,      dx,      dx + dy,      dy,
                              dz, dx + dz, dx + dy + dz, dy + dz};
    const int64_t kChunkCells = 1 << 20;
    std::vector<int32_t> chunk(size_t(8) * kChunkCells);
    write_block_header(w, conn_bytes);
    {
        int64_t filled = 0;
        for (int32_t i = 0; w.ok() && i < nx; ++i) {
            for (int32_t j = 0; j < ny; ++j) {
                int32_t base = i * dx + j * dy;
                for (int32_t k = 0; k < nz; ++k) {
                    int32_t nid = base + k;
                    int32_t* out = chunk.data() + 8 * filled;
                    for (int m = 0; m < 8; ++m) out[m] = nid + delta[m];
                    if (++filled == kChunkCells) {
                        w.write(chunk.data(),
                                sizeof(int32_t) * size_t(8) * filled);
                        filled = 0;
                    }
                }
            }
        }
        if (filled)
            w.write(chunk.data(), sizeof(int32_t) * size_t(8) * filled);
    }

    // offsets: (c+1)*8
    write_block_header(w, offs_bytes);
    {
        int64_t written = 0;
        while (w.ok() && written < n_cells) {
            int64_t count = std::min(kChunkCells, n_cells - written);
            for (int64_t c = 0; c < count; ++c)
                chunk[size_t(c)] = int32_t((written + c + 1) * 8);
            w.write(chunk.data(), sizeof(int32_t) * size_t(count));
            written += count;
        }
    }

    // types: all VTK_HEXAHEDRON (12)
    write_block_header(w, types_bytes);
    {
        std::vector<uint8_t> tchunk(size_t(kChunkCells), uint8_t(12));
        int64_t written = 0;
        while (w.ok() && written < n_cells) {
            int64_t count = std::min(kChunkCells, n_cells - written);
            w.write(tchunk.data(), size_t(count));
            written += count;
        }
    }

    w.write(kTail, sizeof(kTail) - 1);
    return w.close() ? 0 : -2;
}

}  // extern "C"
