// Native binary-VTU writer: streams the appended-raw UnstructuredGrid
// format (u32 block headers, little-endian) straight to disk without
// assembling the multi-megabyte blob in Python.  Byte-identical to
// civiwave_tpu/post/vtu.py (itself a format rebuild of the reference's
// src/post/vtu_writer.cpp:171-297).
//
// Exposed via ctypes (see civiwave_tpu/post/native_vtu.py); compiled on
// first use with g++ -O3 -shared.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Block {
    const void* data;
    uint64_t bytes;
};

bool write_block(std::FILE* f, const Block& b) {
    uint32_t header = static_cast<uint32_t>(b.bytes);
    if (std::fwrite(&header, sizeof(header), 1, f) != 1) return false;
    if (b.bytes && std::fwrite(b.data, 1, b.bytes, f) != b.bytes) return false;
    return true;
}

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
    const uint64_t points_idx = blocks.size();
    push(points, uint64_t(n_points) * 3 * sizeof(float));
    push(connectivity, uint64_t(conn_len) * sizeof(int32_t));
    push(offsets, uint64_t(n_cells) * sizeof(int32_t));
    push(types, uint64_t(n_cells) * sizeof(uint8_t));

    std::FILE* f = std::fopen(path, "wb");
    if (!f) return -1;

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

    bool ok = std::fwrite(head.data(), 1, head.size(), f) == head.size();
    for (const Block& b : blocks) {
        if (!ok) break;
        ok = write_block(f, b);
    }
    const char tail[] = "\n  </AppendedData>\n</VTKFile>\n";
    if (ok) ok = std::fwrite(tail, 1, sizeof(tail) - 1, f) == sizeof(tail) - 1;
    if (std::fclose(f) != 0) ok = false;
    return ok ? 0 : -2;
}

}  // extern "C"
