// Cell-list radius-graph builder for the host-side input pipeline.
//
// Native equivalent of the role torch_cluster's C++/CUDA radius kernel
// plays in the reference stack (/root/reference .. layers.py:1589):
// building fixed-capacity neighbor lists while batches are collated on
// host.  The O(N^2) NumPy path is fine for QM9-size molecules; this
// cell-list implementation keeps the input pipeline off the critical
// path for MD22/Molecule3D-scale systems (hundreds to thousands of
// atoms), where Python-loop collation would starve the TPU.
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in the
// build image).  Semantics match gotennet_tpu.graph.neighborlist
// .build_edges_np: per center i, all j != i within `cutoff`, capped to
// the `max_neighbors` *nearest*, sorted by (i, j); optional self-loops
// appended per node.  Returns the edge count, or -1 if capacity was
// exceeded (caller re-collates with a bigger buffer).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Cell {
    std::vector<int32_t> atoms;
};

}  // namespace

extern "C" {

// pos: [n, 3] float32; out_src/out_dst: preallocated int32 buffers of
// length `capacity`.  Returns number of edges written, or -1 on
// overflow.
int64_t build_radius_graph(const float* pos, int64_t n, float cutoff,
                           int32_t max_neighbors, int32_t include_loops,
                           int32_t* out_src, int32_t* out_dst,
                           int64_t capacity) {
    if (n <= 0) return 0;
    const float c2 = cutoff * cutoff;

    // bounding box
    float lo[3] = {pos[0], pos[1], pos[2]};
    float hi[3] = {pos[0], pos[1], pos[2]};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], pos[i * 3 + d]);
            hi[d] = std::max(hi[d], pos[i * 3 + d]);
        }
    }

    // cell grid with cell size = cutoff
    int32_t dims[3];
    for (int d = 0; d < 3; ++d) {
        dims[d] = std::max<int32_t>(
            1, static_cast<int32_t>(std::floor((hi[d] - lo[d]) / cutoff)) + 1);
        dims[d] = std::min<int32_t>(dims[d], 64);  // bound memory
    }
    const float inv = 1.0f / cutoff;
    auto cell_of = [&](int64_t i, int32_t* cc) {
        for (int d = 0; d < 3; ++d) {
            int32_t v = static_cast<int32_t>((pos[i * 3 + d] - lo[d]) * inv);
            cc[d] = std::min(std::max(v, 0), dims[d] - 1);
        }
    };

    std::vector<Cell> grid(static_cast<size_t>(dims[0]) * dims[1] * dims[2]);
    auto flat = [&](int32_t x, int32_t y, int32_t z) {
        return (static_cast<size_t>(x) * dims[1] + y) * dims[2] + z;
    };
    for (int64_t i = 0; i < n; ++i) {
        int32_t cc[3];
        cell_of(i, cc);
        grid[flat(cc[0], cc[1], cc[2])].atoms.push_back(
            static_cast<int32_t>(i));
    }

    int64_t e = 0;
    std::vector<std::pair<float, int32_t>> nbrs;
    nbrs.reserve(64);
    for (int64_t i = 0; i < n; ++i) {
        nbrs.clear();
        int32_t cc[3];
        cell_of(i, cc);
        const float xi = pos[i * 3], yi = pos[i * 3 + 1], zi = pos[i * 3 + 2];
        for (int32_t dx = -1; dx <= 1; ++dx) {
            int32_t x = cc[0] + dx;
            if (x < 0 || x >= dims[0]) continue;
            for (int32_t dy = -1; dy <= 1; ++dy) {
                int32_t y = cc[1] + dy;
                if (y < 0 || y >= dims[1]) continue;
                for (int32_t dz = -1; dz <= 1; ++dz) {
                    int32_t z = cc[2] + dz;
                    if (z < 0 || z >= dims[2]) continue;
                    for (int32_t j : grid[flat(x, y, z)].atoms) {
                        if (j == i) continue;
                        const float ax = pos[j * 3] - xi;
                        const float ay = pos[j * 3 + 1] - yi;
                        const float az = pos[j * 3 + 2] - zi;
                        const float d2 = ax * ax + ay * ay + az * az;
                        if (d2 < c2) nbrs.emplace_back(d2, j);
                    }
                }
            }
        }
        if (static_cast<int32_t>(nbrs.size()) > max_neighbors) {
            std::nth_element(nbrs.begin(), nbrs.begin() + max_neighbors,
                             nbrs.end());
            nbrs.resize(max_neighbors);
        }
        std::sort(nbrs.begin(), nbrs.end(),
                  [](const auto& a, const auto& b) {
                      return a.second < b.second;
                  });
        const int64_t need = static_cast<int64_t>(nbrs.size()) +
                             (include_loops ? 1 : 0);
        if (e + need > capacity) return -1;
        for (const auto& p : nbrs) {
            out_src[e] = p.second;
            out_dst[e] = static_cast<int32_t>(i);
            ++e;
        }
        if (include_loops) {
            out_src[e] = static_cast<int32_t>(i);
            out_dst[e] = static_cast<int32_t>(i);
            ++e;
        }
    }
    return e;
}

}  // extern "C"
