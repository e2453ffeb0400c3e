// Native host-side point-cloud ops for the data pipeline.
//
// The reference's native layer accelerates its data ops in CUDA
// (vgtk/vgtk/cuda/*). On TPU the device compute path is XLA/Pallas; the
// host-side pipeline (3DMatch fragment loading: voxel downsampling, radius
// patch search, FPS for preprocessing) is the part that benefits from native
// code here — it feeds the chip and runs on CPU.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C epn_pointcloud_tpu/native
//
// All functions use a spatial uniform-grid hash — O(n) build, O(1) expected
// per-query — replacing scipy cKDTree calls in the hot loaders.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <array>
#include <limits>
#include <random>

namespace {

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // large-prime mix (standard spatial hash)
        return static_cast<size_t>(
            k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
    }
};

using Grid = std::unordered_map<CellKey, std::vector<int64_t>, CellHash>;

Grid build_grid(const float* pts, int64_t n, float cell) {
    Grid grid;
    grid.reserve(static_cast<size_t>(n / 2 + 1));
    const float inv = 1.0f / cell;
    for (int64_t i = 0; i < n; ++i) {
        CellKey k{static_cast<int64_t>(std::floor(pts[3 * i] * inv)),
                  static_cast<int64_t>(std::floor(pts[3 * i + 1] * inv)),
                  static_cast<int64_t>(std::floor(pts[3 * i + 2] * inv))};
        grid[k].push_back(i);
    }
    return grid;
}

}  // namespace

extern "C" {

// Voxel-grid downsample (centroid per voxel). Returns the number of output
// points written to `out` (capacity must be >= n).
int64_t voxel_downsample(const float* pts, int64_t n, float voxel_size,
                         float* out) {
    if (voxel_size <= 0.f || n == 0) {
        std::memcpy(out, pts, sizeof(float) * 3 * n);
        return n;
    }
    std::unordered_map<CellKey, std::pair<int64_t, std::array<double, 3>>,
                       CellHash> cells;
    cells.reserve(static_cast<size_t>(n / 2 + 1));
    const float inv = 1.0f / voxel_size;
    // first-seen order is made deterministic by recording insertion index
    std::vector<const CellKey*> order;
    order.reserve(static_cast<size_t>(n / 2 + 1));
    for (int64_t i = 0; i < n; ++i) {
        CellKey k{static_cast<int64_t>(std::floor(pts[3 * i] * inv)),
                  static_cast<int64_t>(std::floor(pts[3 * i + 1] * inv)),
                  static_cast<int64_t>(std::floor(pts[3 * i + 2] * inv))};
        auto it = cells.find(k);
        if (it == cells.end()) {
            std::array<double, 3> c{{pts[3 * i], pts[3 * i + 1],
                                     pts[3 * i + 2]}};
            auto res = cells.emplace(k, std::make_pair(int64_t(1), c));
            order.push_back(&res.first->first);
        } else {
            it->second.first += 1;
            it->second.second[0] += pts[3 * i];
            it->second.second[1] += pts[3 * i + 1];
            it->second.second[2] += pts[3 * i + 2];
        }
    }
    int64_t m = 0;
    for (const CellKey* kp : order) {
        const auto& v = cells[*kp];
        out[3 * m] = static_cast<float>(v.second[0] / v.first);
        out[3 * m + 1] = static_cast<float>(v.second[1] / v.first);
        out[3 * m + 2] = static_cast<float>(v.second[2] / v.first);
        ++m;
    }
    return m;
}

// Radius neighbor search: for each of m queries, up to max_k support indices
// within `radius` (in support-point index order). Writes counts[m] and
// idx[m * max_k] (-1 padded).
void radius_search(const float* support, int64_t n, const float* queries,
                   int64_t m, float radius, int64_t max_k, int64_t* idx,
                   int64_t* counts) {
    const float r2 = radius * radius;
    Grid grid = build_grid(support, n, radius);
    const float inv = 1.0f / radius;
    for (int64_t q = 0; q < m; ++q) {
        const float qx = queries[3 * q], qy = queries[3 * q + 1],
                    qz = queries[3 * q + 2];
        const int64_t cx = static_cast<int64_t>(std::floor(qx * inv));
        const int64_t cy = static_cast<int64_t>(std::floor(qy * inv));
        const int64_t cz = static_cast<int64_t>(std::floor(qz * inv));
        std::vector<int64_t> found;
        for (int64_t dx = -1; dx <= 1; ++dx)
            for (int64_t dy = -1; dy <= 1; ++dy)
                for (int64_t dz = -1; dz <= 1; ++dz) {
                    auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                    if (it == grid.end()) continue;
                    for (int64_t i : it->second) {
                        const float ddx = support[3 * i] - qx;
                        const float ddy = support[3 * i + 1] - qy;
                        const float ddz = support[3 * i + 2] - qz;
                        if (ddx * ddx + ddy * ddy + ddz * ddz <= r2)
                            found.push_back(i);
                    }
                }
        std::sort(found.begin(), found.end());
        const int64_t c = std::min<int64_t>(found.size(), max_k);
        counts[q] = c;
        for (int64_t j = 0; j < c; ++j) idx[q * max_k + j] = found[j];
        for (int64_t j = c; j < max_k; ++j) idx[q * max_k + j] = -1;
    }
}

// Furthest point sampling (host). First sample = index 0; points with
// squared norm <= shadow_eps are skipped (matches the device op /
// grouping_cuda_kernel.cu:351-466 semantics).
void furthest_point_sampling(const float* pts, int64_t n, int64_t m,
                             float shadow_eps, int64_t* out_idx) {
    if (m <= 0 || n <= 0) return;
    std::vector<float> temp(static_cast<size_t>(n),
                            std::numeric_limits<float>::infinity());
    std::vector<uint8_t> valid(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
        const float mag = pts[3 * i] * pts[3 * i] +
                          pts[3 * i + 1] * pts[3 * i + 1] +
                          pts[3 * i + 2] * pts[3 * i + 2];
        valid[i] = mag > shadow_eps;
    }
    int64_t old = 0;
    out_idx[0] = 0;
    for (int64_t j = 1; j < m; ++j) {
        const float x1 = pts[3 * old], y1 = pts[3 * old + 1],
                    z1 = pts[3 * old + 2];
        float best = -1.f;
        int64_t besti = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[3 * i] - x1, dy = pts[3 * i + 1] - y1,
                        dz = pts[3 * i + 2] - z1;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < temp[i]) temp[i] = d;
            if (valid[i] && temp[i] > best) {
                best = temp[i];
                besti = i;
            }
        }
        old = besti;
        out_idx[j] = old;
    }
}

// Uniform resample indices: down -> Fisher-Yates prefix without replacement;
// up -> arange + uniform with replacement (matches pc/sample.py:16-27
// semantics, seeded).
void uniform_resample(int64_t n, int64_t m, uint64_t seed, int64_t* out_idx) {
    std::mt19937_64 rng(seed);
    if (n >= m) {
        std::vector<int64_t> perm(static_cast<size_t>(n));
        for (int64_t i = 0; i < n; ++i) perm[i] = i;
        for (int64_t i = 0; i < m; ++i) {
            std::uniform_int_distribution<int64_t> dist(i, n - 1);
            std::swap(perm[i], perm[dist(rng)]);
        }
        std::memcpy(out_idx, perm.data(), sizeof(int64_t) * m);
    } else {
        for (int64_t i = 0; i < n; ++i) out_idx[i] = i;
        std::uniform_int_distribution<int64_t> dist(0, n - 1);
        for (int64_t i = n; i < m; ++i) out_idx[i] = dist(rng);
    }
}

}  // extern "C"
