// Native data-generation kernels: grid-hash kNN sign-voting SDF.
//
// CPU-native replacement for the reference's FLANN-CUDA kNN + sign-vote
// sampler (sampler_cuda/PreprocessMesh.cu ComputeSDFKernel semantics:
// k nearest oriented surfels vote sign(dot(n_i, q - p_i)); unanimous ->
// +/- distance-to-nearest, split -> discard).  Data generation is offline
// host work, so the TPU-native stack keeps it on the host: a uniform grid
// over the surfels with ring-expansion kNN, OpenMP across queries.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Grid {
    double origin[3];
    double cell;
    int dims[3];
    std::vector<int> cell_start;   // CSR offsets, dims[0]*dims[1]*dims[2]+1
    std::vector<int> indices;      // surfel ids sorted by cell
};

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

Grid build_grid(const double* pts, int m) {
    Grid g;
    double mn[3], mx[3];
    for (int d = 0; d < 3; ++d) { mn[d] = pts[d]; mx[d] = pts[d]; }
    for (int i = 1; i < m; ++i)
        for (int d = 0; d < 3; ++d) {
            mn[d] = std::min(mn[d], pts[3 * i + d]);
            mx[d] = std::max(mx[d], pts[3 * i + d]);
        }
    double vol = 1.0;
    for (int d = 0; d < 3; ++d) vol *= std::max(mx[d] - mn[d], 1e-9);
    // ~4 surfels per cell on average.
    g.cell = std::cbrt(vol * 4.0 / std::max(m, 1));
    if (!(g.cell > 0)) g.cell = 1e-3;
    for (int d = 0; d < 3; ++d) {
        g.origin[d] = mn[d];
        g.dims[d] = std::max(1, (int)std::floor((mx[d] - mn[d]) / g.cell) + 1);
        g.dims[d] = std::min(g.dims[d], 512);
    }
    // recompute cell so the clamped dims still cover the extent
    for (int d = 0; d < 3; ++d)
        g.cell = std::max(g.cell, (mx[d] - mn[d]) / g.dims[d] + 1e-12);

    int n_cells = g.dims[0] * g.dims[1] * g.dims[2];
    std::vector<int> count(n_cells, 0);
    std::vector<int> cell_of(m);
    for (int i = 0; i < m; ++i) {
        int c[3];
        for (int d = 0; d < 3; ++d)
            c[d] = clampi((int)((pts[3 * i + d] - g.origin[d]) / g.cell), 0,
                          g.dims[d] - 1);
        cell_of[i] = (c[0] * g.dims[1] + c[1]) * g.dims[2] + c[2];
        count[cell_of[i]]++;
    }
    g.cell_start.assign(n_cells + 1, 0);
    for (int c = 0; c < n_cells; ++c) g.cell_start[c + 1] = g.cell_start[c] + count[c];
    g.indices.resize(m);
    std::vector<int> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
    for (int i = 0; i < m; ++i) g.indices[cursor[cell_of[i]]++] = i;
    return g;
}

}  // namespace

extern "C" {

// queries (n,3), surf_pts (m,3), surf_nrm (m,3) row-major f64.
// out_sdf (n,), out_keep (n,) uint8.
void knn_sign_vote(const double* queries, int64_t n,
                   const double* surf_pts, const double* surf_nrm, int64_t m,
                   int k, double* out_sdf, uint8_t* out_keep) {
    if (m == 0 || n == 0) return;
    if (k > m) k = (int)m;
    Grid g = build_grid(surf_pts, (int)m);

#pragma omp parallel
    {
        std::vector<std::pair<double, int>> heap;  // max-heap of (dist2, id)
        heap.reserve(k + 1);
#pragma omp for schedule(dynamic, 256)
        for (int64_t qi = 0; qi < n; ++qi) {
            const double* q = queries + 3 * qi;
            heap.clear();
            int base[3];
            for (int d = 0; d < 3; ++d)
                base[d] = clampi((int)((q[d] - g.origin[d]) / g.cell), 0,
                                 g.dims[d] - 1);
            int max_ring = std::max(std::max(g.dims[0], g.dims[1]), g.dims[2]);
            for (int ring = 0; ring < max_ring; ++ring) {
                // Stop once the closest possible point in this ring cannot
                // beat the current kth distance.
                if ((int)heap.size() == k) {
                    double ring_min = (ring - 1) * g.cell;
                    if (ring_min > 0 && ring_min * ring_min > heap.front().first)
                        break;
                }
                int x0 = base[0] - ring, x1 = base[0] + ring;
                int y0 = base[1] - ring, y1 = base[1] + ring;
                int z0 = base[2] - ring, z1 = base[2] + ring;
                for (int x = x0; x <= x1; ++x) {
                    if (x < 0 || x >= g.dims[0]) continue;
                    for (int y = y0; y <= y1; ++y) {
                        if (y < 0 || y >= g.dims[1]) continue;
                        for (int z = z0; z <= z1; ++z) {
                            if (z < 0 || z >= g.dims[2]) continue;
                            // shell only
                            if (x != x0 && x != x1 && y != y0 && y != y1 &&
                                z != z0 && z != z1)
                                continue;
                            int c = (x * g.dims[1] + y) * g.dims[2] + z;
                            for (int s = g.cell_start[c]; s < g.cell_start[c + 1];
                                 ++s) {
                                int pi = g.indices[s];
                                const double* p = surf_pts + 3 * pi;
                                double dx = q[0] - p[0], dy = q[1] - p[1],
                                       dz = q[2] - p[2];
                                double d2 = dx * dx + dy * dy + dz * dz;
                                if ((int)heap.size() < k) {
                                    heap.emplace_back(d2, pi);
                                    std::push_heap(heap.begin(), heap.end());
                                } else if (d2 < heap.front().first) {
                                    std::pop_heap(heap.begin(), heap.end());
                                    heap.back() = {d2, pi};
                                    std::push_heap(heap.begin(), heap.end());
                                }
                            }
                        }
                    }
                }
            }
            // vote
            int pos = 0;
            double best_d2 = 1e300;
            for (auto& e : heap) {
                const double* p = surf_pts + 3 * e.second;
                const double* nn = surf_nrm + 3 * e.second;
                double dot = (q[0] - p[0]) * nn[0] + (q[1] - p[1]) * nn[1] +
                             (q[2] - p[2]) * nn[2];
                if (dot > 0) pos++;
                best_d2 = std::min(best_d2, e.first);
            }
            int kk = (int)heap.size();
            bool keep = (pos == 0) || (pos == kk);
            out_keep[qi] = keep ? 1 : 0;
            double s = (pos == kk) ? 1.0 : -1.0;
            out_sdf[qi] = s * std::sqrt(best_d2);
        }
    }
}

}  // extern "C"
