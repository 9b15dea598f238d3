// Native KNN: mean squared distance to the 3 nearest neighbors.
//
// Equivalent of the reference's simple-knn CUDA submodule (distCUDA2,
// used once at initialization to set per-gaussian isotropic scales:
// gaussian_model.py:145-150). Grid-hash spatial index with expanding-ring
// search, OpenMP-parallel; O(N) for uniformly dense clouds vs the O(N^2)
// brute-force fallback in Python.
//
// Build: see build.py (g++ -O3 -shared -fPIC -fopenmp).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Grid {
  float lo[3];
  float cell;
  int dims[3];
  std::vector<int32_t> cell_start;  // size ncells+1
  std::vector<int32_t> order;       // point ids grouped by cell
};

inline int64_t cell_of(const Grid& g, const float* p) {
  int c[3];
  for (int d = 0; d < 3; ++d) {
    int v = static_cast<int>((p[d] - g.lo[d]) / g.cell);
    c[d] = std::min(std::max(v, 0), g.dims[d] - 1);
  }
  return (static_cast<int64_t>(c[0]) * g.dims[1] + c[1]) * g.dims[2] + c[2];
}

void build_grid(const float* pts, int64_t n, Grid& g) {
  float hi[3];
  for (int d = 0; d < 3; ++d) {
    g.lo[d] = pts[d];
    hi[d] = pts[d];
  }
  for (int64_t i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      g.lo[d] = std::min(g.lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  }
  float ext = 1e-6f;
  for (int d = 0; d < 3; ++d) ext = std::max(ext, hi[d] - g.lo[d]);
  // ~4 points per cell on average
  double target_cells = std::max<double>(1.0, n / 4.0);
  double cells_per_dim = std::cbrt(target_cells);
  g.cell = std::max(ext / static_cast<float>(cells_per_dim), 1e-9f);
  int64_t ncells = 1;
  for (int d = 0; d < 3; ++d) {
    g.dims[d] = std::max(1, static_cast<int>((hi[d] - g.lo[d]) / g.cell) + 1);
    ncells *= g.dims[d];
  }
  std::vector<int32_t> counts(ncells + 1, 0);
  std::vector<int64_t> cell_ids(n);
  for (int64_t i = 0; i < n; ++i) {
    cell_ids[i] = cell_of(g, pts + 3 * i);
    counts[cell_ids[i] + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g.cell_start = counts;
  g.order.resize(n);
  std::vector<int32_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.order[cursor[cell_ids[i]]++] = static_cast<int32_t>(i);
}

}  // namespace

extern "C" {

// points: [n,3] float32 row-major; out: [n] float32 (mean of squared
// distances to the 3 nearest neighbors, matching distCUDA2 semantics).
void knn3_mean_sq_dist(const float* pts, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
    return;
  }
  Grid g;
  build_grid(pts, n, g);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 256)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    float best[3] = {1e30f, 1e30f, 1e30f};
    int cc[3];
    for (int d = 0; d < 3; ++d) {
      int v = static_cast<int>((p[d] - g.lo[d]) / g.cell);
      cc[d] = std::min(std::max(v, 0), g.dims[d] - 1);
    }
    int max_ring = std::max({g.dims[0], g.dims[1], g.dims[2]});
    for (int ring = 0; ring <= max_ring; ++ring) {
      // ring r is complete when best[2] <= (r * cell)^2: all closer points
      // must lie within the rings already visited
      if (ring > 0) {
        float safe = (ring - 1) * g.cell;
        if (best[2] <= safe * safe) break;
      }
      int x0 = std::max(cc[0] - ring, 0), x1 = std::min(cc[0] + ring, g.dims[0] - 1);
      int y0 = std::max(cc[1] - ring, 0), y1 = std::min(cc[1] + ring, g.dims[1] - 1);
      int z0 = std::max(cc[2] - ring, 0), z1 = std::min(cc[2] + ring, g.dims[2] - 1);
      for (int x = x0; x <= x1; ++x) {
        for (int y = y0; y <= y1; ++y) {
          for (int z = z0; z <= z1; ++z) {
            // only the shell of this ring (inner cells already done)
            if (ring > 0 && std::abs(x - cc[0]) != ring &&
                std::abs(y - cc[1]) != ring && std::abs(z - cc[2]) != ring)
              continue;
            int64_t c = (static_cast<int64_t>(x) * g.dims[1] + y) * g.dims[2] + z;
            for (int32_t k = g.cell_start[c]; k < g.cell_start[c + 1]; ++k) {
              int32_t j = g.order[k];
              if (j == i) continue;
              const float* q = pts + 3 * j;
              float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[2]) {
                if (d2 < best[0]) {
                  best[2] = best[1]; best[1] = best[0]; best[0] = d2;
                } else if (d2 < best[1]) {
                  best[2] = best[1]; best[1] = d2;
                } else {
                  best[2] = d2;
                }
              }
            }
          }
        }
      }
    }
    out[i] = (best[0] + best[1] + best[2]) / 3.0f;
  }
}

}  // extern "C"
