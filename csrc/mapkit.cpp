// mapkit: native map-compilation kernels for torchdriveenv_tpu.
//
// The reference's map stack is lanelet2 (C++) loaded at runtime through
// torchdrivesim's find_map_config (reference gym_env.py:312, Dockerfile:22).
// Here maps are compiled OFFLINE into dense grids (drivable SDF + lane
// direction field) that the jitted TPU engine gathers from; this library is
// the native hot path of that compiler (tools/compile_assets.py). A pure
// numpy/scipy fallback lives in torchdriveenv_tpu/maps/compile.py.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Kernels:
//   mapkit_stamp_segments  — rasterize road corridor segments into an
//                            occupancy grid, tracking the closest segment's
//                            direction per pixel (lane direction field).
//   mapkit_edt             — exact Euclidean distance transform
//                            (Felzenszwalb & Huttenlocher), with nearest-
//                            source index tracking.
//   mapkit_sdf             — signed distance field from a binary grid.
//   mapkit_propagate_dir   — extend the direction field to every pixel from
//                            its nearest covered pixel.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr float kInf = 1e20f;

// 1D lower-envelope squared distance transform with argmin tracking.
// f: input (n); d: output squared distances (n); arg: source index (n).
// v, z: caller-provided scratch of size n and n+1.
void dt1d(const float* f, int n, float* d, int* arg, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; q++) {
    if (f[q] >= kInf) continue;  // no parabola from empty cells
    float s;
    while (true) {
      int p = v[k];
      if (f[p] >= kInf) {  // degenerate first cell
        v[k] = q;
        z[k + 1] = kInf;
        break;
      }
      s = ((f[q] + float(q) * q) - (f[p] + float(p) * p)) /
          (2.0f * q - 2.0f * p);
      if (s <= z[k]) {
        k--;
        continue;
      }
      k++;
      v[k] = q;
      z[k] = s;
      z[k + 1] = kInf;
      break;
    }
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < float(q)) k++;
    int p = v[k];
    if (f[p] >= kInf) {
      d[q] = kInf;
      arg[q] = -1;
    } else {
      d[q] = float(q - p) * (q - p) + f[p];
      arg[q] = p;
    }
  }
}

}  // namespace

extern "C" {

// Rasterize corridor segments. Grids are row-major (grid x grid); pixel (i,j)
// has world center origin + (i+0.5, j+0.5)*scale (i along x, j along y —
// matches maps/compile.py stamp_segment).
//   p0, p1: (n_segs, 2) float64 endpoints; halfwidth: (n_segs,) float64.
//   drivable: uint8 in/out; dir_best_d: float32 in/out (init 1e9);
//   dir_angle: float32 in/out.
void mapkit_stamp_segments(int grid, float origin_x, float origin_y,
                           float scale, const double* p0, const double* p1,
                           const double* halfwidth, int n_segs,
                           uint8_t* drivable, float* dir_best_d,
                           float* dir_angle) {
  for (int s = 0; s < n_segs; s++) {
    const double ax = p0[2 * s], ay = p0[2 * s + 1];
    const double bx = p1[2 * s], by = p1[2 * s + 1];
    const double hw = halfwidth[s];
    const double sx = bx - ax, sy = by - ay;
    const double seg_len2 = sx * sx + sy * sy;
    const bool has_dir = seg_len2 > 1e-12;
    const float ang = has_dir ? float(std::atan2(sy, sx)) : 0.0f;

    const double lox = std::fmin(ax, bx) - hw, loy = std::fmin(ay, by) - hw;
    const double hix = std::fmax(ax, bx) + hw, hiy = std::fmax(ay, by) + hw;
    int i0 = int((lox - origin_x) / scale) - 1;
    int j0 = int((loy - origin_y) / scale) - 1;
    int i1 = int((hix - origin_x) / scale) + 2;
    int j1 = int((hiy - origin_y) / scale) + 2;
    if (i0 < 0) i0 = 0;
    if (j0 < 0) j0 = 0;
    if (i1 > grid) i1 = grid;
    if (j1 > grid) j1 = grid;
    if (i0 >= i1 || j0 >= j1) continue;

    const double hw2 = hw * hw;
    for (int i = i0; i < i1; i++) {
      const double px = origin_x + (i + 0.5) * scale - ax;
      float* row_d = dir_best_d + (size_t)i * grid;
      float* row_a = dir_angle + (size_t)i * grid;
      uint8_t* row_o = drivable + (size_t)i * grid;
      for (int j = j0; j < j1; j++) {
        const double py = origin_y + (j + 0.5) * scale - ay;
        double t = has_dir ? (px * sx + py * sy) / seg_len2 : 0.0;
        if (t < 0.0) t = 0.0;
        if (t > 1.0) t = 1.0;
        const double dx = px - t * sx, dy = py - t * sy;
        const double d2 = dx * dx + dy * dy;
        if (d2 <= hw2) row_o[j] = 1;
        if (has_dir) {
          const float d = float(std::sqrt(d2));
          if (d < row_d[j]) {
            row_d[j] = d;
            row_a[j] = ang;
          }
        }
      }
    }
  }
}

// Exact EDT: for every pixel, distance (in pixels) to the nearest pixel where
// source != 0, plus that pixel's flat index in nearest_idx (or -1 if the grid
// has no source pixels). dist/nearest_idx are (grid*grid); row-major.
void mapkit_edt(int grid, const uint8_t* source, float* dist,
                int32_t* nearest_idx) {
  const int n = grid;
  std::vector<float> tmp_d((size_t)n * n);      // column-pass squared dist
  std::vector<int32_t> tmp_src((size_t)n * n);  // column-pass source row

  // Pass 1: per column j, squared distance along rows to nearest source.
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    std::vector<float> f(n), d(n), z(n + 1);
    std::vector<int> arg(n), v(n);
#if defined(_OPENMP)
#pragma omp for
#endif
    for (int j = 0; j < n; j++) {
      for (int i = 0; i < n; i++)
        f[i] = source[(size_t)i * n + j] ? 0.0f : kInf;
      dt1d(f.data(), n, d.data(), arg.data(), v.data(), z.data());
      for (int i = 0; i < n; i++) {
        tmp_d[(size_t)i * n + j] = d[i];
        tmp_src[(size_t)i * n + j] = arg[i];
      }
    }

    // Pass 2: per row i over the column-pass results.
#if defined(_OPENMP)
#pragma omp for
#endif
    for (int i = 0; i < n; i++) {
      dt1d(&tmp_d[(size_t)i * n], n, f.data(), arg.data(), v.data(), z.data());
      for (int j = 0; j < n; j++) {
        dist[(size_t)i * n + j] = std::sqrt(f[j]);
        const int jc = arg[j];
        const int ic = (jc >= 0) ? tmp_src[(size_t)i * n + jc] : -1;
        nearest_idx[(size_t)i * n + j] =
            (ic >= 0) ? (int32_t)((size_t)ic * n + jc) : -1;
      }
    }
  }
}

// Signed distance field in meters: positive inside `drivable`, negative
// outside (scipy convention in maps/compile.py: edt(drivable)-edt(~drivable)).
void mapkit_sdf(int grid, const uint8_t* drivable, float scale, float* sdf) {
  const size_t total = (size_t)grid * grid;
  std::vector<uint8_t> inv(total);
  for (size_t k = 0; k < total; k++) inv[k] = drivable[k] ? 0 : 1;
  std::vector<float> d_out(total), d_in(total);
  std::vector<int32_t> idx(total);
  // scipy's distance_transform_edt(x) = distance to nearest ZERO of x, so:
  //   inside  = edt(drivable)  = distance to nearest offroad = our edt(inv)
  //   outside = edt(~drivable) = distance to nearest road    = our edt(drivable)
  mapkit_edt(grid, inv.data(), d_in.data(), idx.data());
  mapkit_edt(grid, drivable, d_out.data(), idx.data());
  for (size_t k = 0; k < total; k++) {
    const float inside = drivable[k] ? d_in[k] : 0.0f;
    const float outside = drivable[k] ? 0.0f : d_out[k];
    sdf[k] = (inside - outside) * scale;
  }
}

// Fill dir_out with dir_angle of the nearest covered pixel.
void mapkit_propagate_dir(int grid, const uint8_t* covered,
                          const float* dir_angle, float* dir_out) {
  const size_t total = (size_t)grid * grid;
  std::vector<float> dist(total);
  std::vector<int32_t> idx(total);
  mapkit_edt(grid, covered, dist.data(), idx.data());
  for (size_t k = 0; k < total; k++)
    dir_out[k] = (idx[k] >= 0) ? dir_angle[(size_t)idx[k]] : 0.0f;
}

int mapkit_version() { return 1; }

}  // extern "C"
