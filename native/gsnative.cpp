// gsnative — native host-side data plane for gscream_tpu.
//
// The reference's native layer is CUDA compute (replaced by Pallas); its
// host data plane (COLMAP/PLY parsing, KNN init) is Python.  This library
// provides C++ fast paths for the host side — the pieces that feed the
// TPU — exposed through a minimal C ABI consumed via ctypes
// (gscream_tpu/native.py):
//
//   * colmap_read_points3d: points3D.bin → packed xyz/rgb/error arrays
//   * colmap_read_images:   images.bin → qvec/tvec/camera_id + names
//   * ply_read_f32:         binary-LE float PLY vertex block → matrix
//   * knn_mean3_sq:         exact mean squared distance to 3 NN
//     (simple-knn equivalent for host-side clouds, grid-accelerated)
//
// Build: make -C native   (produces libgsnative.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin
//   u64 n; per point: u64 id, 3×f64 xyz, 3×u8 rgb, f64 err,
//   u64 track_len, track_len×(u32,u32)
// Returns number of points, fills caller-allocated buffers when non-null.
long long colmap_count_points3d(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  fclose(f);
  return (long long)n;
}

int colmap_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                         double* err, long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if ((long long)n > cap) { fclose(f); return -2; }
  std::vector<unsigned char> head(8 + 24 + 3 + 8);
  for (uint64_t i = 0; i < n; ++i) {
    if (fread(head.data(), 1, head.size(), f) != head.size()) {
      fclose(f); return -3;
    }
    std::memcpy(xyz + 3 * i, head.data() + 8, 24);
    std::memcpy(rgb + 3 * i, head.data() + 32, 3);
    std::memcpy(err + i, head.data() + 35, 8);
    uint64_t track = 0;
    if (fread(&track, 8, 1, f) != 1) { fclose(f); return -3; }
    if (fseek(f, (long)(8 * track), SEEK_CUR) != 0) { fclose(f); return -3; }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// COLMAP images.bin
//   u64 n; per image: i32 id, 4×f64 qvec, 3×f64 tvec, i32 cam_id,
//   cstring name, u64 npts, npts×(f64,f64,i64)
// Two-pass API: count, then fill.  Names are returned as a single
// '\n'-joined buffer (max name 255 chars each).
long long colmap_count_images(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  fclose(f);
  return (long long)n;
}

int colmap_read_images(const char* path, int32_t* ids, double* qvec,
                       double* tvec, int32_t* cam_ids, char* names,
                       long long names_cap, long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if ((long long)n > cap) { fclose(f); return -2; }
  long long name_pos = 0;
  for (uint64_t i = 0; i < n; ++i) {
    int32_t id;
    if (fread(&id, 4, 1, f) != 1) { fclose(f); return -3; }
    ids[i] = id;
    if (fread(qvec + 4 * i, 8, 4, f) != 4) { fclose(f); return -3; }
    if (fread(tvec + 3 * i, 8, 3, f) != 3) { fclose(f); return -3; }
    if (fread(cam_ids + i, 4, 1, f) != 1) { fclose(f); return -3; }
    // name
    for (;;) {
      int c = fgetc(f);
      if (c == EOF) { fclose(f); return -3; }
      if (c == 0) break;
      if (name_pos + 2 >= names_cap) { fclose(f); return -4; }
      names[name_pos++] = (char)c;
    }
    names[name_pos++] = '\n';
    uint64_t npts = 0;
    if (fread(&npts, 8, 1, f) != 1) { fclose(f); return -3; }
    if (fseek(f, (long)(24 * npts), SEEK_CUR) != 0) { fclose(f); return -3; }
  }
  names[name_pos] = 0;
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Binary little-endian PLY with all-float32 vertex properties.
// Caller parses the header in Python (robustness) and passes the data
// offset + (n, stride); this just does the bulk IO.
int ply_read_f32(const char* path, long long offset, float* out,
                 long long n_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)offset, SEEK_SET) != 0) { fclose(f); return -1; }
  size_t got = fread(out, 4, (size_t)n_floats, f);
  fclose(f);
  return got == (size_t)n_floats ? 0 : -2;
}

// ---------------------------------------------------------------------------
// Exact mean squared distance to the 3 nearest neighbors.
// Uniform-grid acceleration with ring expansion: equivalent results to
// the O(N²) definition (simple-knn's Morton-box pass is approximate; this
// is exact — each query expands rings until 3 candidates are closer than
// the next ring's minimum possible distance).
struct GridKNN {
  float cell;
  float minx, miny, minz;
  int nx, ny, nz;
  std::vector<int> starts;   // cell → range into order
  std::vector<int> order;    // point ids grouped by cell
};

static inline long long cell_key(int x, int y, int z, int nx, int ny) {
  return ((long long)z * ny + y) * nx + x;
}

int knn_mean3_sq(const float* pts, long long n, float* out) {
  if (n < 4) {
    for (long long i = 0; i < n; ++i) out[i] = 0.f;
    return 0;
  }
  float minv[3] = {1e30f, 1e30f, 1e30f}, maxv[3] = {-1e30f, -1e30f, -1e30f};
  for (long long i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      minv[d] = std::min(minv[d], pts[3 * i + d]);
      maxv[d] = std::max(maxv[d], pts[3 * i + d]);
    }
  float ext = std::max({maxv[0] - minv[0], maxv[1] - minv[1],
                        maxv[2] - minv[2], 1e-9f});
  // aim for ~2 points per cell
  float cell = ext / std::max(1.0, std::cbrt((double)n / 2.0));
  int nx = (int)((maxv[0] - minv[0]) / cell) + 1;
  int ny = (int)((maxv[1] - minv[1]) / cell) + 1;
  int nz = (int)((maxv[2] - minv[2]) / cell) + 1;

  std::vector<int> cnt((size_t)nx * ny * nz + 1, 0);
  std::vector<int> cid(n);
  for (long long i = 0; i < n; ++i) {
    int cx = (int)((pts[3 * i] - minv[0]) / cell);
    int cy = (int)((pts[3 * i + 1] - minv[1]) / cell);
    int cz = (int)((pts[3 * i + 2] - minv[2]) / cell);
    cx = std::min(cx, nx - 1); cy = std::min(cy, ny - 1);
    cz = std::min(cz, nz - 1);
    cid[i] = (int)cell_key(cx, cy, cz, nx, ny);
    cnt[cid[i] + 1]++;
  }
  for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
  std::vector<int> order(n);
  {
    std::vector<int> cur(cnt.begin(), cnt.end() - 1);
    for (long long i = 0; i < n; ++i) order[cur[cid[i]]++] = (int)i;
  }

  for (long long i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    float best[3] = {1e30f, 1e30f, 1e30f};
    int cx = (int)((p[0] - minv[0]) / cell);
    int cy = (int)((p[1] - minv[1]) / cell);
    int cz = (int)((p[2] - minv[2]) / cell);
    cx = std::min(cx, nx - 1); cy = std::min(cy, ny - 1);
    cz = std::min(cz, nz - 1);
    for (int ring = 0; ; ++ring) {
      // once 3 found, a further ring can only help if its minimum
      // possible distance beats the current worst
      if (best[2] < 1e29f) {
        float ring_min = (ring - 1) > 0 ? (ring - 1) * cell : 0.f;
        if (ring_min * ring_min > best[2]) break;
      }
      bool any_cell = false;
      int x0 = cx - ring, x1 = cx + ring;
      int y0 = cy - ring, y1 = cy + ring;
      int z0 = cz - ring, z1 = cz + ring;
      for (int z = std::max(z0, 0); z <= std::min(z1, nz - 1); ++z)
        for (int y = std::max(y0, 0); y <= std::min(y1, ny - 1); ++y)
          for (int x = std::max(x0, 0); x <= std::min(x1, nx - 1); ++x) {
            // shell only
            if (ring > 0 && x != x0 && x != x1 && y != y0 && y != y1 &&
                z != z0 && z != z1)
              continue;
            any_cell = true;
            long long c = cell_key(x, y, z, nx, ny);
            for (int k = cnt[c]; k < cnt[c + 1]; ++k) {
              int j = order[k];
              if (j == (int)i) continue;
              const float* q = pts + 3 * j;
              float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[2]) {
                best[2] = d2;
                if (best[2] < best[1]) std::swap(best[1], best[2]);
                if (best[1] < best[0]) std::swap(best[0], best[1]);
              }
            }
          }
      if (!any_cell && ring > nx + ny + nz) break;  // safety
    }
    out[i] = (best[0] + best[1] + best[2]) / 3.0f;
  }
  return 0;
}

}  // extern "C"
