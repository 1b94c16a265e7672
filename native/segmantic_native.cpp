// segmantic-tpu native runtime kernels (host side).
//
// TPU-native equivalents of the C++ machinery the reference leans on via
// ITK/VTK (SURVEY.md §2.9):
//  - exact Euclidean distance transform (Felzenszwalb/Huttenlocher lower
//    envelope per axis == Maurer exactness) with anisotropic spacing,
//    replacing itk::SignedMaurerDistanceMapImageFilter
//    (reference: src/segmantic/seg/evaluation.py:17-25)
//  - multithreaded affine resampling (trilinear / nearest, constant pad),
//    replacing itk::ResampleImageFilter on the host cache-build path
//    (reference: src/segmantic/image/processing.py:49-120)
//  - label-surface extraction as voxel-face quad meshes with optional
//    Laplacian smoothing, standing in for vtkDiscreteFlyingEdges3D
//    (reference: scripts/visualize_label_surfaces.py:14-69)
//
// Plain C ABI for ctypes binding (no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <queue>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// ---------------------------------------------------------------------------
// 1D squared distance transform (Felzenszwalb & Huttenlocher), with
// per-sample spacing `h`: d(i) = min_j ((i-j)*h)^2 + f(j)
void dt1d(const float* f, float* d, int n, double h, int* v, double* z) {
  // clamp INF to a large finite value so the vanilla lower-envelope scan
  // stays numerically valid (values >= kBig/2 are treated as INF on output)
  constexpr double kBig = 1e20;
  auto fv_at = [&](int i) -> double {
    return f[i] >= kInf ? kBig : static_cast<double>(f[i]);
  };
  int k = 0;
  v[0] = 0;
  z[0] = -1e30;
  z[1] = 1e30;
  const double h2 = h * h;
  for (int q = 1; q < n; ++q) {
    double s;
    while (true) {
      s = ((fv_at(q) + h2 * q * q) - (fv_at(v[k]) + h2 * v[k] * v[k])) /
          (2.0 * h2 * (q - v[k]));
      if (s <= z[k] && k > 0) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = 1e30;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    const double dq = h * (q - v[k]);
    const double val = dq * dq + fv_at(v[k]);
    d[q] = val >= kBig / 2 ? kInf : static_cast<float>(val);
  }
}

int64_t max_threads() {
  // SEGMANTIC_NATIVE_THREADS caps the pool (scaling harnesses; pinned
  // deployments); default = all hardware threads
  static int64_t cap = [] {
    const char* env = std::getenv("SEGMANTIC_NATIVE_THREADS");
    if (env) {
      long v = std::atol(env);
      if (v > 0) return static_cast<int64_t>(v);
    }
    unsigned hw = std::thread::hardware_concurrency();
    return static_cast<int64_t>(hw ? hw : 4);
  }();
  return cap;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  int64_t n_threads = std::min<int64_t>(max_threads(), n);
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Exact EDT: out[x] = distance (mm, given spacing) from x to nearest
// nonzero voxel of mask. shape is [d0, d1, d2] (pass d2=1 for 2D).
void edt_distance_to_foreground(const uint8_t* mask, float* out,
                                const int64_t* shape, const double* spacing,
                                int ndim) {
  const int64_t d0 = shape[0];
  const int64_t d1 = ndim > 1 ? shape[1] : 1;
  const int64_t d2 = ndim > 2 ? shape[2] : 1;
  const int64_t n = d0 * d1 * d2;

  // init: 0 at foreground, INF elsewhere
  for (int64_t i = 0; i < n; ++i) out[i] = mask[i] ? 0.0f : kInf;

  const double s0 = spacing ? spacing[0] : 1.0;
  const double s1 = spacing && ndim > 1 ? spacing[1] : 1.0;
  const double s2 = spacing && ndim > 2 ? spacing[2] : 1.0;

  // axis 2 (contiguous)
  if (d2 > 1) {
    parallel_for(d0 * d1, [&](int64_t lo, int64_t hi) {
      std::vector<float> buf(d2);
      std::vector<int> v(d2);
      std::vector<double> z(d2 + 1);
      for (int64_t r = lo; r < hi; ++r) {
        float* row = out + r * d2;
        dt1d(row, buf.data(), static_cast<int>(d2), s2, v.data(), z.data());
        std::memcpy(row, buf.data(), d2 * sizeof(float));
      }
    });
  }
  // axis 1
  if (d1 > 1) {
    parallel_for(d0 * d2, [&](int64_t lo, int64_t hi) {
      std::vector<float> line(d1), buf(d1);
      std::vector<int> v(d1);
      std::vector<double> z(d1 + 1);
      for (int64_t idx = lo; idx < hi; ++idx) {
        const int64_t i0 = idx / d2;
        const int64_t i2 = idx % d2;
        float* base = out + i0 * d1 * d2 + i2;
        for (int64_t j = 0; j < d1; ++j) line[j] = base[j * d2];
        dt1d(line.data(), buf.data(), static_cast<int>(d1), s1, v.data(),
             z.data());
        for (int64_t j = 0; j < d1; ++j) base[j * d2] = buf[j];
      }
    });
  }
  // axis 0
  if (d0 > 1) {
    parallel_for(d1 * d2, [&](int64_t lo, int64_t hi) {
      std::vector<float> line(d0), buf(d0);
      std::vector<int> v(d0);
      std::vector<double> z(d0 + 1);
      for (int64_t idx = lo; idx < hi; ++idx) {
        float* base = out + idx;
        const int64_t stride = d1 * d2;
        for (int64_t j = 0; j < d0; ++j) line[j] = base[j * stride];
        dt1d(line.data(), buf.data(), static_cast<int>(d0), s0, v.data(),
             z.data());
        for (int64_t j = 0; j < d0; ++j) base[j * stride] = buf[j];
      }
    });
  }
  // sqrt
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      out[i] = out[i] >= kInf ? kInf : std::sqrt(out[i]);
  });
}

// Multithreaded affine resample, channel-first float32.
// matrix is row-major (ndim x (ndim+1)); in/out shapes are spatial only.
void resample_affine_f32(const float* in, float* out, const int64_t* in_shape,
                         const int64_t* out_shape, int64_t channels,
                         const double* matrix, int ndim, int order,
                         float cval) {
  const int64_t I0 = in_shape[0];
  const int64_t I1 = ndim > 1 ? in_shape[1] : 1;
  const int64_t I2 = ndim > 2 ? in_shape[2] : 1;
  const int64_t O0 = out_shape[0];
  const int64_t O1 = ndim > 1 ? out_shape[1] : 1;
  const int64_t O2 = ndim > 2 ? out_shape[2] : 1;
  const int64_t in_spatial = I0 * I1 * I2;
  const int64_t out_spatial = O0 * O1 * O2;
  const int cols = ndim + 1;

  auto m = [&](int r, int c) { return matrix[r * cols + c]; };

  parallel_for(O0, [&](int64_t lo, int64_t hi) {
    for (int64_t x = lo; x < hi; ++x) {
      for (int64_t y = 0; y < O1; ++y) {
        for (int64_t z = 0; z < O2; ++z) {
          double src[3] = {0, 0, 0};
          for (int a = 0; a < ndim; ++a) {
            src[a] = m(a, 0) * x + m(a, ndim);
            if (ndim > 1) src[a] += m(a, 1) * y;
            if (ndim > 2) src[a] += m(a, 2) * z;
          }
          const int64_t out_idx = (x * O1 + y) * O2 + z;
          bool inside = true;
          if (order == 0) {
            int64_t idx[3] = {0, 0, 0};
            const int64_t dims[3] = {I0, I1, I2};
            for (int a = 0; a < ndim; ++a) {
              const double r = std::nearbyint(src[a]);
              if (r < 0 || r > dims[a] - 1) inside = false;
              idx[a] = std::min<int64_t>(
                  std::max<int64_t>(static_cast<int64_t>(r), 0), dims[a] - 1);
            }
            const int64_t in_idx = (idx[0] * I1 + idx[1]) * I2 + idx[2];
            for (int64_t c = 0; c < channels; ++c)
              out[c * out_spatial + out_idx] =
                  inside ? in[c * in_spatial + in_idx] : cval;
          } else {
            const int64_t dims[3] = {I0, I1, I2};
            int64_t lo_i[3] = {0, 0, 0};
            double w[3] = {0, 0, 0};
            for (int a = 0; a < ndim; ++a) {
              if (src[a] < 0 || src[a] > dims[a] - 1) inside = false;
              const double fl = std::floor(src[a]);
              lo_i[a] = std::min<int64_t>(
                  std::max<int64_t>(static_cast<int64_t>(fl), 0), dims[a] - 1);
              w[a] = src[a] - fl;
            }
            if (!inside) {
              for (int64_t c = 0; c < channels; ++c)
                out[c * out_spatial + out_idx] = cval;
              continue;
            }
            const int corners = 1 << ndim;
            for (int64_t c = 0; c < channels; ++c) {
              double acc = 0.0;
              for (int corner = 0; corner < corners; ++corner) {
                double weight = 1.0;
                int64_t idx[3] = {lo_i[0], lo_i[1], lo_i[2]};
                bool valid = true;
                for (int a = 0; a < ndim; ++a) {
                  const int bit = (corner >> a) & 1;
                  if (bit) {
                    idx[a] = lo_i[a] + 1;
                    if (idx[a] > dims[a] - 1) {
                      valid = false;
                      break;
                    }
                    weight *= w[a];
                  } else {
                    weight *= 1.0 - w[a];
                  }
                }
                if (!valid || weight == 0.0) continue;
                const int64_t in_idx = (idx[0] * I1 + idx[1]) * I2 + idx[2];
                acc += weight * in[c * in_spatial + in_idx];
              }
              out[c * out_spatial + out_idx] = static_cast<float>(acc);
            }
          }
        }
      }
    }
  });
}

// Label-surface extraction: boundary faces of (label == id) as quads split
// into triangles, vertices in physical space via the 4x4 affine, with
// `smooth_iters` rounds of Laplacian smoothing.
// Returns number of triangles; caller frees with surface_free.
struct MeshBuffers {
  std::vector<float> verts;   // 3 per vertex
  std::vector<int64_t> tris;  // 3 indices per triangle
};

int64_t extract_label_surface(const uint16_t* labels, const int64_t* shape,
                              const double* affine, uint16_t label_id,
                              int smooth_iters, float** verts_out,
                              int64_t* n_verts_out, int64_t** tris_out) {
  const int64_t D0 = shape[0], D1 = shape[1], D2 = shape[2];
  auto at = [&](int64_t i, int64_t j, int64_t k) -> bool {
    if (i < 0 || j < 0 || k < 0 || i >= D0 || j >= D1 || k >= D2) return false;
    return labels[(i * D1 + j) * D2 + k] == label_id;
  };

  // grid-corner vertex dedup
  std::unordered_map<int64_t, int64_t> vert_ids;
  std::vector<double> vcoords;  // voxel-corner coordinates (x3)
  std::vector<int64_t> tris;

  auto corner_id = [&](int64_t i, int64_t j, int64_t k) -> int64_t {
    const int64_t key = (i * (D1 + 1) + j) * (D2 + 1) + k;
    auto it = vert_ids.find(key);
    if (it != vert_ids.end()) return it->second;
    const int64_t id = static_cast<int64_t>(vcoords.size() / 3);
    vert_ids.emplace(key, id);
    vcoords.push_back(i - 0.5);
    vcoords.push_back(j - 0.5);
    vcoords.push_back(k - 0.5);
    return id;
  };

  // face corner offsets per axis/side: quad of 4 voxel corners
  static const int quad_offsets[3][4][3] = {
      {{0, 0, 0}, {0, 1, 0}, {0, 1, 1}, {0, 0, 1}},  // axis 0 face
      {{0, 0, 0}, {0, 0, 1}, {1, 0, 1}, {1, 0, 0}},  // axis 1 face
      {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0}},  // axis 2 face
  };

  for (int64_t i = 0; i < D0; ++i) {
    for (int64_t j = 0; j < D1; ++j) {
      for (int64_t k = 0; k < D2; ++k) {
        if (!at(i, j, k)) continue;
        const int64_t nbr[6][3] = {{i - 1, j, k}, {i + 1, j, k}, {i, j - 1, k},
                                   {i, j + 1, k}, {i, j, k - 1}, {i, j, k + 1}};
        for (int f = 0; f < 6; ++f) {
          if (at(nbr[f][0], nbr[f][1], nbr[f][2])) continue;
          const int axis = f / 2;
          const int side = f % 2;  // 0 = low face, 1 = high face
          int64_t base[3] = {i, j, k};
          base[axis] += side;
          int64_t q[4];
          for (int c = 0; c < 4; ++c) {
            const int* off = quad_offsets[axis][c];
            q[c] = corner_id(base[0] + off[0], base[1] + off[1],
                             base[2] + off[2]);
          }
          // orient by side so normals point outward
          if (side == 1) {
            tris.insert(tris.end(), {q[0], q[1], q[2], q[0], q[2], q[3]});
          } else {
            tris.insert(tris.end(), {q[0], q[2], q[1], q[0], q[3], q[2]});
          }
        }
      }
    }
  }

  const int64_t n_verts = static_cast<int64_t>(vcoords.size() / 3);
  const int64_t n_tris = static_cast<int64_t>(tris.size() / 3);

  // Laplacian smoothing on the surface graph (uniform weights)
  if (smooth_iters > 0 && n_verts > 0) {
    std::vector<std::vector<int64_t>> nbrs(n_verts);
    for (int64_t t = 0; t < n_tris; ++t) {
      for (int e = 0; e < 3; ++e) {
        const int64_t a = tris[3 * t + e];
        const int64_t b = tris[3 * t + (e + 1) % 3];
        nbrs[a].push_back(b);
        nbrs[b].push_back(a);
      }
    }
    std::vector<double> next(vcoords.size());
    for (int iter = 0; iter < smooth_iters; ++iter) {
      parallel_for(n_verts, [&](int64_t lo, int64_t hi) {
        for (int64_t v = lo; v < hi; ++v) {
          if (nbrs[v].empty()) {
            for (int a = 0; a < 3; ++a) next[3 * v + a] = vcoords[3 * v + a];
            continue;
          }
          double acc[3] = {0, 0, 0};
          for (int64_t u : nbrs[v])
            for (int a = 0; a < 3; ++a) acc[a] += vcoords[3 * u + a];
          const double inv = 1.0 / nbrs[v].size();
          for (int a = 0; a < 3; ++a)
            next[3 * v + a] =
                0.5 * vcoords[3 * v + a] + 0.5 * acc[a] * inv;
        }
      });
      vcoords.swap(next);
    }
  }

  // voxel corners -> physical via affine
  auto* verts = static_cast<float*>(std::malloc(sizeof(float) * n_verts * 3));
  for (int64_t v = 0; v < n_verts; ++v) {
    const double x = vcoords[3 * v], y = vcoords[3 * v + 1],
                 z = vcoords[3 * v + 2];
    for (int r = 0; r < 3; ++r) {
      verts[3 * v + r] = static_cast<float>(
          affine[r * 4 + 0] * x + affine[r * 4 + 1] * y +
          affine[r * 4 + 2] * z + affine[r * 4 + 3]);
    }
  }
  auto* tri_buf =
      static_cast<int64_t*>(std::malloc(sizeof(int64_t) * tris.size()));
  std::memcpy(tri_buf, tris.data(), sizeof(int64_t) * tris.size());

  *verts_out = verts;
  *n_verts_out = n_verts;
  *tris_out = tri_buf;
  return n_tris;
}

void surface_free(void* p) { std::free(p); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Parallel gzip compression (pigz-style): the input is split into chunks and
// each thread deflates its chunk as an independent gzip member; the
// concatenation of members is a valid multi-member gzip stream (RFC 1952),
// decodable by any gzip reader. Used by the NIfTI codec for .nii.gz writes
// (replacing single-threaded zlib on the host I/O path).

#include <zlib.h>

extern "C" {

int64_t gzip_compress_parallel(const uint8_t* in, int64_t n, int level,
                               uint8_t** out, int64_t* out_len) {
  const int64_t chunk = 4 * 1024 * 1024;
  const int64_t n_chunks = n == 0 ? 1 : (n + chunk - 1) / chunk;
  std::vector<std::vector<uint8_t>> parts(n_chunks);
  std::atomic<bool> failed{false};

  parallel_for(n_chunks, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t off = i * chunk;
      const int64_t len = std::min(chunk, n - off);
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      // windowBits 15+16 → gzip wrapper
      if (deflateInit2(&zs, level, Z_DEFLATED, 15 + 16, 8,
                       Z_DEFAULT_STRATEGY) != Z_OK) {
        failed = true;
        return;
      }
      const uLong bound = deflateBound(&zs, static_cast<uLong>(len)) + 32;
      parts[i].resize(bound);
      zs.next_in = const_cast<Bytef*>(in + off);
      zs.avail_in = static_cast<uInt>(len);
      zs.next_out = parts[i].data();
      zs.avail_out = static_cast<uInt>(bound);
      if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
        failed = true;
        deflateEnd(&zs);
        return;
      }
      parts[i].resize(zs.total_out);
      deflateEnd(&zs);
    }
  });
  if (failed) return -1;

  int64_t total = 0;
  for (auto& p : parts) total += static_cast<int64_t>(p.size());
  auto* buf = static_cast<uint8_t*>(std::malloc(total));
  int64_t pos = 0;
  for (auto& p : parts) {
    std::memcpy(buf + pos, p.data(), p.size());
    pos += static_cast<int64_t>(p.size());
  }
  *out = buf;
  *out_len = total;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Naive surface nets on a binary label mask: one vertex per active dual cell
// (2x2x2 voxel block with mixed occupancy) at the centroid of its crossing-
// edge midpoints; one quad per crossing edge joining the 4 incident cells.
// Smoother and still watertight vs the voxel-face extractor; no marching-
// cubes tables needed. (Stands in for vtkDiscreteFlyingEdges3D + smoothing,
// reference: scripts/visualize_label_surfaces.py:14-69.)

extern "C" {

int64_t extract_label_surface_net(const uint16_t* labels, const int64_t* shape,
                                  const double* affine, uint16_t label_id,
                                  int smooth_iters, float** verts_out,
                                  int64_t* n_verts_out, int64_t** tris_out) {
  const int64_t D0 = shape[0], D1 = shape[1], D2 = shape[2];
  auto inside = [&](int64_t i, int64_t j, int64_t k) -> bool {
    if (i < 0 || j < 0 || k < 0 || i >= D0 || j >= D1 || k >= D2) return false;
    return labels[(i * D1 + j) * D2 + k] == label_id;
  };

  // cells indexed by min-corner voxel, range [-1, D-1] on each axis
  auto cell_key = [&](int64_t i, int64_t j, int64_t k) -> int64_t {
    return ((i + 1) * (D1 + 1) + (j + 1)) * (D2 + 1) + (k + 1);
  };

  std::unordered_map<int64_t, int64_t> cell_ids;
  std::vector<double> acc;    // centroid accumulators (x3)
  std::vector<int32_t> cnt;   // crossing count per cell
  std::vector<int64_t> tris;

  auto cell_id = [&](int64_t i, int64_t j, int64_t k) -> int64_t {
    const int64_t key = cell_key(i, j, k);
    auto it = cell_ids.find(key);
    if (it != cell_ids.end()) return it->second;
    const int64_t id = static_cast<int64_t>(cnt.size());
    cell_ids.emplace(key, id);
    acc.insert(acc.end(), {0.0, 0.0, 0.0});
    cnt.push_back(0);
    return id;
  };

  const int64_t e[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};

  for (int64_t i = -1; i < D0; ++i) {
    for (int64_t j = -1; j < D1; ++j) {
      for (int64_t k = -1; k < D2; ++k) {
        const bool lo_in = inside(i, j, k);
        for (int a = 0; a < 3; ++a) {
          const int64_t vi = i + e[a][0], vj = j + e[a][1], vk = k + e[a][2];
          const bool hi_in = inside(vi, vj, vk);
          if (lo_in == hi_in) continue;
          // midpoint of the crossing edge (voxel coordinates)
          const double mx = i + 0.5 * e[a][0];
          const double my = j + 0.5 * e[a][1];
          const double mz = k + 0.5 * e[a][2];
          const int b = (a + 1) % 3, c = (a + 2) % 3;
          int64_t q[4];
          const int64_t base[3] = {i, j, k};
          // the 4 cells around this edge: offset -1/0 along axes b and c
          const int order[4][2] = {{0, 0}, {-1, 0}, {-1, -1}, {0, -1}};
          for (int m = 0; m < 4; ++m) {
            int64_t cc[3] = {base[0], base[1], base[2]};
            cc[b] += order[m][0];
            cc[c] += order[m][1];
            q[m] = cell_id(cc[0], cc[1], cc[2]);
            acc[3 * q[m] + 0] += mx;
            acc[3 * q[m] + 1] += my;
            acc[3 * q[m] + 2] += mz;
            cnt[q[m]] += 1;
          }
          // orient the quad so the normal points from inside to outside
          if (lo_in) {
            tris.insert(tris.end(), {q[0], q[1], q[2], q[0], q[2], q[3]});
          } else {
            tris.insert(tris.end(), {q[0], q[2], q[1], q[0], q[3], q[2]});
          }
        }
      }
    }
  }

  const int64_t n_verts = static_cast<int64_t>(cnt.size());
  const int64_t n_tris = static_cast<int64_t>(tris.size() / 3);

  std::vector<double> vcoords(3 * n_verts);
  for (int64_t v = 0; v < n_verts; ++v) {
    const double inv = cnt[v] > 0 ? 1.0 / cnt[v] : 0.0;
    for (int d = 0; d < 3; ++d) vcoords[3 * v + d] = acc[3 * v + d] * inv;
  }

  // Laplacian smoothing on the surface graph (uniform weights)
  if (smooth_iters > 0 && n_verts > 0) {
    std::vector<std::vector<int64_t>> nbrs(n_verts);
    for (int64_t t = 0; t < n_tris; ++t) {
      for (int eidx = 0; eidx < 3; ++eidx) {
        const int64_t a2 = tris[3 * t + eidx];
        const int64_t b2 = tris[3 * t + (eidx + 1) % 3];
        nbrs[a2].push_back(b2);
        nbrs[b2].push_back(a2);
      }
    }
    std::vector<double> next(vcoords.size());
    for (int iter = 0; iter < smooth_iters; ++iter) {
      parallel_for(n_verts, [&](int64_t lo, int64_t hi) {
        for (int64_t v = lo; v < hi; ++v) {
          if (nbrs[v].empty()) {
            for (int d = 0; d < 3; ++d) next[3 * v + d] = vcoords[3 * v + d];
            continue;
          }
          double s[3] = {0, 0, 0};
          for (int64_t u : nbrs[v])
            for (int d = 0; d < 3; ++d) s[d] += vcoords[3 * u + d];
          const double inv = 1.0 / nbrs[v].size();
          for (int d = 0; d < 3; ++d)
            next[3 * v + d] = 0.5 * vcoords[3 * v + d] + 0.5 * s[d] * inv;
        }
      });
      vcoords.swap(next);
    }
  }

  auto* verts = static_cast<float*>(std::malloc(sizeof(float) * n_verts * 3));
  for (int64_t v = 0; v < n_verts; ++v) {
    const double x = vcoords[3 * v], y = vcoords[3 * v + 1],
                 z = vcoords[3 * v + 2];
    for (int r = 0; r < 3; ++r) {
      verts[3 * v + r] = static_cast<float>(
          affine[r * 4 + 0] * x + affine[r * 4 + 1] * y +
          affine[r * 4 + 2] * z + affine[r * 4 + 3]);
    }
  }
  auto* tri_buf =
      static_cast<int64_t*>(std::malloc(sizeof(int64_t) * tris.size()));
  std::memcpy(tri_buf, tris.data(), sizeof(int64_t) * tris.size());

  *verts_out = verts;
  *n_verts_out = n_verts;
  *tris_out = tri_buf;
  return n_tris;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Marching tetrahedra on a binary label mask + quadric-error decimation.
//
// A true isosurface triangle mesher standing in for vtkDiscreteFlyingEdges3D
// + vtkDecimatePro (reference: scripts/visualize_label_surfaces.py:33-69):
// each dual cell (2x2x2 voxel block, nodes at voxel centers, indicator 0/1,
// iso = 0.5) is split into 6 tetrahedra sharing the main diagonal — a
// translation-invariant split, so face diagonals of adjacent cells coincide
// and the mesh is watertight. Crossing-edge vertices sit at edge midpoints
// (binary field) and are deduplicated globally per grid edge.

namespace {

void laplacian_smooth(std::vector<double>& vcoords,
                      const std::vector<int64_t>& tris, int64_t n_verts,
                      int iters) {
  if (iters <= 0 || n_verts == 0) return;
  const int64_t n_tris = static_cast<int64_t>(tris.size() / 3);
  std::vector<std::vector<int64_t>> nbrs(n_verts);
  for (int64_t t = 0; t < n_tris; ++t) {
    for (int e = 0; e < 3; ++e) {
      const int64_t a = tris[3 * t + e];
      const int64_t b = tris[3 * t + (e + 1) % 3];
      nbrs[a].push_back(b);
      nbrs[b].push_back(a);
    }
  }
  std::vector<double> next(vcoords.size());
  for (int it = 0; it < iters; ++it) {
    parallel_for(n_verts, [&](int64_t lo, int64_t hi) {
      for (int64_t v = lo; v < hi; ++v) {
        if (nbrs[v].empty()) {
          for (int d = 0; d < 3; ++d) next[3 * v + d] = vcoords[3 * v + d];
          continue;
        }
        double s[3] = {0, 0, 0};
        for (int64_t u : nbrs[v])
          for (int d = 0; d < 3; ++d) s[d] += vcoords[3 * u + d];
        const double inv = 1.0 / nbrs[v].size();
        for (int d = 0; d < 3; ++d)
          next[3 * v + d] = 0.5 * vcoords[3 * v + d] + 0.5 * s[d] * inv;
      }
    });
    vcoords.swap(next);
  }
}

}  // namespace

extern "C" {

int64_t extract_label_surface_mt(const uint16_t* labels, const int64_t* shape,
                                 const double* affine, uint16_t label_id,
                                 int smooth_iters, float** verts_out,
                                 int64_t* n_verts_out, int64_t** tris_out) {
  const int64_t D0 = shape[0], D1 = shape[1], D2 = shape[2];
  // grid nodes are voxel centers, padded by one layer of "outside" so the
  // surface closes at the volume boundary; node (i,j,k) with i in [-1, D0]
  const int64_t N0 = D0 + 2, N1 = D1 + 2, N2 = D2 + 2;
  auto inside = [&](int64_t i, int64_t j, int64_t k) -> bool {
    if (i < 0 || j < 0 || k < 0 || i >= D0 || j >= D1 || k >= D2) return false;
    return labels[(i * D1 + j) * D2 + k] == label_id;
  };
  auto node_id = [&](int64_t i, int64_t j, int64_t k) -> int64_t {
    return ((i + 1) * N1 + (j + 1)) * N2 + (k + 1);
  };

  // one mesh vertex per crossing grid edge, at the midpoint (iso 0.5)
  std::unordered_map<uint64_t, int64_t> edge_vert;
  std::vector<double> vcoords;
  std::vector<int64_t> tris;

  auto edge_vertex = [&](const int64_t a[3], const int64_t b[3]) -> int64_t {
    int64_t ia = node_id(a[0], a[1], a[2]);
    int64_t ib = node_id(b[0], b[1], b[2]);
    if (ia > ib) std::swap(ia, ib);
    const uint64_t key =
        static_cast<uint64_t>(ia) * static_cast<uint64_t>(N0 * N1 * N2) +
        static_cast<uint64_t>(ib);
    auto it = edge_vert.find(key);
    if (it != edge_vert.end()) return it->second;
    const int64_t id = static_cast<int64_t>(vcoords.size() / 3);
    edge_vert.emplace(key, id);
    vcoords.push_back(0.5 * (a[0] + b[0]));
    vcoords.push_back(0.5 * (a[1] + b[1]));
    vcoords.push_back(0.5 * (a[2] + b[2]));
    return id;
  };

  // cube corner offsets, bit 0 -> +i, bit 1 -> +j, bit 2 -> +k
  const int64_t corner[8][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
                                {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
  // 6 tetrahedra around the main diagonal c0-c7 (corner indices per the
  // bit scheme above); orientation handled geometrically below
  const int tet[6][4] = {{0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
                         {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7}};

  auto emit_tri = [&](int64_t va, int64_t vb, int64_t vc,
                      const double in_pt[3]) {
    // orient so the normal points away from the inside sample point
    const double *A = &vcoords[3 * va], *B = &vcoords[3 * vb],
                 *C = &vcoords[3 * vc];
    const double u[3] = {B[0] - A[0], B[1] - A[1], B[2] - A[2]};
    const double w[3] = {C[0] - A[0], C[1] - A[1], C[2] - A[2]};
    const double n[3] = {u[1] * w[2] - u[2] * w[1], u[2] * w[0] - u[0] * w[2],
                         u[0] * w[1] - u[1] * w[0]};
    const double cx = (A[0] + B[0] + C[0]) / 3.0 - in_pt[0];
    const double cy = (A[1] + B[1] + C[1]) / 3.0 - in_pt[1];
    const double cz = (A[2] + B[2] + C[2]) / 3.0 - in_pt[2];
    if (n[0] * cx + n[1] * cy + n[2] * cz >= 0)
      tris.insert(tris.end(), {va, vb, vc});
    else
      tris.insert(tris.end(), {va, vc, vb});
  };

  for (int64_t i = -1; i < D0; ++i) {
    for (int64_t j = -1; j < D1; ++j) {
      for (int64_t k = -1; k < D2; ++k) {
        bool in[8];
        int64_t pos[8][3];
        int any_in = 0, all_in = 1;
        for (int c = 0; c < 8; ++c) {
          pos[c][0] = i + corner[c][0];
          pos[c][1] = j + corner[c][1];
          pos[c][2] = k + corner[c][2];
          in[c] = inside(pos[c][0], pos[c][1], pos[c][2]);
          any_in |= in[c];
          all_in &= in[c];
        }
        if (!any_in || all_in) continue;

        for (const auto& t : tet) {
          const bool b0 = in[t[0]], b1 = in[t[1]], b2 = in[t[2]],
                     b3 = in[t[3]];
          const int n_in = b0 + b1 + b2 + b3;
          if (n_in == 0 || n_in == 4) continue;

          // centroid of the inside corners: the "inside" side of the surface
          double in_pt[3] = {0, 0, 0};
          const bool bs[4] = {b0, b1, b2, b3};
          for (int c = 0; c < 4; ++c)
            if (bs[c])
              for (int d = 0; d < 3; ++d) in_pt[d] += pos[t[c]][d];
          for (int d = 0; d < 3; ++d) in_pt[d] /= n_in;

          // crossing edges of the tet
          int64_t ev[4];
          int n_ev = 0;
          const int tedge[6][2] = {{0, 1}, {0, 2}, {0, 3},
                                   {1, 2}, {1, 3}, {2, 3}};
          // collect in an order that makes the 2-2 case a proper fan:
          // for n_in==2, edges sharing an inside corner are adjacent
          for (const auto& te : tedge) {
            if (bs[te[0]] != bs[te[1]])
              ev[n_ev++] = edge_vertex(pos[t[te[0]]], pos[t[te[1]]]);
          }
          if (n_ev == 3) {
            emit_tri(ev[0], ev[1], ev[2], in_pt);
          } else {  // n_ev == 4: split the crossing quad into two triangles.
            // The 4 crossing edges form a quad; with the tedge order above
            // the two edges from one inside corner come first. Find the
            // diagonal pairing by triangle-fan over a shared vertex: the
            // quad's vertices in cyclic order are ev[0], ev[1], ev[3], ev[2]
            // for the 2-in/2-out split of tedge order (verified by the
            // watertightness test).
            emit_tri(ev[0], ev[1], ev[3], in_pt);
            emit_tri(ev[0], ev[3], ev[2], in_pt);
          }
        }
      }
    }
  }

  const int64_t n_verts = static_cast<int64_t>(vcoords.size() / 3);
  laplacian_smooth(vcoords, tris, n_verts, smooth_iters);

  auto* verts = static_cast<float*>(std::malloc(sizeof(float) * n_verts * 3));
  for (int64_t v = 0; v < n_verts; ++v) {
    const double x = vcoords[3 * v], y = vcoords[3 * v + 1],
                 z = vcoords[3 * v + 2];
    for (int r = 0; r < 3; ++r)
      verts[3 * v + r] = static_cast<float>(
          affine[r * 4 + 0] * x + affine[r * 4 + 1] * y +
          affine[r * 4 + 2] * z + affine[r * 4 + 3]);
  }
  auto* tri_buf =
      static_cast<int64_t*>(std::malloc(sizeof(int64_t) * tris.size()));
  std::memcpy(tri_buf, tris.data(), sizeof(int64_t) * tris.size());
  *verts_out = verts;
  *n_verts_out = n_verts;
  *tris_out = tri_buf;
  return static_cast<int64_t>(tris.size() / 3);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Quadric-error-metric edge-collapse decimation (Garland-Heckbert style),
// standing in for vtkDecimatePro(target_reduction)
// (reference: scripts/visualize_label_surfaces.py:52-56). Collapses cheapest
// edges to the midpoint-or-endpoint minimizing summed plane quadrics until
// `reduction` of the triangles are removed; skips collapses that flip
// triangle normals (keeps the mesh locally sane).

namespace {

struct Quadric {
  // symmetric 4x4 as upper triangle: a2 ab ac ad b2 bc bd c2 cd d2
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double a, double b, double c, double d) {
    q[0] += a * a; q[1] += a * b; q[2] += a * c; q[3] += a * d;
    q[4] += b * b; q[5] += b * c; q[6] += b * d;
    q[7] += c * c; q[8] += c * d; q[9] += d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) q[i] += o.q[i];
  }
  double eval(const double p[3]) const {
    const double x = p[0], y = p[1], z = p[2];
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z +
           2 * q[3] * x + q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }
};

}  // namespace

extern "C" {

int64_t decimate_mesh(const float* verts_in, int64_t n_verts,
                      const int64_t* tris_in, int64_t n_tris,
                      double reduction, float** verts_out,
                      int64_t* n_verts_out, int64_t** tris_out) {
  std::vector<double> V(3 * n_verts);
  for (int64_t i = 0; i < 3 * n_verts; ++i) V[i] = verts_in[i];
  std::vector<int64_t> T(tris_in, tris_in + 3 * n_tris);

  // per-vertex quadrics from incident triangle planes
  std::vector<Quadric> Q(n_verts);
  auto tri_plane = [&](int64_t t, double out[4]) -> bool {
    const int64_t a = T[3 * t], b = T[3 * t + 1], c = T[3 * t + 2];
    const double ux = V[3 * b] - V[3 * a], uy = V[3 * b + 1] - V[3 * a + 1],
                 uz = V[3 * b + 2] - V[3 * a + 2];
    const double wx = V[3 * c] - V[3 * a], wy = V[3 * c + 1] - V[3 * a + 1],
                 wz = V[3 * c + 2] - V[3 * a + 2];
    double nx = uy * wz - uz * wy, ny = uz * wx - ux * wz,
           nz = ux * wy - uy * wx;
    const double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len < 1e-20) return false;
    nx /= len; ny /= len; nz /= len;
    out[0] = nx; out[1] = ny; out[2] = nz;
    out[3] = -(nx * V[3 * a] + ny * V[3 * a + 1] + nz * V[3 * a + 2]);
    return true;
  };
  for (int64_t t = 0; t < n_tris; ++t) {
    double p[4];
    if (!tri_plane(t, p)) continue;
    for (int e = 0; e < 3; ++e) Q[T[3 * t + e]].add_plane(p[0], p[1], p[2], p[3]);
  }

  // adjacency: triangles per vertex (updated through collapses via remap)
  std::vector<std::vector<int64_t>> vtris(n_verts);
  for (int64_t t = 0; t < n_tris; ++t)
    for (int e = 0; e < 3; ++e) vtris[T[3 * t + e]].push_back(t);

  std::vector<int64_t> remap(n_verts);
  for (int64_t v = 0; v < n_verts; ++v) remap[v] = v;
  std::function<int64_t(int64_t)> find = [&](int64_t v) -> int64_t {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };
  std::vector<bool> tri_dead(n_tris, false);

  // candidate heap: (cost, version_u, version_v, u, v, px, py, pz)
  struct Cand {
    double cost;
    int64_t u, v;
    uint32_t vu, vv;
    double p[3];
    bool operator<(const Cand& o) const { return cost > o.cost; }
  };
  std::vector<uint32_t> version(n_verts, 0);
  std::priority_queue<Cand> heap;

  auto push_edge = [&](int64_t u, int64_t v) {
    u = find(u); v = find(v);
    if (u == v) return;
    Quadric q = Q[u];
    q.add(Q[v]);
    // try endpoints + midpoint, keep the cheapest (robust, no 3x3 solve)
    const double cand[3][3] = {
        {V[3 * u], V[3 * u + 1], V[3 * u + 2]},
        {V[3 * v], V[3 * v + 1], V[3 * v + 2]},
        {0.5 * (V[3 * u] + V[3 * v]), 0.5 * (V[3 * u + 1] + V[3 * v + 1]),
         0.5 * (V[3 * u + 2] + V[3 * v + 2])}};
    int best = 0;
    double best_cost = 1e300;
    for (int i = 0; i < 3; ++i) {
      const double c = q.eval(cand[i]);
      if (c < best_cost) { best_cost = c; best = i; }
    }
    Cand cd{best_cost, u, v, version[u], version[v],
            {cand[best][0], cand[best][1], cand[best][2]}};
    heap.push(cd);
  };

  for (int64_t t = 0; t < n_tris; ++t)
    for (int e = 0; e < 3; ++e) push_edge(T[3 * t + e], T[3 * t + (e + 1) % 3]);

  const int64_t target_removed =
      static_cast<int64_t>(reduction * static_cast<double>(n_tris));
  int64_t removed = 0;

  auto tri_normal = [&](int64_t a, int64_t b, int64_t c, double n[3]) {
    const double ux = V[3 * b] - V[3 * a], uy = V[3 * b + 1] - V[3 * a + 1],
                 uz = V[3 * b + 2] - V[3 * a + 2];
    const double wx = V[3 * c] - V[3 * a], wy = V[3 * c + 1] - V[3 * a + 1],
                 wz = V[3 * c + 2] - V[3 * a + 2];
    n[0] = uy * wz - uz * wy;
    n[1] = uz * wx - ux * wz;
    n[2] = ux * wy - uy * wx;
  };

  while (removed < target_removed && !heap.empty()) {
    Cand cd = heap.top();
    heap.pop();
    const int64_t u = find(cd.u), v = find(cd.v);
    if (u == v || cd.vu != version[u] || cd.vv != version[v]) continue;

    // normal-flip guard: simulate moving u and v to p
    double saved_u[3] = {V[3 * u], V[3 * u + 1], V[3 * u + 2]};
    double saved_v[3] = {V[3 * v], V[3 * v + 1], V[3 * v + 2]};
    bool flip = false;
    for (int pass = 0; pass < 2 && !flip; ++pass) {
      const int64_t w0 = pass == 0 ? u : v, other = pass == 0 ? v : u;
      for (int64_t t : vtris[w0]) {
        if (tri_dead[t]) continue;
        int64_t a = find(T[3 * t]), b = find(T[3 * t + 1]),
                c = find(T[3 * t + 2]);
        if (a == b || b == c || a == c) continue;
        // triangles containing both endpoints die anyway
        if ((a == u || b == u || c == u) && (a == v || b == v || c == v))
          continue;
        double n_before[3], n_after[3];
        tri_normal(a, b, c, n_before);
        for (int d = 0; d < 3; ++d) {
          V[3 * u + d] = cd.p[d];
          V[3 * v + d] = cd.p[d];
        }
        tri_normal(a, b, c, n_after);
        for (int d = 0; d < 3; ++d) {
          V[3 * u + d] = saved_u[d];
          V[3 * v + d] = saved_v[d];
        }
        if (n_before[0] * n_after[0] + n_before[1] * n_after[1] +
                n_before[2] * n_after[2] < 0) {
          flip = true;
          break;
        }
        (void)other;
      }
    }
    if (flip) continue;

    // collapse v into u at position p
    for (int d = 0; d < 3; ++d) V[3 * u + d] = cd.p[d];
    Q[u].add(Q[v]);
    remap[v] = u;
    version[u]++;

    // merge triangle lists, kill degenerate triangles
    for (int64_t t : vtris[v]) vtris[u].push_back(t);
    vtris[v].clear();
    std::vector<int64_t> alive;
    alive.reserve(vtris[u].size());
    for (int64_t t : vtris[u]) {
      if (tri_dead[t]) continue;
      const int64_t a = find(T[3 * t]), b = find(T[3 * t + 1]),
                    c = find(T[3 * t + 2]);
      if (a == b || b == c || a == c) {
        tri_dead[t] = true;
        ++removed;
        continue;
      }
      alive.push_back(t);
    }
    vtris[u].swap(alive);

    // refresh candidate edges around u
    for (int64_t t : vtris[u]) {
      for (int e = 0; e < 3; ++e) {
        const int64_t a = find(T[3 * t + e]);
        const int64_t b = find(T[3 * t + (e + 1) % 3]);
        if (a == u || b == u) push_edge(a, b);
      }
    }
  }

  // compact the surviving mesh
  std::vector<int64_t> new_id(n_verts, -1);
  std::vector<float> out_v;
  std::vector<int64_t> out_t;
  for (int64_t t = 0; t < n_tris; ++t) {
    if (tri_dead[t]) continue;
    const int64_t a = find(T[3 * t]), b = find(T[3 * t + 1]),
                  c = find(T[3 * t + 2]);
    if (a == b || b == c || a == c) continue;
    for (int64_t vid : {a, b, c}) {
      if (new_id[vid] < 0) {
        new_id[vid] = static_cast<int64_t>(out_v.size() / 3);
        for (int d = 0; d < 3; ++d)
          out_v.push_back(static_cast<float>(V[3 * vid + d]));
      }
      out_t.push_back(new_id[vid]);
    }
  }

  auto* vbuf = static_cast<float*>(std::malloc(sizeof(float) * out_v.size()));
  std::memcpy(vbuf, out_v.data(), sizeof(float) * out_v.size());
  auto* tbuf =
      static_cast<int64_t*>(std::malloc(sizeof(int64_t) * out_t.size()));
  std::memcpy(tbuf, out_t.data(), sizeof(int64_t) * out_t.size());
  *verts_out = vbuf;
  *n_verts_out = static_cast<int64_t>(out_v.size() / 3);
  *tris_out = tbuf;
  return static_cast<int64_t>(out_t.size() / 3);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Multithreaded patch cropper for the training data loader: extracts a BATCH
// of margin patches from a cached channel-first volume, fusing the
// zero-pad + channel-last transpose + dtype cast (f32 or bf16 wire) that the
// Python path does in four single-threaded numpy passes. Host-side analogue
// of the reference's CacheDataset+RandCropByLabelClasses hot loop
// (reference: src/segmantic/seg/monai_unet.py:264-290).

namespace {

inline uint16_t f32_to_bf16(float v) {
  uint32_t bits;
  std::memcpy(&bits, &v, 4);
  // round-to-nearest-even on the truncated mantissa
  const uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
  return static_cast<uint16_t>((bits + rounding) >> 16);
}

}  // namespace

extern "C" {

// image: (C, S0, S1, S2) float32
// label: (S0, S1, S2) int32, or uint8 when lbl_u8 (labels < 256 either way —
//        uint8 input avoids the caller converting the WHOLE cached volume
//        to int32 on every batch)
// starts: (B, 3) int64 (may be out of bounds -> zero pad)
// img_out: (B, O0, O1, O2, C) float32 or bf16(uint16) when to_bf16
// lbl_out: (B, O0, O1, O2) uint8
void crop_patches_3d(const float* img, const void* lbl, int lbl_u8,
                     const int64_t* shape, int64_t channels,
                     const int64_t* starts, int64_t batch,
                     const int64_t* out_size, int to_bf16, void* img_out,
                     uint8_t* lbl_out) {
  const int64_t S0 = shape[0], S1 = shape[1], S2 = shape[2];
  const int64_t O0 = out_size[0], O1 = out_size[1], O2 = out_size[2];
  const int64_t vol = S0 * S1 * S2;
  const int64_t patch = O0 * O1 * O2;

  parallel_for(batch, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const int64_t z0 = starts[3 * b], y0 = starts[3 * b + 1],
                    x0 = starts[3 * b + 2];
      float* fo = static_cast<float*>(img_out) + b * patch * channels;
      uint16_t* ho = static_cast<uint16_t*>(img_out) + b * patch * channels;
      uint8_t* lo_out = lbl_out ? lbl_out + b * patch : nullptr;

      for (int64_t z = 0; z < O0; ++z) {
        const int64_t sz = z0 + z;
        const bool z_in = sz >= 0 && sz < S0;
        for (int64_t y = 0; y < O1; ++y) {
          const int64_t sy = y0 + y;
          const bool row_in = z_in && sy >= 0 && sy < S1;
          const int64_t row_base = (z * O1 + y) * O2;
          if (!row_in) {
            if (to_bf16)
              std::memset(ho + row_base * channels, 0,
                          sizeof(uint16_t) * O2 * channels);
            else
              std::memset(fo + row_base * channels, 0,
                          sizeof(float) * O2 * channels);
            if (lo_out) std::memset(lo_out + row_base, 0, O2);
            continue;
          }
          // in-bounds x-range [cx0, cx1)
          const int64_t cx0 = std::max<int64_t>(x0, 0);
          const int64_t cx1 = std::min<int64_t>(x0 + O2, S2);
          const int64_t d0 = cx0 - x0;            // leading pad
          const int64_t n = std::max<int64_t>(cx1 - cx0, 0);
          const int64_t src_row = (sz * S1 + sy) * S2;

          for (int64_t c = 0; c < channels; ++c) {
            const float* src = img + c * vol + src_row + cx0;
            if (to_bf16) {
              uint16_t* dst = ho + row_base * channels + c;
              for (int64_t x = 0; x < d0; ++x) dst[x * channels] = 0;
              for (int64_t x = 0; x < n; ++x)
                dst[(d0 + x) * channels] = f32_to_bf16(src[x]);
              for (int64_t x = d0 + n; x < O2; ++x) dst[x * channels] = 0;
            } else {
              float* dst = fo + row_base * channels + c;
              for (int64_t x = 0; x < d0; ++x) dst[x * channels] = 0.0f;
              for (int64_t x = 0; x < n; ++x) dst[(d0 + x) * channels] = src[x];
              for (int64_t x = d0 + n; x < O2; ++x) dst[x * channels] = 0.0f;
            }
          }
          if (lo_out) {
            uint8_t* ldst = lo_out + row_base;
            for (int64_t x = 0; x < d0; ++x) ldst[x] = 0;
            if (lbl_u8) {
              const uint8_t* lsrc =
                  static_cast<const uint8_t*>(lbl) + src_row + cx0;
              std::memcpy(ldst + d0, lsrc, static_cast<size_t>(n));
            } else {
              const int32_t* lsrc =
                  static_cast<const int32_t*>(lbl) + src_row + cx0;
              for (int64_t x = 0; x < n; ++x)
                ldst[d0 + x] = static_cast<uint8_t>(lsrc[x]);
            }
            for (int64_t x = d0 + n; x < O2; ++x) ldst[x] = 0;
          }
        }
      }
    }
  });
}

}  // extern "C"
