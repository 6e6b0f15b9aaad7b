// Native host preprocessing — the scan → training-data hot path, C-ABI.
//
// Replaces the Python implementation of geometry/preprocess.py for the LV
// family, whose ray-shortening pass is an inherently sequential O(hits²)
// recurrence (bgklvoctomap.cpp:368-386 semantics; documented in SURVEY.md).
// Exposed via ctypes as libla3dm_host.so; la3dm_tpu/geometry/native.py holds
// the wrapper and the pure-numpy fallback.
//
// Semantics notes (shared with the numpy path):
// * voxel-grid downsample: floor(p/leaf) per axis, double-accumulated
//   centroids, output sorted z-major lexicographically (PCL leaf order —
//   the order feeds the sequential shortening recurrence, so it matters).
// * beams shortened by ℓ√2; over-range beams kept at max_range; beams shrunk
//   where they pass within ℓ of other hits (double precision, hit order);
//   free-ray origins pushed ℓ from the sensor; short downward rays dropped.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct V3 { float x, y, z; };

void Downsample(const float* pts, int n, float leaf, std::vector<V3>* out) {
  struct Cell { int64_t k[3]; double s[3]; int n; };
  std::vector<Cell> cells;
  cells.reserve(n);
  // open-addressing hash on the voxel key
  const size_t cap = 1;
  (void)cap;
  struct KeyHash {
    size_t operator()(const int64_t* k) const {
      uint64_t h = (uint64_t)(k[0] * 73856093) ^ (uint64_t)(k[1] * 19349663) ^
                   (uint64_t)(k[2] * 83492791);
      h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
      return (size_t)h;
    }
  };
  size_t tsize = 1;
  while (tsize < (size_t)n * 2) tsize <<= 1;
  std::vector<int> table(tsize, -1);
  const float inv = 1.0f / leaf;
  KeyHash hasher;
  for (int i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    if (!std::isfinite(p[0]) || !std::isfinite(p[1]) || !std::isfinite(p[2])) continue;
    int64_t k[3] = {(int64_t)std::floor(p[0] * inv), (int64_t)std::floor(p[1] * inv),
                    (int64_t)std::floor(p[2] * inv)};
    size_t slot = hasher(k) & (tsize - 1);
    for (;;) {
      int c = table[slot];
      if (c < 0) {
        table[slot] = (int)cells.size();
        cells.push_back({{k[0], k[1], k[2]}, {p[0], p[1], p[2]}, 1});
        break;
      }
      Cell& cc = cells[c];
      if (cc.k[0] == k[0] && cc.k[1] == k[1] && cc.k[2] == k[2]) {
        cc.s[0] += p[0]; cc.s[1] += p[1]; cc.s[2] += p[2]; cc.n++;
        break;
      }
      slot = (slot + 1) & (tsize - 1);
    }
  }
  std::sort(cells.begin(), cells.end(), [](const Cell& a, const Cell& b) {
    if (a.k[2] != b.k[2]) return a.k[2] < b.k[2];
    if (a.k[1] != b.k[1]) return a.k[1] < b.k[1];
    return a.k[0] < b.k[0];
  });
  out->clear();
  out->reserve(cells.size());
  for (const auto& c : cells)
    out->push_back({(float)(c.s[0] / c.n), (float)(c.s[1] / c.n), (float)(c.s[2] / c.n)});
}

}  // namespace

extern "C" {

// LV training data (bgklvoctomap.cpp:303-423 semantics).
// Outputs: hits [<=n,3], rays [<=n,6] (free_origin, free_endpt),
// samples [<=max_samples,3] + sample_ray.  Returns 0 on success, -1 if an
// output buffer is too small.
int lv_training_data(const float* cloud, int n_cloud, const float* origin3,
                     float ds, float fr, float max_range, float ell,
                     float* hits_out, int* n_hits_out,
                     float* rays_out, int* n_rays_out,
                     float* samples_out, int32_t* sample_ray_out, int* n_samples_out,
                     int max_hits, int max_rays, int max_samples) {
  std::vector<V3> hits;
  Downsample(cloud, n_cloud, ds, &hits);
  const int H = (int)hits.size();
  const double offset = (double)ell * std::sqrt(2.0);
  const double influence = ell;
  const float ox = origin3[0], oy = origin3[1], oz = origin3[2];

  int nh = 0, nr = 0, ns = 0;

  // precompute per-hit range (double)
  std::vector<double> r0(H);
  for (int j = 0; j < H; ++j) {
    const double dx = (double)hits[j].x - ox, dy = (double)hits[j].y - oy,
                 dz = (double)hits[j].z - oz;
    r0[j] = std::sqrt(dx * dx + dy * dy + dz * dz);
  }

  for (int i = 0; i < H; ++i) {
    const V3 p = hits[i];
    double l = r0[i];
    const float nx = (float)((p.x - ox) / l), ny = (float)((p.y - oy) / l),
                nz = (float)((p.z - oz) / l);
    if (max_range > 0) {
      if (l < max_range) {
        if (nh >= max_hits) return -1;
        hits_out[3 * nh] = p.x; hits_out[3 * nh + 1] = p.y; hits_out[3 * nh + 2] = p.z;
        ++nh;
        const float lf = std::sqrt((p.x - ox) * (p.x - ox) + (p.y - oy) * (p.y - oy) +
                                   (p.z - oz) * (p.z - oz));
        l = (double)lf - offset;
      } else {
        l = (double)max_range - offset;
      }
    }
    double nearest_z = p.z;
    V3 endp{ox + nx * (float)l, oy + ny * (float)l, oz + nz * (float)l};
    const float lvx = endp.x - ox, lvy = endp.y - oy, lvz = endp.z - oz;
    const double lvsq = (double)lvx * lvx + (double)lvy * lvy + (double)lvz * lvz;
    const double lvn = std::sqrt(lvsq);
    // nearby filter + sequential shrinking, in hit order (:339-386)
    for (int j = 0; j < H; ++j) {
      const V3 q = hits[j];
      if (max_range > 0 && r0[j] > max_range) continue;
      if (p.z > offset + oz && q.z < oz + influence) continue;
      const double e1 = (double)endp.x - q.x, e2 = (double)endp.y - q.y,
                   e3 = (double)endp.z - q.z;
      const double d1 = std::sqrt(e1 * e1 + e2 * e2 + e3 * e3);
      if (!(d1 < influence || (d1 < l && r0[j] < l))) continue;
      const double b = ((double)q.x - ox) * lvx + ((double)q.y - oy) * lvy +
                       ((double)q.z - oz) * lvz;
      if (b > l * l) continue;
      const double cx = ox + lvx * (b / lvsq) - q.x;
      const double cy = oy + lvy * (b / lvsq) - q.y;
      const double cz = oz + lvz * (b / lvsq) - q.z;
      const double dist = std::sqrt(cx * cx + cy * cy + cz * cz);
      if (dist < influence) { nearest_z = q.z; l = b / lvn; }
    }
    if (l < max_range / 5.0 && l / (offset - nearest_z) > 0) continue;
    endp = {ox + nx * (float)l, oy + ny * (float)l, oz + nz * (float)l};
    V3 fo = (l > influence * 1.0)
        ? V3{ox + nx * (float)(influence * 1.0), oy + ny * (float)(influence * 1.0),
             oz + nz * (float)(influence * 1.0)}
        : endp;
    if (nr >= max_rays) return -1;
    const int ray = nr;
    rays_out[6 * nr] = fo.x; rays_out[6 * nr + 1] = fo.y; rays_out[6 * nr + 2] = fo.z;
    rays_out[6 * nr + 3] = endp.x; rays_out[6 * nr + 4] = endp.y; rays_out[6 * nr + 5] = endp.z;
    ++nr;
    if (ns >= max_samples) return -1;
    samples_out[3 * ns] = fo.x; samples_out[3 * ns + 1] = fo.y; samples_out[3 * ns + 2] = fo.z;
    sample_ray_out[ns] = ray;
    ++ns;
    // backward beam samples (beam_sample, :431-447): d = lb − k·fr > 0
    const float bx = endp.x - fo.x, by = endp.y - fo.y, bz = endp.z - fo.z;
    const float lb = std::sqrt(bx * bx + by * by + bz * bz);
    if (lb > 0) {
      const float mx = bx / lb, my = by / lb, mz = bz / lb;
      for (int k = 1;; ++k) {
        const float d = lb - (float)k * fr;
        if (!(d > 0.0f)) break;
        if (ns >= max_samples) return -1;
        samples_out[3 * ns] = fo.x + mx * d;
        samples_out[3 * ns + 1] = fo.y + my * d;
        samples_out[3 * ns + 2] = fo.z + mz * d;
        sample_ray_out[ns] = ray;
        ++ns;
      }
    }
  }
  *n_hits_out = nh;
  *n_rays_out = nr;
  *n_samples_out = ns;
  return 0;
}

// voxel-grid downsample (shared helper; out sorted z-major)
int voxel_downsample(const float* pts, int n, float leaf, float* out, int max_out) {
  std::vector<V3> o;
  Downsample(pts, n, leaf, &o);
  if ((int)o.size() > max_out) return -1;
  for (size_t i = 0; i < o.size(); ++i) {
    out[3 * i] = o[i].x; out[3 * i + 1] = o[i].y; out[3 * i + 2] = o[i].z;
  }
  return (int)o.size();
}

}  // extern "C"
