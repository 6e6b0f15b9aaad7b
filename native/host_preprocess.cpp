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
#include <utility>
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

struct BlockInc { int64_t key; int idx; };

inline int64_t PackKey(int64_t x, int64_t y, int64_t z) {
  return ((x + 524288) << 40) | ((y + 524288) << 20) | (z + 524288);
}

// Combo-major closed-box block incidences — the C++ twin of
// geometry/blocks.py::point_block_memberships (semantics notes at
// scan_bucket_tables below).  Appends to *out in the numpy path's order.
void CollectIncidences(const float* pts, int n, double block_size,
                       std::vector<BlockInc>* out) {
  const float bsf = (float)block_size;
  const double bsd = (double)bsf;  // numpy promotes the f32 block size
  const float half = (float)(bsd / 2.0);
  std::vector<int64_t> base(3 * (size_t)n);
  std::vector<uint8_t> mem(9 * (size_t)n);  // [i][axis][cand]
  for (int i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      const float p = pts[3 * i + ax];
      const int64_t b = (int64_t)std::floor((double)p / block_size + 0.5);
      base[3 * i + ax] = b;
      for (int c = 0; c < 3; ++c) {
        const float ctr = (float)((double)(b + c - 1) * bsd);
        mem[9 * i + 3 * ax + c] = (ctr - half <= p) && (p <= ctr + half);
      }
    }
  }
  out->reserve(out->size() + (size_t)n + n / 4);
  for (int cx = 0; cx < 3; ++cx)
    for (int cy = 0; cy < 3; ++cy)
      for (int cz = 0; cz < 3; ++cz)
        for (int i = 0; i < n; ++i) {
          if (mem[9 * i + cx] && mem[9 * i + 3 + cy] && mem[9 * i + 6 + cz])
            out->push_back({PackKey(base[3 * i] + cx - 1,
                                    base[3 * i + 1] + cy - 1,
                                    base[3 * i + 2] + cz - 1), i});
        }
}

}  // namespace

extern "C" {

// LV training data (bgklvoctomap.cpp:303-423 semantics).
// Outputs: hits [<=n,3], rays [<=n,6] (free_origin, free_endpt),
// samples [<=max_samples,3] + sample_ray; bbox6_out = (min3, max3) over
// hits ∪ samples — the R-tree extent driving the candidate block sweep
// (bgkloctomap.cpp:409-418), computed here to spare a host pass over the
// ~100k-row sample table.  Returns 0 on success, -1 if an output buffer is
// too small.
int lv_training_data(const float* cloud, int n_cloud, const float* origin3,
                     float ds, float fr, float max_range, float ell,
                     float* hits_out, int* n_hits_out,
                     float* rays_out, int* n_rays_out,
                     float* samples_out, int32_t* sample_ray_out, int* n_samples_out,
                     int max_hits, int max_rays, int max_samples,
                     float* bbox6_out) {
  std::vector<V3> hits;
  Downsample(cloud, n_cloud, ds, &hits);
  const int H = (int)hits.size();
  const double offset = (double)ell * std::sqrt(2.0);
  const double influence = ell;
  const float ox = origin3[0], oy = origin3[1], oz = origin3[2];

  int nh = 0, nr = 0, ns = 0;

  // precompute per-hit sensor-relative deltas and range (double)
  std::vector<double> r0(H), dxo(H), dyo(H), dzo(H);
  for (int j = 0; j < H; ++j) {
    const double dx = (double)hits[j].x - ox, dy = (double)hits[j].y - oy,
                 dz = (double)hits[j].z - oz;
    dxo[j] = dx; dyo[j] = dy; dzo[j] = dz;
    r0[j] = std::sqrt(dx * dx + dy * dy + dz * dz);
  }
  const double infsq = influence * influence;
  std::vector<int> cand;
  cand.reserve(64);
  std::vector<uint8_t> cmask(H);

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
    // nearby filter + sequential shrinking, in hit order (:339-386).
    // Two passes: a branch-light vectorizable SUPERSET filter — the exact
    // update below requires perpendicular-to-line distance < ℓ, a property
    // of the fixed ray line, invariant under the shrinking l — then the
    // EXACT reference-order sequential loop over the few candidates.  (No
    // projection-based filter: l's ulp drift via the float endpoint makes
    // any b-bound fragile; perp alone prunes ~99% of pairs.)  All
    // comparisons on squared distances (sqrt is monotone) — the O(hits²)
    // full loop dominated preprocessing cost.
    const bool high_ray = p.z > offset + oz;
    const double zcut = oz + influence;
    const double inf_margin = infsq * (1.0 + 1e-9) + 1e-12;  // fp-safe superset
    // branchless mask pass (auto-vectorizes), then index collection
    const double thr = inf_margin * lvsq;
    for (int j = 0; j < H; ++j) {
      const double b = dxo[j] * lvx + dyo[j] * lvy + dzo[j] * lvz;
      // perp² < margin ⇔ r0²·lvsq − b² < margin·lvsq (lvsq > 0)
      cmask[j] = (r0[j] * r0[j] * lvsq - b * b) < thr;
    }
    cand.clear();
    for (int j = 0; j < H; ++j)
      if (cmask[j]) cand.push_back(j);
    for (int cj = 0; cj < (int)cand.size(); ++cj) {
      const int j = cand[cj];
      if (max_range > 0 && r0[j] > max_range) continue;
      if (high_ray && (double)hits[j].z < zcut) continue;
      const double e1 = (double)endp.x - hits[j].x, e2 = (double)endp.y - hits[j].y,
                   e3 = (double)endp.z - hits[j].z;
      const double d1sq = e1 * e1 + e2 * e2 + e3 * e3;
      if (!(d1sq < infsq || (d1sq < l * l && r0[j] < l))) continue;
      const double b = dxo[j] * lvx + dyo[j] * lvy + dzo[j] * lvz;
      if (b > l * l) continue;
      const double s = b / lvsq;
      const double cx = lvx * s - dxo[j];
      const double cy = lvy * s - dyo[j];
      const double cz = lvz * s - dzo[j];
      if (cx * cx + cy * cy + cz * cz < infsq) { nearest_z = hits[j].z; l = b / lvn; }
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
  if (bbox6_out) {
    float mn[3] = {0, 0, 0}, mx[3] = {0, 0, 0};
    bool any = false;
    auto fold = [&](const float* p, int cnt, int stride) {
      for (int i = 0; i < cnt; ++i) {
        const float* q = p + stride * i;
        if (!any) { for (int a = 0; a < 3; ++a) { mn[a] = q[a]; mx[a] = q[a]; } any = true; }
        else {
          for (int a = 0; a < 3; ++a) {
            if (q[a] < mn[a]) mn[a] = q[a];
            if (q[a] > mx[a]) mx[a] = q[a];
          }
        }
      }
    };
    fold(hits_out, nh, 3);
    fold(samples_out, ns, 3);
    for (int a = 0; a < 3; ++a) { bbox6_out[a] = mn[a]; bbox6_out[3 + a] = mx[a]; }
  }
  return 0;
}

// LV tile tables: halo-expanded tile memberships of hits and ray samples,
// grouped per tile.  Replaces the numpy _halo_blocks + lexsort-dedup +
// per-tile segment build (la3dm_tpu/models/bgklv.py) — the host-side cost
// driver of LV scan integration.
//
// Tile coord of point p: floor((p + shift ± halo)/ts) per axis, all in
// double (matches the python grid exactly).  Keys pack like the reference
// BlockHashKey (bgkblock.cpp:73-77): (c+524288) 20 bits per axis.
//
// Outputs, for the union of hit/ray tiles (sorted by key):
//   tile_keys [Ta]; h_start/h_count and r_start/r_count [Ta] segments into
//   hits_flat (hit indices) and rays_flat (deduplicated ray ids).
int lv_tile_tables(const float* hits, int H,
                   const float* samples, const int32_t* sample_ray, int S,
                   double ts, double halo, double shift,
                   int64_t* tile_keys, int32_t* h_start, int32_t* h_count,
                   int32_t* r_start, int32_t* r_count,
                   int32_t* hits_flat, int32_t* rays_flat,
                   int max_tiles, int max_hits_flat, int max_rays_flat,
                   int* n_tiles, int* n_hits_flat, int* n_rays_flat) {
  auto key_of = [](int64_t x, int64_t y, int64_t z) {
    return ((x + 524288) << 40) | ((y + 524288) << 20) | (z + 524288);
  };
  auto cells_of = [&](const float* p, std::vector<std::pair<int64_t, int32_t>>* out,
                      int32_t payload) {
    int64_t lo[3], hi[3];
    for (int ax = 0; ax < 3; ++ax) {
      const double v = (double)p[ax] + shift;
      lo[ax] = (int64_t)std::floor((v - halo) / ts);
      hi[ax] = (int64_t)std::floor((v + halo) / ts);
    }
    for (int64_t x = lo[0]; x <= hi[0]; ++x)
      for (int64_t y = lo[1]; y <= hi[1]; ++y)
        for (int64_t z = lo[2]; z <= hi[2]; ++z)
          out->emplace_back(key_of(x, y, z), payload);
  };

  std::vector<std::pair<int64_t, int32_t>> hp, rp;
  hp.reserve((size_t)H * 2);
  rp.reserve((size_t)S * 2);
  for (int i = 0; i < H; ++i) cells_of(hits + 3 * i, &hp, i);
  for (int i = 0; i < S; ++i) cells_of(samples + 3 * i, &rp, sample_ray[i]);
  std::sort(hp.begin(), hp.end());
  std::sort(rp.begin(), rp.end());
  rp.erase(std::unique(rp.begin(), rp.end()), rp.end());  // (tile, ray) dedup

  // merge the two sorted key streams into the active-tile table
  size_t ih = 0, ir = 0;
  int ta = 0, nh = 0, nr = 0;
  while (ih < hp.size() || ir < rp.size()) {
    int64_t k;
    if (ih >= hp.size()) k = rp[ir].first;
    else if (ir >= rp.size()) k = hp[ih].first;
    else k = std::min(hp[ih].first, rp[ir].first);
    if (ta >= max_tiles) return -1;
    tile_keys[ta] = k;
    h_start[ta] = nh;
    while (ih < hp.size() && hp[ih].first == k) {
      if (nh >= max_hits_flat) return -1;
      hits_flat[nh++] = hp[ih++].second;
    }
    h_count[ta] = nh - h_start[ta];
    r_start[ta] = nr;
    while (ir < rp.size() && rp[ir].first == k) {
      if (nr >= max_rays_flat) return -1;
      rays_flat[nr++] = rp[ir++].second;
    }
    r_count[ta] = nr - r_start[ta];
    ++ta;
  }
  *n_tiles = ta;
  *n_hits_flat = nh;
  *n_rays_flat = nr;
  return 0;
}

// LV tile tables from ray SEGMENTS (no proxy-sample materialization).
//
// The device kernel re-tests exact per-voxel membership (interval arithmetic
// over the beam's sample grid — la3dm_tpu/models/bgklv.py::_ray_membership),
// so the host table only has to be a SUPERSET of the sample-based candidate
// set.  Every proxy sample lies on its ray segment, hence the union of
// halo-expanded tile boxes touched by the segment covers them all; a tiny
// halo inflation (+1e-5) absorbs float32 sample-vs-double-segment roundoff.
//
// Per ray: event-walk the box [floor((p−halo')/ts), floor((p+halo')/ts)] as p
// moves a→b.  Per axis the bounds move monotonically, so each tile enters the
// box at most once — cells are emitted exactly once (initial box, then the
// new 1-cell-thick slab at each leading-bound crossing).  ~50 emissions per
// ray instead of ~300 sample-expansion pairs, and no (tile, ray) dedup pass.
int lv_tile_tables_ray(const float* hits, int H,
                       const float* rays, int R,
                       double ts, double halo, double shift,
                       int64_t* tile_keys, int32_t* h_start, int32_t* h_count,
                       int32_t* r_start, int32_t* r_count,
                       int32_t* hits_flat, int32_t* rays_flat,
                       int max_tiles, int max_hits_flat, int max_rays_flat,
                       int* n_tiles, int* n_hits_flat, int* n_rays_flat) {
  auto key_of = [](int64_t x, int64_t y, int64_t z) {
    return ((x + 524288) << 40) | ((y + 524288) << 20) | (z + 524288);
  };
  const double halo_e = halo + 1e-5;

  std::vector<std::pair<int64_t, int32_t>> hp, rp;
  hp.reserve((size_t)H * 8);
  rp.reserve((size_t)R * 64);
  for (int i = 0; i < H; ++i) {
    const float* p = hits + 3 * i;
    int64_t lo[3], hi[3];
    for (int ax = 0; ax < 3; ++ax) {
      const double v = (double)p[ax] + shift;
      lo[ax] = (int64_t)std::floor((v - halo) / ts);
      hi[ax] = (int64_t)std::floor((v + halo) / ts);
    }
    for (int64_t x = lo[0]; x <= hi[0]; ++x)
      for (int64_t y = lo[1]; y <= hi[1]; ++y)
        for (int64_t z = lo[2]; z <= hi[2]; ++z)
          hp.emplace_back(key_of(x, y, z), i);
  }

  for (int i = 0; i < R; ++i) {
    const float* s = rays + 6 * i;
    double a[3], d[3];
    for (int ax = 0; ax < 3; ++ax) {
      a[ax] = (double)s[ax] + shift;
      d[ax] = (double)s[ax + 3] - (double)s[ax];
    }
    // current box bounds at t=0 and the leading-bound crossing schedule
    int64_t lo[3], hi[3];
    double next_t[3];   // t of the next leading-bound crossing per axis
    double step_t[3];   // t between crossings
    for (int ax = 0; ax < 3; ++ax) {
      lo[ax] = (int64_t)std::floor((a[ax] - halo_e) / ts);
      hi[ax] = (int64_t)std::floor((a[ax] + halo_e) / ts);
      if (d[ax] > 0) {
        // hi grows: crossing when a+halo'+d·t reaches (hi+1)·ts
        next_t[ax] = ((double)(hi[ax] + 1) * ts - (a[ax] + halo_e)) / d[ax];
        step_t[ax] = ts / d[ax];
      } else if (d[ax] < 0) {
        // lo shrinks: crossing when a−halo'+d·t reaches lo·ts
        next_t[ax] = ((double)lo[ax] * ts - (a[ax] - halo_e)) / d[ax];
        step_t[ax] = ts / -d[ax];
      } else {
        next_t[ax] = 2.0;  // never
        step_t[ax] = 0.0;
      }
    }
    // initial box
    for (int64_t x = lo[0]; x <= hi[0]; ++x)
      for (int64_t y = lo[1]; y <= hi[1]; ++y)
        for (int64_t z = lo[2]; z <= hi[2]; ++z)
          rp.emplace_back(key_of(x, y, z), i);
    // walk events in t order; at each, advance one axis's leading bound and
    // emit the newly included slab; advance the trailing bound lazily (it
    // only shrinks the box — no new cells)
    for (;;) {
      int ax = 0;
      if (next_t[1] < next_t[ax]) ax = 1;
      if (next_t[2] < next_t[ax]) ax = 2;
      const double t = next_t[ax];
      if (t > 1.0) break;
      int64_t slab;
      if (d[ax] > 0) slab = ++hi[ax];
      else slab = --lo[ax];
      // trailing bounds of the OTHER axes at time t (shrink lazily so the
      // emitted slab never includes cells already out of the box)
      int64_t olo[3], ohi[3];
      for (int o = 0; o < 3; ++o) {
        olo[o] = lo[o]; ohi[o] = hi[o];
        if (o == ax) continue;
        const double p_o = a[o] + d[o] * t;
        if (d[o] > 0) {
          int64_t l2 = (int64_t)std::floor((p_o - halo_e) / ts);
          if (l2 > olo[o]) olo[o] = l2;
        } else if (d[o] < 0) {
          int64_t h2 = (int64_t)std::floor((p_o + halo_e) / ts);
          if (h2 < ohi[o]) ohi[o] = h2;
        }
      }
      olo[ax] = ohi[ax] = slab;
      for (int64_t x = olo[0]; x <= ohi[0]; ++x)
        for (int64_t y = olo[1]; y <= ohi[1]; ++y)
          for (int64_t z = olo[2]; z <= ohi[2]; ++z)
            rp.emplace_back(key_of(x, y, z), i);
      next_t[ax] += step_t[ax];
    }
  }

  std::sort(hp.begin(), hp.end());
  std::sort(rp.begin(), rp.end());
  rp.erase(std::unique(rp.begin(), rp.end()), rp.end());  // safety: FP twins

  size_t ih = 0, ir = 0;
  int ta = 0, nh = 0, nr = 0;
  while (ih < hp.size() || ir < rp.size()) {
    int64_t k;
    if (ih >= hp.size()) k = rp[ir].first;
    else if (ir >= rp.size()) k = hp[ih].first;
    else k = std::min(hp[ih].first, rp[ir].first);
    if (ta >= max_tiles) return -1;
    tile_keys[ta] = k;
    h_start[ta] = nh;
    while (ih < hp.size() && hp[ih].first == k) {
      if (nh >= max_hits_flat) return -1;
      hits_flat[nh++] = hp[ih++].second;
    }
    h_count[ta] = nh - h_start[ta];
    r_start[ta] = nr;
    while (ir < rp.size() && rp[ir].first == k) {
      if (nr >= max_rays_flat) return -1;
      rays_flat[nr++] = rp[ir++].second;
    }
    r_count[ta] = nr - r_start[ta];
    ++ta;
  }
  *n_tiles = ta;
  *n_hits_flat = nh;
  *n_rays_flat = nr;
  return 0;
}

// BGK/GP training data (bgkoctomap.cpp:383-458 semantics, shared with the
// numpy path in geometry/preprocess.py::bgk_training_data).
//
// hits = voxel-downsampled cloud, max-range filtered (double-precision norm,
// :394-397).  frees = downsample of [origin ×H] ++ per-beam forward samples
// d = fr, 2fr, … < l plus one sample at l − fr when l > fr (:433-458); the
// accumulation order matches numpy's (insertion order within each voxel
// cell), so centroids agree to f64 rounding.  Labels are assembled by the
// Python wrapper.  Returns 0, or -1 if an output buffer is too small.
int bgk_training_data(const float* cloud, int n_cloud, const float* origin3,
                      float ds, float fr, float max_range,
                      float* hits_out, int* n_hits_out,
                      float* frees_out, int* n_frees_out,
                      int max_hits, int max_frees) {
  std::vector<V3> hits;
  if (ds < 0) {
    hits.reserve(n_cloud);
    for (int i = 0; i < n_cloud; ++i)
      hits.push_back({cloud[3 * i], cloud[3 * i + 1], cloud[3 * i + 2]});
  } else {
    Downsample(cloud, n_cloud, ds, &hits);
  }
  const double ox = origin3[0], oy = origin3[1], oz = origin3[2];
  const float oxf = origin3[0], oyf = origin3[1], ozf = origin3[2];

  // max-range filter (double)
  int nh = 0;
  for (const V3& p : hits) {
    if (max_range > 0) {
      const double dx = (double)p.x - ox, dy = (double)p.y - oy, dz = (double)p.z - oz;
      if (std::sqrt(dx * dx + dy * dy + dz * dz) > (double)max_range) continue;
    }
    if (nh >= max_hits) return -1;
    hits_out[3 * nh] = p.x; hits_out[3 * nh + 1] = p.y; hits_out[3 * nh + 2] = p.z;
    ++nh;
  }

  // frees cloud: the origin once per hit (bgkoctomap.cpp:404), then per-beam
  // forward samples (k·fr < l) plus the extra sample at l − fr
  std::vector<V3> frees;
  frees.reserve((size_t)nh * 8 + nh);
  for (int i = 0; i < nh; ++i) frees.push_back({oxf, oyf, ozf});
  for (int i = 0; i < nh; ++i) {
    const float px = hits_out[3 * i], py = hits_out[3 * i + 1], pz = hits_out[3 * i + 2];
    // float32 arithmetic to mirror numpy's beam_free_points exactly
    const float dx = px - oxf, dy = py - oyf, dz = pz - ozf;
    const float l = std::sqrt(dx * dx + dy * dy + dz * dz);
    const float nx = dx / l, ny = dy / l, nz = dz / l;
    for (int k = 1;; ++k) {
      const float d = (float)k * fr;
      if (!(d < l)) break;
      frees.push_back({oxf + nx * d, oyf + ny * d, ozf + nz * d});
    }
    if (l > fr) {
      const float d = l - fr;
      frees.push_back({oxf + nx * d, oyf + ny * d, ozf + nz * d});
    }
  }
  std::vector<V3> frees_ds;
  if (ds < 0) {
    frees_ds = frees;
  } else {
    Downsample((const float*)frees.data(), (int)frees.size(), ds, &frees_ds);
  }
  if ((int)frees_ds.size() > max_frees) return -1;
  for (size_t i = 0; i < frees_ds.size(); ++i) {
    frees_out[3 * i] = frees_ds[i].x;
    frees_out[3 * i + 1] = frees_ds[i].y;
    frees_out[3 * i + 2] = frees_ds[i].z;
  }
  *n_hits_out = nh;
  *n_frees_out = (int)frees_ds.size();
  return 0;
}

// BGKL training data (bgkloctomap.cpp:285-344 semantics, shared with
// geometry/preprocess.py::bgkl_training_data).  Per in-range hit: the
// endpoint recomputed as origin + n·l in float32 (:316), a free ray
// (origin, origin + n·(l−fr)) (:335-338), and the ray's R-tree proxy
// samples: the origin (:328) plus BACKWARD beam samples d = l−k·fr > 0
// (:325, beam order matches numpy: all origins first, then per-beam
// samples — downstream dedup/grouping is order-insensitive).
int bgkl_training_data(const float* cloud, int n_cloud, const float* origin3,
                       float ds, float fr, float max_range,
                       float* hits_out, int* n_hits_out,
                       float* rays_out, int* n_rays_out,
                       float* samples_out, int32_t* sample_ray_out, int* n_samples_out,
                       int max_hits, int max_rays, int max_samples) {
  std::vector<V3> hits;
  if (ds < 0) {
    hits.reserve(n_cloud);
    for (int i = 0; i < n_cloud; ++i)
      hits.push_back({cloud[3 * i], cloud[3 * i + 1], cloud[3 * i + 2]});
  } else {
    Downsample(cloud, n_cloud, ds, &hits);
  }
  const double ox = origin3[0], oy = origin3[1], oz = origin3[2];
  const float oxf = origin3[0], oyf = origin3[1], ozf = origin3[2];

  int nh = 0;
  for (const V3& p : hits) {
    if (max_range > 0) {
      const double dx = (double)p.x - ox, dy = (double)p.y - oy, dz = (double)p.z - oz;
      if (std::sqrt(dx * dx + dy * dy + dz * dz) > (double)max_range) continue;
    }
    if (nh >= max_hits || nh >= max_rays) return -1;
    // float32 recompute of the endpoint (numpy: occ = origin + n·l)
    const float dxf = p.x - oxf, dyf = p.y - oyf, dzf = p.z - ozf;
    float l = std::sqrt(dxf * dxf + dyf * dyf + dzf * dzf);
    const float lm = l > 1e-30f ? l : 1e-30f;
    const float nx = dxf / lm, ny = dyf / lm, nz = dzf / lm;
    hits_out[3 * nh] = oxf + nx * l;
    hits_out[3 * nh + 1] = oyf + ny * l;
    hits_out[3 * nh + 2] = ozf + nz * l;
    const float le = l - fr;
    rays_out[6 * nh] = oxf; rays_out[6 * nh + 1] = oyf; rays_out[6 * nh + 2] = ozf;
    rays_out[6 * nh + 3] = oxf + nx * le;
    rays_out[6 * nh + 4] = oyf + ny * le;
    rays_out[6 * nh + 5] = ozf + nz * le;
    ++nh;
  }
  int ns = 0;
  for (int i = 0; i < nh; ++i) {  // ray origins (bgkloctomap.cpp:328)
    if (ns >= max_samples) return -1;
    samples_out[3 * ns] = oxf; samples_out[3 * ns + 1] = oyf; samples_out[3 * ns + 2] = ozf;
    sample_ray_out[ns++] = i;
  }
  for (int i = 0; i < nh; ++i) {  // backward beam samples over the OCC endpoint
    const float px = hits_out[3 * i], py = hits_out[3 * i + 1], pz = hits_out[3 * i + 2];
    const float dx = px - oxf, dy = py - oyf, dz = pz - ozf;
    const float l = std::sqrt(dx * dx + dy * dy + dz * dz);
    const float nx = dx / l, ny = dy / l, nz = dz / l;
    for (int k = 1;; ++k) {
      const float d = l - (float)k * fr;
      if (!(d > 0.0f)) break;
      if (ns >= max_samples) return -1;
      samples_out[3 * ns] = oxf + nx * d;
      samples_out[3 * ns + 1] = oyf + ny * d;
      samples_out[3 * ns + 2] = ozf + nz * d;
      sample_ray_out[ns++] = i;
    }
  }
  *n_hits_out = nh;
  *n_rays_out = nh;
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

// Block bucketing for the point families (BGK/GP) — the fused equivalent of
// geometry/blocks.py::point_block_memberships + models/bucketing.py
// (group_by_block, test_blocks_for, bucket_tables) and gp.py::_model_tables'
// neighbor-row table.  Semantics mirror the numpy path bit-for-bit:
// * base block index: floor(p_f64 / block_size_f64 + 0.5)   (f64, like
//   point_to_block_coord / reference bgkblock.cpp:73-77)
// * closed-box membership of candidates base-1..base+1 per axis, bounds in
//   float32: ctr = (float)(cand * (double)(float)block_size), half =
//   (float)((double)(float)block_size / 2) — a point on a face plane
//   belongs to both adjacent blocks (rtree.h Overlap semantics)
// * incidences emitted combo-major then stable-sorted by packed key, so the
//   within-block entry order matches numpy's concatenate+argsort(stable)
// * test blocks: sorted unique of (entry blocks + neighbor offsets); the
//   (test, slot) segment table indexes the sorted entry array
// * nb_t[m][g]: row in test blocks of (model block − offset[g]) (gp.py)
// Returns 0, or -1 if an output buffer is too small.
int scan_bucket_tables(
    const float* pts, const float* labels, int n, double block_size,
    const int64_t* nb_off, int G,
    float* ent_out, float* lab_out, int* n_ent_out,
    int64_t* model_coords_out, int* model_starts_out, int* model_counts_out,
    int* nb_t_out, int* n_models_out,
    int64_t* test_coords_out, int* test_starts_out, int* test_counts_out,
    int* n_test_out, int max_ent, int max_models, int max_test) {
  std::vector<BlockInc> inc;
  CollectIncidences(pts, n, block_size, &inc);
  std::stable_sort(inc.begin(), inc.end(),
                   [](const BlockInc& a, const BlockInc& b) { return a.key < b.key; });
  const int M = (int)inc.size();
  if (M > max_ent) return -1;
  for (int j = 0; j < M; ++j) {
    const int i = inc[j].idx;
    ent_out[3 * j] = pts[3 * i]; ent_out[3 * j + 1] = pts[3 * i + 1];
    ent_out[3 * j + 2] = pts[3 * i + 2];
    lab_out[j] = labels[i];
  }
  *n_ent_out = M;

  // unique entry blocks (models) with segment starts/counts
  std::vector<int64_t> ukeys;
  ukeys.reserve(M / 2 + 1);
  int n_models = 0;
  for (int j = 0; j < M; ++j) {
    if (j == 0 || inc[j].key != inc[j - 1].key) {
      if (n_models >= max_models) return -1;
      ukeys.push_back(inc[j].key);
      model_starts_out[n_models] = j;
      model_counts_out[n_models] = 1;
      const int64_t k = inc[j].key;
      model_coords_out[3 * n_models] = (k >> 40) - 524288;
      model_coords_out[3 * n_models + 1] = ((k >> 20) & 0xFFFFF) - 524288;
      model_coords_out[3 * n_models + 2] = (k & 0xFFFFF) - 524288;
      ++n_models;
    } else {
      model_counts_out[n_models - 1]++;
    }
  }
  *n_models_out = n_models;

  // test blocks: sorted unique of (model coords + offsets)
  std::vector<int64_t> tkeys;
  tkeys.reserve((size_t)n_models * G);
  for (int m = 0; m < n_models; ++m)
    for (int g = 0; g < G; ++g)
      tkeys.push_back(PackKey(model_coords_out[3 * m] + nb_off[3 * g],
                           model_coords_out[3 * m + 1] + nb_off[3 * g + 1],
                           model_coords_out[3 * m + 2] + nb_off[3 * g + 2]));
  std::sort(tkeys.begin(), tkeys.end());
  tkeys.erase(std::unique(tkeys.begin(), tkeys.end()), tkeys.end());
  const int B = (int)tkeys.size();
  if (B > max_test) return -1;
  for (int t = 0; t < B; ++t) {
    const int64_t k = tkeys[t];
    const int64_t x = (k >> 40) - 524288, y = ((k >> 20) & 0xFFFFF) - 524288,
                  z = (k & 0xFFFFF) - 524288;
    test_coords_out[3 * t] = x; test_coords_out[3 * t + 1] = y;
    test_coords_out[3 * t + 2] = z;
    for (int g = 0; g < G; ++g) {
      const int64_t q = PackKey(x + nb_off[3 * g], y + nb_off[3 * g + 1],
                             z + nb_off[3 * g + 2]);
      auto it = std::lower_bound(ukeys.begin(), ukeys.end(), q);
      if (it != ukeys.end() && *it == q) {
        const int m = (int)(it - ukeys.begin());
        test_starts_out[(size_t)t * G + g] = model_starts_out[m];
        test_counts_out[(size_t)t * G + g] = model_counts_out[m];
      } else {
        test_starts_out[(size_t)t * G + g] = 0;
        test_counts_out[(size_t)t * G + g] = 0;
      }
    }
  }
  *n_test_out = B;

  // nb_t: model m serves test block (model − offset[g]) at slot g (gp.py)
  for (int m = 0; m < n_models; ++m)
    for (int g = 0; g < G; ++g) {
      const int64_t q = PackKey(model_coords_out[3 * m] - nb_off[3 * g],
                             model_coords_out[3 * m + 1] - nb_off[3 * g + 1],
                             model_coords_out[3 * m + 2] - nb_off[3 * g + 2]);
      auto it = std::lower_bound(tkeys.begin(), tkeys.end(), q);
      // always present: the test set is models + offsets and offsets are
      // symmetric (face neighbors ± and 0); guard anyway
      nb_t_out[(size_t)m * G + g] =
          (it != tkeys.end() && *it == q) ? (int)(it - tkeys.begin()) : B;
    }
  return 0;
}

// BGKL bucketing — the fused equivalent of
// models/bgkl.py::segment_block_entries + models/bucketing.py::bucket_tables.
// Hits enter their member blocks as degenerate segments (start == end);
// each free ray enters a block once iff ≥1 of its R-tree proxy samples lies
// in the block's closed box (per-block ray dedup, bgkloctomap.cpp:145-172).
// Entry order within a block matches the numpy path: hit incidences
// (combo-major) first, then rays sorted by (block, ray id).
// Returns 0, or -1 if an output buffer is too small.
int bgkl_scan_tables(
    const float* hits, int H, const float* rays, int R,
    const float* samples, const int* sample_ray, int S,
    double block_size, const int64_t* nb_off, int G,
    float* ent_out, float* lab_out, int* n_ent_out,
    int64_t* test_coords_out, int* test_starts_out, int* test_counts_out,
    int* n_test_out, int max_ent, int max_test) {
  std::vector<BlockInc> inc;
  CollectIncidences(hits, H, block_size, &inc);
  const size_t n_hit_inc = inc.size();

  std::vector<BlockInc> sinc;
  CollectIncidences(samples, S, block_size, &sinc);
  std::vector<std::pair<int64_t, int>> pairs;
  pairs.reserve(sinc.size());
  for (const BlockInc& e : sinc)
    pairs.push_back({e.key, sample_ray[e.idx]});
  std::sort(pairs.begin(), pairs.end());
  pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
  for (const auto& pr : pairs)
    inc.push_back({pr.first, H + pr.second});  // idx ≥ H ⇒ ray id idx − H
  std::stable_sort(inc.begin() + 0, inc.end(),
                   [](const BlockInc& a, const BlockInc& b) { return a.key < b.key; });

  const int M = (int)inc.size();
  if (M > max_ent) return -1;
  for (int j = 0; j < M; ++j) {
    const int i = inc[j].idx;
    if (i < H) {
      for (int ax = 0; ax < 3; ++ax) {
        ent_out[6 * j + ax] = hits[3 * i + ax];
        ent_out[6 * j + 3 + ax] = hits[3 * i + ax];
      }
      lab_out[j] = 1.0f;
    } else {
      for (int ax = 0; ax < 6; ++ax)
        ent_out[6 * j + ax] = rays[6 * (i - H) + ax];
      lab_out[j] = 0.0f;
    }
  }
  *n_ent_out = M;

  // unique entry blocks with segment starts/counts (local scratch)
  std::vector<int64_t> ukeys;
  std::vector<int> ustart, ucount;
  for (int j = 0; j < M; ++j) {
    if (j == 0 || inc[j].key != inc[j - 1].key) {
      ukeys.push_back(inc[j].key);
      ustart.push_back(j);
      ucount.push_back(1);
    } else {
      ucount.back()++;
    }
  }

  // test blocks: sorted unique of (entry blocks + offsets)
  std::vector<int64_t> tkeys;
  tkeys.reserve(ukeys.size() * (size_t)G);
  for (int64_t k : ukeys) {
    const int64_t x = (k >> 40) - 524288, y = ((k >> 20) & 0xFFFFF) - 524288,
                  z = (k & 0xFFFFF) - 524288;
    for (int g = 0; g < G; ++g)
      tkeys.push_back(PackKey(x + nb_off[3 * g], y + nb_off[3 * g + 1],
                              z + nb_off[3 * g + 2]));
  }
  std::sort(tkeys.begin(), tkeys.end());
  tkeys.erase(std::unique(tkeys.begin(), tkeys.end()), tkeys.end());
  const int B = (int)tkeys.size();
  if (B > max_test) return -1;
  for (int t = 0; t < B; ++t) {
    const int64_t k = tkeys[t];
    const int64_t x = (k >> 40) - 524288, y = ((k >> 20) & 0xFFFFF) - 524288,
                  z = (k & 0xFFFFF) - 524288;
    test_coords_out[3 * t] = x; test_coords_out[3 * t + 1] = y;
    test_coords_out[3 * t + 2] = z;
    for (int g = 0; g < G; ++g) {
      const int64_t q = PackKey(x + nb_off[3 * g], y + nb_off[3 * g + 1],
                                z + nb_off[3 * g + 2]);
      auto it = std::lower_bound(ukeys.begin(), ukeys.end(), q);
      if (it != ukeys.end() && *it == q) {
        const int m = (int)(it - ukeys.begin());
        test_starts_out[(size_t)t * G + g] = ustart[m];
        test_counts_out[(size_t)t * G + g] = ucount[m];
      } else {
        test_starts_out[(size_t)t * G + g] = 0;
        test_counts_out[(size_t)t * G + g] = 0;
      }
    }
  }
  *n_test_out = B;
  return 0;
}

// Fixed-width entry-row tables for the BGK-family row engine — the fused
// equivalent of models/bgk.py::_row_tables.  For each test block, its G
// neighbor segments are concatenated in slot order into the merged id table
// (ids into the sorted entry array, with the slot id carried for per-model
// k̄ gating), then cut into rows of W ids.  Returns 0 or -1 (buffer).
int row_tables(const int* starts, const int* counts, int B, int G, int W,
               int* ids_out, int8_t* gslot_out, int64_t* n_ids_out,
               int* row_block_out, int64_t* row_start_out, int* row_count_out,
               int64_t* n_rows_out, int64_t* totals_out,
               int64_t max_ids, int64_t max_rows) {
  int64_t f = 0, r = 0;
  for (int b = 0; b < B; ++b) {
    const int64_t mstart = f;
    for (int g = 0; g < G; ++g) {
      const int s = starts[(size_t)b * G + g];
      const int c = counts[(size_t)b * G + g];
      if (f + c > max_ids) return -1;
      for (int j = 0; j < c; ++j) {
        ids_out[f] = s + j;
        gslot_out[f] = (int8_t)g;
        ++f;
      }
    }
    const int64_t total = f - mstart;
    totals_out[b] = total;
    const int64_t nrows = (total + W - 1) / W;
    if (r + nrows > max_rows) return -1;
    for (int64_t j = 0; j < nrows; ++j) {
      row_block_out[r] = b;
      row_start_out[r] = mstart + j * W;
      row_count_out[r] = (int)std::min<int64_t>(W, total - j * W);
      ++r;
    }
  }
  *n_ids_out = f;
  *n_rows_out = r;
  return 0;
}

}  // extern "C"
