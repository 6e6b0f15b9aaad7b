// Single-core C++ BGKL/BGKLV baseline — reference performance stand-in.
//
// Faithful single-threaded implementation of the reference's BGKL and BGKLV
// hot paths (semantics of src/bgkloctomap/bgkloctomap.cpp and
// src/bgklvoctomap/bgklvoctomap.cpp as documented in SURVEY.md §3.1), since
// the ROS/PCL upstream cannot build here.  Spatial indexing uses a uniform
// hash grid (at least as fast as the reference's per-scan R-tree), making
// this a conservative (fast) baseline.
//
// Usage: baseline_lv <mode:bgkl|bgklv> <data_dir> <prefix> <scan_num> [--json]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <chrono>

namespace {

struct Vec3 { float x, y, z; };
struct Seg { Vec3 a, b; };

struct Params {
  float resolution, sf2, ell, free_res, ds_res, max_range;
  int block_depth;
};

// demo configs (config/methods/bgkloctomap.yaml, bgklvoctomap.yaml); the
// static nodes pass `resolution` as the downsample leaf
Params BgklParams() { return {0.1f, 0.1f, 0.2f, 0.3f, 0.1f, 8.0f, 3}; }
Params BgklvParams() { return {0.1f, 0.1f, 0.2f, 0.1f, 0.1f, 8.0f, 5}; }

constexpr float kTwoPi = 2.0f * 3.1415926f;

struct Key3 {
  int64_t x, y, z;
  bool operator==(const Key3& o) const { return x == o.x && y == o.y && z == o.z; }
};
struct Key3Hash {
  size_t operator()(const Key3& k) const {
    uint64_t h = (uint64_t)(k.x + 524288) << 40 | (uint64_t)(k.y + 524288) << 20 |
                 (uint64_t)(k.z + 524288);
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
    return (size_t)h;
  }
};

bool LoadPcd(const std::string& path, std::vector<Vec3>* pts, Vec3* origin) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string line;
  int npoints = 0;
  std::vector<int> sizes;
  while (std::getline(f, line)) {
    if (line.rfind("SIZE", 0) == 0) {
      const char* p = line.c_str() + 4;
      while (*p) { if (*p >= '0' && *p <= '9') sizes.push_back(*p - '0'); ++p; }
    } else if (line.rfind("VIEWPOINT", 0) == 0) {
      std::sscanf(line.c_str(), "VIEWPOINT %f %f %f", &origin->x, &origin->y, &origin->z);
    } else if (line.rfind("POINTS", 0) == 0) {
      std::sscanf(line.c_str(), "POINTS %d", &npoints);
    } else if (line.rfind("DATA", 0) == 0) {
      break;
    }
  }
  int stride = 0;
  for (int s : sizes) stride += s;
  std::vector<char> buf((size_t)npoints * stride);
  f.read(buf.data(), buf.size());
  pts->reserve(npoints);
  for (int i = 0; i < npoints; ++i) {
    float v[3];
    std::memcpy(v, buf.data() + (size_t)i * stride, 12);
    if (std::isfinite(v[0]) && std::isfinite(v[1]) && std::isfinite(v[2]))
      pts->push_back({v[0], v[1], v[2]});
  }
  return true;
}

void Downsample(const std::vector<Vec3>& in, float leaf, std::vector<Vec3>* out) {
  struct Acc { double x = 0, y = 0, z = 0; int n = 0; };
  std::unordered_map<Key3, Acc, Key3Hash> grid;
  const float inv = 1.0f / leaf;
  for (const auto& p : in) {
    auto& a = grid[{(int64_t)std::floor(p.x * inv), (int64_t)std::floor(p.y * inv),
                    (int64_t)std::floor(p.z * inv)}];
    a.x += p.x; a.y += p.y; a.z += p.z; a.n++;
  }
  out->clear();
  for (auto& kv : grid)
    out->push_back({(float)(kv.second.x / kv.second.n), (float)(kv.second.y / kv.second.n),
                    (float)(kv.second.z / kv.second.n)});
}

float SparseKernelLV(float r, float sf2) {  // r clamped ≤1 pre-kernel (LV)
  if (r > 1.0f) r = 1.0f;
  return ((2.0f + std::cos(kTwoPi * r)) * (1.0f - r) / 3.0f +
          std::sin(kTwoPi * r) / kTwoPi) * sf2;
}
float SparseKernel(float r, float sf2) {  // negatives clamped (BGKL)
  float k = ((2.0f + std::cos(kTwoPi * r)) * (1.0f - r) / 3.0f +
             std::sin(kTwoPi * r) / kTwoPi) * sf2;
  return k < 0 ? 0 : k;
}

float PointSegDist(const Vec3& p, const Seg& s) {
  const float ux = s.b.x - s.a.x, uy = s.b.y - s.a.y, uz = s.b.z - s.a.z;
  const float ll = std::sqrt(ux * ux + uy * uy + uz * uz);
  const float dx = p.x - s.a.x, dy = p.y - s.a.y, dz = p.z - s.a.z;
  if (ll < 1e-4f) return std::sqrt(dx * dx + dy * dy + dz * dz);
  const double c1 = dx * ux + dy * uy + dz * uz;
  const double c2 = ux * ux + uy * uy + uz * uz;
  if (c1 <= 0) return std::sqrt(dx * dx + dy * dy + dz * dz);
  if (c2 <= c1) {
    const float ex = p.x - s.b.x, ey = p.y - s.b.y, ez = p.z - s.b.z;
    return std::sqrt(ex * ex + ey * ey + ez * ez);
  }
  const double b = c1 / c2;
  const float nx = (float)(s.a.x + ux * b), ny = (float)(s.a.y + uy * b),
              nz = (float)(s.a.z + uz * b);
  const float ex = p.x - nx, ey = p.y - ny, ez = p.z - nz;
  return std::sqrt(ex * ex + ey * ey + ez * ez);
}

// training data for both families: hits + rays + per-ray proxy samples
struct TrainData {
  std::vector<Vec3> hits;
  std::vector<Seg> rays;
  std::vector<Vec3> samples;      // ray proxy points (origin + backward beams)
  std::vector<int> sample_ray;
};

void BeamBackward(const Vec3& end, const Vec3& start, float fr,
                  std::vector<Vec3>* out, std::vector<int>* ray_of, int ray) {
  const float dx = end.x - start.x, dy = end.y - start.y, dz = end.z - start.z;
  const float l = std::sqrt(dx * dx + dy * dy + dz * dz);
  if (l <= 0) return;
  const float nx = dx / l, ny = dy / l, nz = dz / l;
  for (float d = l - fr; d > 0.0f; d -= fr) {
    out->push_back({start.x + nx * d, start.y + ny * d, start.z + nz * d});
    ray_of->push_back(ray);
  }
}

TrainData BgklTraining(const std::vector<Vec3>& cloud, Vec3 origin, const Params& P) {
  TrainData td;
  std::vector<Vec3> hits;
  Downsample(cloud, P.resolution, &hits);
  for (const auto& p : hits) {
    double dx = p.x - origin.x, dy = p.y - origin.y, dz = p.z - origin.z;
    double l = std::sqrt(dx * dx + dy * dy + dz * dz);
    if (P.max_range > 0 && l > P.max_range) continue;
    float lf = (float)std::sqrt((p.x - origin.x) * (p.x - origin.x) +
                                (p.y - origin.y) * (p.y - origin.y) +
                                (p.z - origin.z) * (p.z - origin.z));
    float nx = (p.x - origin.x) / lf, ny = (p.y - origin.y) / lf,
          nz = (p.z - origin.z) / lf;
    Vec3 occ{origin.x + nx * lf, origin.y + ny * lf, origin.z + nz * lf};
    int ray = (int)td.rays.size();
    td.hits.push_back(occ);
    td.samples.push_back(origin);
    td.sample_ray.push_back(ray);
    BeamBackward(occ, origin, P.free_res, &td.samples, &td.sample_ray, ray);
    Vec3 end{origin.x + nx * (lf - P.free_res), origin.y + ny * (lf - P.free_res),
             origin.z + nz * (lf - P.free_res)};
    td.rays.push_back({origin, end});
  }
  return td;
}

TrainData BgklvTraining(const std::vector<Vec3>& cloud, Vec3 origin, const Params& P) {
  // bgklvoctomap.cpp:303-423: shorten by ℓ√2, over-range rays, nearby-hit
  // shrinking, pushed ray origins, downward-ray drop
  TrainData td;
  std::vector<Vec3> hits;
  Downsample(cloud, P.resolution, &hits);
  const double offset = P.ell * std::sqrt(2.0), influence = P.ell;
  for (const auto& p : hits) {
    double l = std::sqrt((double)(p.x - origin.x) * (p.x - origin.x) +
                         (double)(p.y - origin.y) * (p.y - origin.y) +
                         (double)(p.z - origin.z) * (p.z - origin.z));
    float nx = (float)((p.x - origin.x) / l), ny = (float)((p.y - origin.y) / l),
          nz = (float)((p.z - origin.z) / l);
    if (P.max_range > 0) {
      if (l < P.max_range) {
        td.hits.push_back(p);
        l = (double)std::sqrt((p.x - origin.x) * (p.x - origin.x) +
                              (p.y - origin.y) * (p.y - origin.y) +
                              (p.z - origin.z) * (p.z - origin.z)) - offset;
      } else {
        l = P.max_range - offset;
      }
    }
    Vec3 nearest = p;
    Vec3 endp{origin.x + nx * (float)l, origin.y + ny * (float)l, origin.z + nz * (float)l};
    // nearby hits then sequential shrinking (O(H) per ray)
    const float lvx = endp.x - origin.x, lvy = endp.y - origin.y, lvz = endp.z - origin.z;
    const double lvsq = (double)lvx * lvx + (double)lvy * lvy + (double)lvz * lvz;
    for (const auto& q : hits) {
      double r0 = std::sqrt((double)(q.x - origin.x) * (q.x - origin.x) +
                            (double)(q.y - origin.y) * (q.y - origin.y) +
                            (double)(q.z - origin.z) * (q.z - origin.z));
      if (P.max_range > 0 && r0 > P.max_range) continue;
      if (p.z > offset + origin.z && q.z < origin.z + influence) continue;
      double d1 = std::sqrt((double)(endp.x - q.x) * (endp.x - q.x) +
                            (double)(endp.y - q.y) * (endp.y - q.y) +
                            (double)(endp.z - q.z) * (endp.z - q.z));
      if (!(d1 < influence || (d1 < l && r0 < l))) continue;
      double b = (double)(q.x - origin.x) * lvx + (double)(q.y - origin.y) * lvy +
                 (double)(q.z - origin.z) * lvz;
      if (b > l * l) continue;
      double bx = origin.x + lvx * (b / lvsq) - q.x;
      double by = origin.y + lvy * (b / lvsq) - q.y;
      double bz = origin.z + lvz * (b / lvsq) - q.z;
      double dist = std::sqrt(bx * bx + by * by + bz * bz);
      if (dist < influence) { nearest = q; l = b / std::sqrt(lvsq); }
    }
    if (l < P.max_range / 5.0 && l / (offset - nearest.z) > 0) continue;
    endp = {origin.x + nx * (float)l, origin.y + ny * (float)l, origin.z + nz * (float)l};
    Vec3 fo = (l > influence) ? Vec3{origin.x + nx * (float)influence,
                                     origin.y + ny * (float)influence,
                                     origin.z + nz * (float)influence}
                              : endp;
    int ray = (int)td.rays.size();
    td.samples.push_back(fo);
    td.sample_ray.push_back(ray);
    BeamBackward(endp, fo, P.free_res, &td.samples, &td.sample_ray, ray);
    td.rays.push_back({fo, endp});
  }
  return td;
}

struct Map {
  Params P;
  int kN, kV;
  float block_size;
  std::unordered_map<Key3, std::vector<float>, Key3Hash> blocks;  // A,B interleaved
  uint64_t kernel_evals = 0;
  explicit Map(const Params& p) : P(p) {
    kN = 1 << (P.block_depth - 1);
    kV = kN * kN * kN;
    block_size = kN * P.resolution;
  }
  int64_t Bi(float v) const { return (int64_t)std::floor((double)v / block_size + 0.5); }

  // BGKL: per-block segment models + extended-block prediction
  void InsertBgkl(const TrainData& td) {
    struct Entry { Seg s; float y; };
    std::unordered_map<Key3, std::vector<Entry>, Key3Hash> models;
    std::unordered_map<Key3, std::unordered_set<int>, Key3Hash> seen;
    for (const auto& h : td.hits)
      models[{Bi(h.x), Bi(h.y), Bi(h.z)}].push_back({{h, h}, 1.0f});
    for (size_t i = 0; i < td.samples.size(); ++i) {
      const auto& s = td.samples[i];
      Key3 k{Bi(s.x), Bi(s.y), Bi(s.z)};
      if (seen[k].insert(td.sample_ray[i]).second)
        models[k].push_back({td.rays[td.sample_ray[i]], 0.0f});
    }
    static const int off[7][3] = {{0,0,0},{1,0,0},{-1,0,0},{0,1,0},{0,-1,0},{0,0,1},{0,0,-1}};
    std::unordered_set<Key3, Key3Hash> test;
    for (const auto& kv : models)
      for (const auto& o : off)
        test.insert({kv.first.x + o[0], kv.first.y + o[1], kv.first.z + o[2]});
    for (const auto& tb : test) {
      auto& blk = blocks[tb];
      if (blk.empty()) blk.assign(2 * kV, 0.001f);
      const float cx = tb.x * block_size, cy = tb.y * block_size, cz = tb.z * block_size;
      for (const auto& o : off) {
        auto it = models.find({tb.x + o[0], tb.y + o[1], tb.z + o[2]});
        if (it == models.end()) continue;
        const auto& es = it->second;
        for (int vz = 0; vz < kN; ++vz)
          for (int vy = 0; vy < kN; ++vy)
            for (int vx = 0; vx < kN; ++vx) {
              Vec3 pt{cx + (vx - kN / 2 + 0.5f) * P.resolution,
                      cy + (vy - kN / 2 + 0.5f) * P.resolution,
                      cz + (vz - kN / 2 + 0.5f) * P.resolution};
              float ybar = 0, kbar = 0;
              for (const auto& e : es) {
                float k = SparseKernel(PointSegDist(pt, e.s) / P.ell, P.sf2);
                kbar += k; ybar += k * e.y;
              }
              kernel_evals += es.size();
              if (kbar > 0.001f) {
                const int v = vx + vy * kN + vz * kN * kN;
                blk[2 * v] += ybar; blk[2 * v + 1] += kbar - ybar;
              }
            }
      }
    }
  }

  // BGKLV: per-voxel ±ℓ cube queries at base resolution
  void InsertBgklv(const TrainData& td) {
    // hash grid over hits and samples at cell = ell for the cube queries
    const float cell = P.ell;
    auto cellOf = [&](const Vec3& p) -> Key3 {
      return {(int64_t)std::floor(p.x / cell), (int64_t)std::floor(p.y / cell),
              (int64_t)std::floor(p.z / cell)};
    };
    std::unordered_map<Key3, std::vector<int>, Key3Hash> hgrid, sgrid;
    for (int i = 0; i < (int)td.hits.size(); ++i) hgrid[cellOf(td.hits[i])].push_back(i);
    for (int i = 0; i < (int)td.samples.size(); ++i) sgrid[cellOf(td.samples[i])].push_back(i);

    // candidate blocks: bbox sweep over all sample+hit positions
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    auto upd = [&](const Vec3& p) {
      mn[0] = std::min(mn[0], p.x); mx[0] = std::max(mx[0], p.x);
      mn[1] = std::min(mn[1], p.y); mx[1] = std::max(mx[1], p.y);
      mn[2] = std::min(mn[2], p.z); mx[2] = std::max(mx[2], p.z);
    };
    for (const auto& p : td.hits) upd(p);
    for (const auto& p : td.samples) upd(p);

    std::vector<int> rayseen(td.rays.size(), -1);
    int qid = 0;
    for (int bx = (int)std::floor((mn[0] - block_size) / block_size + 0.5);
         bx <= (int)std::floor((mx[0] + 2 * block_size) / block_size + 0.5); ++bx)
    for (int by = (int)std::floor((mn[1] - block_size) / block_size + 0.5);
         by <= (int)std::floor((mx[1] + 2 * block_size) / block_size + 0.5); ++by)
    for (int bz = (int)std::floor((mn[2] - block_size) / block_size + 0.5);
         bz <= (int)std::floor((mx[2] + 2 * block_size) / block_size + 0.5); ++bz) {
      Key3 tb{bx, by, bz};
      auto& blk = blocks[tb];
      if (blk.empty()) blk.assign(2 * kV, 0.001f);
      const float cx = bx * block_size, cy = by * block_size, cz = bz * block_size;
      for (int vz = 0; vz < kN; ++vz)
        for (int vy = 0; vy < kN; ++vy)
          for (int vx = 0; vx < kN; ++vx) {
            Vec3 pt{cx + (vx - kN / 2 + 0.5f) * P.resolution,
                    cy + (vy - kN / 2 + 0.5f) * P.resolution,
                    cz + (vz - kN / 2 + 0.5f) * P.resolution};
            float ybar = 0, kbar = 0;
            ++qid;
            // cube query via the ell-grid: check 3³ neighboring cells
            Key3 c = cellOf(pt);
            int nent = 0;
            for (int dx = -1; dx <= 1; ++dx)
              for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                  Key3 cc{c.x + dx, c.y + dy, c.z + dz};
                  auto hit_it = hgrid.find(cc);
                  if (hit_it != hgrid.end())
                    for (int i : hit_it->second) {
                      const Vec3& h = td.hits[i];
                      if (std::fabs(h.x - pt.x) <= P.ell && std::fabs(h.y - pt.y) <= P.ell &&
                          std::fabs(h.z - pt.z) <= P.ell) {
                        float dxx = (pt.x - h.x), dyy = (pt.y - h.y), dzz = (pt.z - h.z);
                        float k = SparseKernelLV(
                            std::sqrt(dxx * dxx + dyy * dyy + dzz * dzz) / P.ell, P.sf2);
                        ybar += k; kbar += k; ++nent;
                      }
                    }
                  auto s_it = sgrid.find(cc);
                  if (s_it != sgrid.end())
                    for (int i : s_it->second) {
                      const Vec3& s = td.samples[i];
                      if (std::fabs(s.x - pt.x) <= P.ell && std::fabs(s.y - pt.y) <= P.ell &&
                          std::fabs(s.z - pt.z) <= P.ell) {
                        int r = td.sample_ray[i];
                        if (rayseen[r] != qid) {
                          rayseen[r] = qid;
                          float k = SparseKernelLV(
                              PointSegDist(pt, td.rays[r]) / P.ell, P.sf2);
                          kbar += k; ++nent;
                        }
                      }
                    }
                }
            kernel_evals += nent;
            if (kbar > 0.001f) {
              const int v = vx + vy * kN + vz * kN * kN;
              blk[2 * v] += ybar; blk[2 * v + 1] += kbar - ybar;
            }
          }
    }
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr, "usage: %s <bgkl|bgklv> <dir> <prefix> <scan_num> [--json]\n", argv[0]);
    return 2;
  }
  const std::string mode = argv[1], dir = argv[2], prefix = argv[3];
  const int scan_num = std::atoi(argv[4]);
  bool json = false;
  std::string dump_path;
  for (int a = 5; a < argc; ++a) {
    if (std::string(argv[a]) == "--json") json = true;
    else if (std::string(argv[a]) == "--dump" && a + 1 < argc) dump_path = argv[++a];
  }
  const Params P = (mode == "bgklv") ? BgklvParams() : BgklParams();
  Map map(P);
  double total = 0;
  for (int i = 1; i <= scan_num; ++i) {
    std::vector<Vec3> cloud;
    Vec3 origin{0, 0, 0};
    if (!LoadPcd(dir + "/" + prefix + "_" + std::to_string(i) + ".pcd", &cloud, &origin)) {
      std::fprintf(stderr, "cannot read scan %d\n", i);
      return 1;
    }
    auto t0 = std::chrono::steady_clock::now();
    TrainData td = (mode == "bgklv") ? BgklvTraining(cloud, origin, P)
                                     : BgklTraining(cloud, origin, P);
    if (mode == "bgklv") map.InsertBgklv(td); else map.InsertBgkl(td);
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    total += dt;
    if (!json) std::printf("scan %d: %.3fs\n", i, dt);
  }
  if (!dump_path.empty()) {
    // per-voxel (x,y,z,prob,var): BGKL Beta posterior or the BGKLV
    // evidence-mass posterior with explicit unknown mass + Brier-style
    // variance (bgklvoctree_node.cpp:29-62); anchor for tests/test_cpp_dump.py
    FILE* f = std::fopen(dump_path.c_str(), "w");
    if (!f) return 1;
    std::fprintf(f, "x,y,z,prob,var\n");
    const bool lv = mode == "bgklv";
    const float kMinW = 0.001f;  // bgklvoctomap.yaml min_W
    for (const auto& kv : map.blocks) {
      const float cx = kv.first.x * map.block_size, cy = kv.first.y * map.block_size,
                  cz = kv.first.z * map.block_size;
      const int kN = map.kN;
      for (int vz = 0; vz < kN; ++vz)
        for (int vy = 0; vy < kN; ++vy)
          for (int vx = 0; vx < kN; ++vx) {
            const int v = vx + vy * kN + vz * kN * kN;
            const float A = kv.second[2 * v], B = kv.second[2 * v + 1];
            float prob, var;
            if (lv) {
              const float W = std::max(A + B, kMinW);
              prob = (A > B) ? A / (W - B) + (W - A - B) * 0.5f / (W - B)
                             : 0.5f * (W - B - A) / (W - A);
              var = (A / W) * (1 - prob) * (1 - prob)
                  + ((W - A - B) / W) * (0.5f - prob) * (0.5f - prob)
                  + (B / W) * prob * prob;
            } else {
              prob = A / (A + B);
              var = (A * B) / ((A + B) * (A + B) * (A + B + 1.0f));
            }
            std::fprintf(f, "%.9g,%.9g,%.9g,%.9g,%.9g\n",
                         cx + (vx - kN / 2 + 0.5f) * P.resolution,
                         cy + (vy - kN / 2 + 0.5f) * P.resolution,
                         cz + (vz - kN / 2 + 0.5f) * P.resolution, prob, var);
          }
    }
    std::fclose(f);
  }
  if (json) {
    std::printf("{\"mode\": \"%s\", \"scans\": %d, \"total_s\": %.6f, "
                "\"scans_per_s\": %.6f, \"kernel_evals\": %llu, \"blocks\": %zu}\n",
                mode.c_str(), scan_num, total, scan_num / total,
                (unsigned long long)map.kernel_evals, map.blocks.size());
  } else {
    std::printf("total: %.3fs (%.3f scans/s) blocks=%zu evals=%llu\n", total,
                scan_num / total, map.blocks.size(),
                (unsigned long long)map.kernel_evals);
  }
  return 0;
}
