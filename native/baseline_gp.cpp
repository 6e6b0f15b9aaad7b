// Single-core C++ GPOctoMap baseline — reference performance stand-in.
//
// Faithful single-threaded implementation of the reference GP hot path
// (src/gpoctomap/gpoctomap.cpp + gpregressor.h semantics, SURVEY.md §3.1):
// per-block exact GP (Matérn-3/2 Gram + Cholesky) over the block's own
// points, extended-block prediction (mean + variance via triangular
// solves), sequential BCM updates with the persistent ivar chop.  Plain
// -O3 loops stand in for Eigen; hash-map bucketing for the R-tree.
//
// Usage: baseline_gp <data_dir> <prefix> <scan_num> [--json]

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

// demo config (config/methods/gpoctomap.yaml); static nodes pass resolution
// as the downsample leaf
constexpr float kRes = 0.1f;
constexpr int kDepth = 3;
constexpr int kN = 1 << (kDepth - 1);
constexpr int kV = kN * kN * kN;
constexpr float kBs = kN * kRes;
constexpr float kSf2 = 1.0f, kEll = 1.0f, kNoise = 0.01f;
constexpr float kFreeRes = 0.1f, kDs = kRes, kMaxRange = 8.0f;
constexpr float kMinKnownIvar = 1.0f / 0.02f, kMaxIvar = 1.0f / 0.001f;

struct Vec3 { float x, y, z; };
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
    } else if (line.rfind("DATA", 0) == 0) break;
  }
  int stride = 0;
  for (int s : sizes) stride += s;
  std::vector<char> buf((size_t)npoints * stride);
  f.read(buf.data(), buf.size());
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

float Matern(float d) {
  const float s = 1.73205f / kEll * d;
  return (1.0f + s) * std::exp(-s) * kSf2;
}
float Dist(const Vec3& a, const Vec3& b) {
  const float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return std::sqrt(dx * dx + dy * dy + dz * dz);
}

struct Model {
  std::vector<Vec3> X;
  std::vector<float> L;      // n×n lower Cholesky
  std::vector<float> alpha;  // K⁻¹ y
};

bool Train(const std::vector<Vec3>& X, const std::vector<float>& y, Model* m) {
  const int n = (int)X.size();
  std::vector<float> K((size_t)n * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      K[(size_t)i * n + j] = Matern(Dist(X[i], X[j])) + (i == j ? kNoise : 0.0f);
  // in-place Cholesky
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      float s = K[(size_t)i * n + j];
      for (int k = 0; k < j; ++k) s -= K[(size_t)i * n + k] * K[(size_t)j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        K[(size_t)i * n + j] = std::sqrt(s);
      } else {
        K[(size_t)i * n + j] = s / K[(size_t)j * n + j];
      }
    }
  }
  // solve L Lᵀ alpha = y
  std::vector<float> z(n), a(n);
  for (int i = 0; i < n; ++i) {
    float s = y[i];
    for (int k = 0; k < i; ++k) s -= K[(size_t)i * n + k] * z[k];
    z[i] = s / K[(size_t)i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    float s = z[i];
    for (int k = i + 1; k < n; ++k) s -= K[(size_t)k * n + i] * a[k];
    a[i] = s / K[(size_t)i * n + i];
  }
  m->X = X;
  m->L = std::move(K);
  m->alpha = std::move(a);
  return true;
}

void Predict(const Model& m, const std::vector<Vec3>& xs,
             std::vector<float>* mean, std::vector<float>* var) {
  const int n = (int)m.X.size(), q = (int)xs.size();
  std::vector<float> Ks((size_t)n * q);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < q; ++j)
      Ks[(size_t)i * q + j] = Matern(Dist(m.X[i], xs[j]));
  mean->assign(q, 0.0f);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < q; ++j)
      (*mean)[j] += Ks[(size_t)i * q + j] * m.alpha[i];
  // v = L⁻¹ Ks (column-wise forward substitution), var = sf2 − Σ v²
  std::vector<float> v((size_t)n * q);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < q; ++j) {
      float s = Ks[(size_t)i * q + j];
      for (int k = 0; k < i; ++k) s -= m.L[(size_t)i * n + k] * v[(size_t)k * q + j];
      v[(size_t)i * q + j] = s / m.L[(size_t)i * n + i];
    }
  var->assign(q, kSf2);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < q; ++j)
      (*var)[j] -= v[(size_t)i * q + j] * v[(size_t)i * q + j];
}

struct Map {
  std::unordered_map<Key3, std::vector<float>, Key3Hash> blocks;  // (m_ivar, ivar)
  uint64_t kernel_evals = 0;
  int64_t Bi(float v) const { return (int64_t)std::floor((double)v / kBs + 0.5); }

  void Insert(const std::vector<Vec3>& cloud, Vec3 origin) {
    // training data: hits(+1) + beam frees(−1), both downsampled
    std::vector<Vec3> hits, keep, frees;
    Downsample(cloud, kDs, &hits);
    for (const auto& p : hits) {
      double dx = p.x - origin.x, dy = p.y - origin.y, dz = p.z - origin.z;
      double l = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (l > kMaxRange) continue;
      keep.push_back(p);
      float lf = (float)l;
      float nx = (p.x - origin.x) / lf, ny = (p.y - origin.y) / lf,
            nz = (p.z - origin.z) / lf;
      frees.push_back(origin);
      for (float d = kFreeRes; d < lf; d += kFreeRes)
        frees.push_back({origin.x + nx * d, origin.y + ny * d, origin.z + nz * d});
      if (lf > kFreeRes)
        frees.push_back({origin.x + nx * (lf - kFreeRes), origin.y + ny * (lf - kFreeRes),
                         origin.z + nz * (lf - kFreeRes)});
    }
    std::vector<Vec3> sfrees;
    Downsample(frees, kDs, &sfrees);
    std::vector<Vec3> xy = keep;
    std::vector<float> y(keep.size(), 1.0f);
    xy.insert(xy.end(), sfrees.begin(), sfrees.end());
    y.insert(y.end(), sfrees.size(), -1.0f);

    std::unordered_map<Key3, std::vector<int>, Key3Hash> buckets;
    for (int i = 0; i < (int)xy.size(); ++i)
      buckets[{Bi(xy[i].x), Bi(xy[i].y), Bi(xy[i].z)}].push_back(i);

    std::unordered_map<Key3, Model, Key3Hash> models;
    for (const auto& kv : buckets) {
      std::vector<Vec3> X;
      std::vector<float> yy;
      for (int i : kv.second) { X.push_back(xy[i]); yy.push_back(y[i]); }
      Model m;
      if (Train(X, yy, &m)) models.emplace(kv.first, std::move(m));
      kernel_evals += (uint64_t)X.size() * X.size();
    }
    static const int off[7][3] = {{0,0,0},{1,0,0},{-1,0,0},{0,1,0},{0,-1,0},{0,0,1},{0,0,-1}};
    std::unordered_set<Key3, Key3Hash> test;
    for (const auto& kv : buckets)
      for (const auto& o : off)
        test.insert({kv.first.x + o[0], kv.first.y + o[1], kv.first.z + o[2]});
    for (const auto& tb : test) {
      auto& blk = blocks[tb];
      if (blk.empty()) blk.assign(2 * kV, 0.0f);
      std::vector<Vec3> xs(kV);
      for (int vz = 0; vz < kN; ++vz)
        for (int vy = 0; vy < kN; ++vy)
          for (int vx = 0; vx < kN; ++vx)
            xs[vx + vy * kN + vz * kN * kN] = {
                tb.x * kBs + (vx - kN / 2 + 0.5f) * kRes,
                tb.y * kBs + (vy - kN / 2 + 0.5f) * kRes,
                tb.z * kBs + (vz - kN / 2 + 0.5f) * kRes};
      for (const auto& o : off) {
        auto it = models.find({tb.x + o[0], tb.y + o[1], tb.z + o[2]});
        if (it == models.end()) continue;
        std::vector<float> mean, var;
        Predict(it->second, xs, &mean, &var);
        kernel_evals += (uint64_t)it->second.X.size() * kV;
        for (int v = 0; v < kV; ++v) {
          blk[2 * v + 1] += 1.0f / var[v] - kSf2;     // ivar (BCM)
          blk[2 * v] += mean[v] / var[v];             // m_ivar
          if (blk[2 * v + 1] >= kMinKnownIvar && blk[2 * v + 1] > kMaxIvar)
            blk[2 * v + 1] = kMaxIvar;                // persistent chop
        }
      }
    }
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <dir> <prefix> <scan_num> [--json]\n", argv[0]);
    return 2;
  }
  const std::string dir = argv[1], prefix = argv[2];
  const int scan_num = std::atoi(argv[3]);
  bool json = false;
  std::string dump_path;
  for (int a = 4; a < argc; ++a) {
    if (std::string(argv[a]) == "--json") json = true;
    else if (std::string(argv[a]) == "--dump" && a + 1 < argc) dump_path = argv[++a];
  }
  Map map;
  double total = 0;
  for (int i = 1; i <= scan_num; ++i) {
    std::vector<Vec3> cloud;
    Vec3 origin{0, 0, 0};
    if (!LoadPcd(dir + "/" + prefix + "_" + std::to_string(i) + ".pcd", &cloud, &origin))
      return 1;
    auto t0 = std::chrono::steady_clock::now();
    map.Insert(cloud, origin);
    total += std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    if (!json) std::printf("scan %d done\n", i);
  }
  if (!dump_path.empty()) {
    // per-voxel (x,y,z,prob,var): logistic squash of the BCM information
    // state (gpoctree_node.cpp:31-34); independent anchor for
    // tests/test_cpp_dump.py
    FILE* f = std::fopen(dump_path.c_str(), "w");
    if (!f) return 1;
    std::fprintf(f, "x,y,z,prob,var\n");
    const float kL = 100.0f;  // gpoctomap.yaml `l`
    for (const auto& kv : map.blocks) {
      const float cx = kv.first.x * kBs, cy = kv.first.y * kBs, cz = kv.first.z * kBs;
      for (int vz = 0; vz < kN; ++vz)
        for (int vy = 0; vy < kN; ++vy)
          for (int vx = 0; vx < kN; ++vx) {
            const int v = vx + vy * kN + vz * kN * kN;
            const float mi = kv.second[2 * v], iv = kv.second[2 * v + 1];
            const float prob = 1.0f / (1.0f + std::exp(-kL * mi / kMaxIvar));
            const float var = iv > 0 ? 1.0f / iv : 1e30f;
            std::fprintf(f, "%.9g,%.9g,%.9g,%.9g,%.9g\n",
                         cx + (vx - kN / 2 + 0.5f) * kRes,
                         cy + (vy - kN / 2 + 0.5f) * kRes,
                         cz + (vz - kN / 2 + 0.5f) * kRes, prob, var);
          }
    }
    std::fclose(f);
  }
  if (json) {
    std::printf("{\"scans\": %d, \"total_s\": %.6f, \"scans_per_s\": %.6f, "
                "\"kernel_evals\": %llu, \"blocks\": %zu}\n",
                scan_num, total, scan_num / total,
                (unsigned long long)map.kernel_evals, map.blocks.size());
  } else {
    std::printf("total %.3fs (%.3f scans/s)\n", total, scan_num / total);
  }
  return 0;
}
