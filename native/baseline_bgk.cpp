// Single-core C++ BGK baseline — the reference performance stand-in.
//
// The upstream reference (RobustFieldAutonomyLab/la3dm) cannot build here
// (ROS/PCL are unavailable), so this is a faithful, independently written
// single-threaded implementation of its BGK hot path (semantics of
// src/bgkoctomap/bgkoctomap.cpp:214-366 as documented in SURVEY.md §3.1):
// voxel-grid downsample → beam free-space sampling → per-block training
// sets → extended-block sparse-kernel prediction → gated Beta updates.
// Spatial indexing uses hash-map block bucketing (equivalent to, and no
// slower than, the reference's per-scan R-tree), dense math uses plain
// arrays at -O3 — a *conservative* baseline: it has no ROS overhead and a
// faster index than the original.
//
// Usage: baseline_bgk <data_dir> <prefix> <scan_num> [--json]
// Prints per-scan wall-clock and total; with --json, one JSON summary line.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>
#include <chrono>

namespace {

constexpr float kResolution = 0.1f;
constexpr int kBlockDepth = 3;
constexpr int kN = 1 << (kBlockDepth - 1);  // voxels per edge
constexpr int kV = kN * kN * kN;
constexpr float kBlockSize = kN * kResolution;
constexpr float kSf2 = 1.0f;
constexpr float kEll = 0.2f;
constexpr float kFreeRes = 0.5f;
constexpr float kDsRes = kResolution;  // static node passes resolution
constexpr float kMaxRange = 8.0f;
constexpr float kPriorA = 0.001f, kPriorB = 0.001f;
constexpr float kTwoPi = 2.0f * 3.1415926f;

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

int64_t BlockIdx(float v) { return (int64_t)std::floor((double)v / kBlockSize + 0.5); }

// ---------------------------------------------------------------- PCD load
bool LoadPcd(const std::string& path, std::vector<Vec3>* pts, Vec3* origin) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string line;
  int npoints = 0, nfields = 0;
  bool binary = true;
  std::vector<int> sizes;
  while (std::getline(f, line)) {
    if (line.rfind("FIELDS", 0) == 0) {
      nfields = 0;
      for (char c : line) nfields += (c == ' ');
    } else if (line.rfind("SIZE", 0) == 0) {
      sizes.clear();
      const char* p = line.c_str() + 4;
      while (*p) { if (*p >= '0' && *p <= '9') { sizes.push_back(*p - '0'); } ++p; }
    } else if (line.rfind("VIEWPOINT", 0) == 0) {
      std::sscanf(line.c_str(), "VIEWPOINT %f %f %f", &origin->x, &origin->y, &origin->z);
    } else if (line.rfind("POINTS", 0) == 0) {
      std::sscanf(line.c_str(), "POINTS %d", &npoints);
    } else if (line.rfind("DATA", 0) == 0) {
      binary = line.find("binary") != std::string::npos;
      break;
    }
  }
  int stride = 0;
  for (int s : sizes) stride += s;
  if (stride == 0) stride = 4 * nfields;
  pts->reserve(npoints);
  if (binary) {
    std::vector<char> buf((size_t)npoints * stride);
    f.read(buf.data(), buf.size());
    for (int i = 0; i < npoints; ++i) {
      float v[3];
      std::memcpy(v, buf.data() + (size_t)i * stride, 12);
      if (std::isfinite(v[0]) && std::isfinite(v[1]) && std::isfinite(v[2]))
        pts->push_back({v[0], v[1], v[2]});
    }
  } else {
    float a, b, c, d;
    while (f >> a >> b >> c >> d) pts->push_back({a, b, c});
  }
  return true;
}

// ------------------------------------------------------- preprocessing
void Downsample(const std::vector<Vec3>& in, float leaf, std::vector<Vec3>* out) {
  struct Acc { double x = 0, y = 0, z = 0; int n = 0; };
  std::unordered_map<Key3, Acc, Key3Hash> grid;
  grid.reserve(in.size());
  const float inv = 1.0f / leaf;
  for (const auto& p : in) {
    Key3 k{(int64_t)std::floor(p.x * inv), (int64_t)std::floor(p.y * inv),
           (int64_t)std::floor(p.z * inv)};
    auto& a = grid[k];
    a.x += p.x; a.y += p.y; a.z += p.z; a.n++;
  }
  out->clear();
  out->reserve(grid.size());
  for (auto& kv : grid) {
    const auto& a = kv.second;
    out->push_back({(float)(a.x / a.n), (float)(a.y / a.n), (float)(a.z / a.n)});
  }
}

// training data: hits(1) + beam-sampled frees(0), both downsampled
void TrainingData(const std::vector<Vec3>& cloud, Vec3 origin,
                  std::vector<Vec3>* xy, std::vector<float>* y) {
  std::vector<Vec3> hits;
  Downsample(cloud, kDsRes, &hits);
  std::vector<Vec3> keep, frees;
  for (const auto& p : hits) {
    double dx = p.x - origin.x, dy = p.y - origin.y, dz = p.z - origin.z;
    double l = std::sqrt(dx * dx + dy * dy + dz * dz);
    if (l > kMaxRange) continue;
    keep.push_back(p);
    float lf = (float)std::sqrt((p.x - origin.x) * (p.x - origin.x) +
                                (p.y - origin.y) * (p.y - origin.y) +
                                (p.z - origin.z) * (p.z - origin.z));
    float nx = (p.x - origin.x) / lf, ny = (p.y - origin.y) / lf, nz = (p.z - origin.z) / lf;
    frees.push_back(origin);
    for (float d = kFreeRes; d < lf; d += kFreeRes)
      frees.push_back({origin.x + nx * d, origin.y + ny * d, origin.z + nz * d});
    if (lf > kFreeRes)
      frees.push_back({origin.x + nx * (lf - kFreeRes), origin.y + ny * (lf - kFreeRes),
                       origin.z + nz * (lf - kFreeRes)});
  }
  std::vector<Vec3> sfrees;
  Downsample(frees, kDsRes, &sfrees);
  xy->clear(); y->clear();
  for (const auto& p : keep) { xy->push_back(p); y->push_back(1.0f); }
  for (const auto& p : sfrees) { xy->push_back(p); y->push_back(0.0f); }
}

// ----------------------------------------------------------------- map
struct Block {
  float A[kV], B[kV];
  Block() {
    for (int i = 0; i < kV; ++i) { A[i] = kPriorA; B[i] = kPriorB; }
  }
};

struct Map {
  std::unordered_map<Key3, Block, Key3Hash> blocks;
  uint64_t kernel_evals = 0;

  void Insert(const std::vector<Vec3>& cloud, Vec3 origin) {
    std::vector<Vec3> xy;
    std::vector<float> y;
    TrainingData(cloud, origin, &xy, &y);
    if (xy.empty()) return;

    // bucket training points by block
    std::unordered_map<Key3, std::vector<int>, Key3Hash> buckets;
    for (int i = 0; i < (int)xy.size(); ++i) {
      Key3 k{BlockIdx(xy[i].x), BlockIdx(xy[i].y), BlockIdx(xy[i].z)};
      buckets[k].push_back(i);
    }
    // test blocks: any block whose 7-neighborhood has points
    static const int off[7][3] = {{0,0,0},{1,0,0},{-1,0,0},{0,1,0},{0,-1,0},{0,0,1},{0,0,-1}};
    std::unordered_map<Key3, char, Key3Hash> test;
    for (const auto& kv : buckets)
      for (const auto& o : off)
        test[{kv.first.x + o[0], kv.first.y + o[1], kv.first.z + o[2]}] = 1;

    for (const auto& tkv : test) {
      const Key3 tb = tkv.first;
      Block& blk = blocks[tb];
      const float cx = tb.x * kBlockSize, cy = tb.y * kBlockSize, cz = tb.z * kBlockSize;
      // per neighbor model: ybar/kbar over this block's 64 voxels, gated per model
      for (const auto& o : off) {
        auto it = buckets.find({tb.x + o[0], tb.y + o[1], tb.z + o[2]});
        if (it == buckets.end()) continue;
        const auto& idx = it->second;
        for (int vz = 0; vz < kN; ++vz)
          for (int vy = 0; vy < kN; ++vy)
            for (int vx = 0; vx < kN; ++vx) {
              const float px = cx + (vx - kN / 2 + 0.5f) * kResolution;
              const float py = cy + (vy - kN / 2 + 0.5f) * kResolution;
              const float pz = cz + (vz - kN / 2 + 0.5f) * kResolution;
              float ybar = 0.0f, kbar = 0.0f;
              for (int j : idx) {
                const float dx = (xy[j].x - px) / kEll, dy = (xy[j].y - py) / kEll,
                            dz = (xy[j].z - pz) / kEll;
                const float r = std::sqrt(dx * dx + dy * dy + dz * dz);
                if (r >= 1.0f) continue;
                float k = ((2.0f + std::cos(kTwoPi * r)) * (1.0f - r) / 3.0f +
                           std::sin(kTwoPi * r) / kTwoPi) * kSf2;
                if (k < 0.0f) k = 0.0f;
                kbar += k;
                ybar += k * y[j];
              }
              kernel_evals += idx.size();
              if (kbar > 0.0f) {
                const int v = vx + vy * kN + vz * kN * kN;
                blk.A[v] += ybar;
                blk.B[v] += kbar - ybar;
              }
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
    const std::string path = dir + "/" + prefix + "_" + std::to_string(i) + ".pcd";
    if (!LoadPcd(path, &cloud, &origin)) {
      std::fprintf(stderr, "cannot read %s\n", path.c_str());
      return 1;
    }
    auto t0 = std::chrono::steady_clock::now();
    map.Insert(cloud, origin);
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    total += dt;
    if (!json) std::printf("scan %d: %.3fs\n", i, dt);
  }
  if (!dump_path.empty()) {
    // independent accuracy anchor: per-voxel posterior dump (x,y,z,prob,var)
    // with the reference Beta posterior (bgkoctree_node.cpp:27-29,
    // bgkoctree_node.h:60), compared against the JAX map by tests/
    // test_cpp_dump.py within the ≤1e-2 MAE budget (BASELINE.md)
    FILE* f = std::fopen(dump_path.c_str(), "w");
    if (!f) { std::fprintf(stderr, "cannot write %s\n", dump_path.c_str()); return 1; }
    std::fprintf(f, "x,y,z,prob,var\n");
    for (const auto& kv : map.blocks) {
      const float cx = kv.first.x * kBlockSize, cy = kv.first.y * kBlockSize,
                  cz = kv.first.z * kBlockSize;
      for (int vz = 0; vz < kN; ++vz)
        for (int vy = 0; vy < kN; ++vy)
          for (int vx = 0; vx < kN; ++vx) {
            const int v = vx + vy * kN + vz * kN * kN;
            const float A = kv.second.A[v], B = kv.second.B[v];
            const float prob = A / (A + B);
            const float var = (A * B) / ((A + B) * (A + B) * (A + B + 1.0f));
            std::fprintf(f, "%.9g,%.9g,%.9g,%.9g,%.9g\n",
                         cx + (vx - kN / 2 + 0.5f) * kResolution,
                         cy + (vy - kN / 2 + 0.5f) * kResolution,
                         cz + (vz - kN / 2 + 0.5f) * kResolution, prob, var);
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
    std::printf("total: %.3fs (%.3f scans/s), blocks=%zu\n", total, scan_num / total,
                map.blocks.size());
  }
  return 0;
}
