// mesh_sampling — offline dataset tool: uniformly sample a point cloud from a
// CAD mesh.  Native C++ replacement for the reference's PCL/VTK binary
// (sample/mesh_sampling.cpp: randomPointTriangle :61-80, uniform_sampling
// :112, voxel-grid downsample :188) without the PCL/VTK dependency stack:
// minimal OBJ/OFF parsers, area-weighted triangle selection, barycentric
// point sampling, optional voxel-grid downsample, binary PLY output.
//
// Usage: mesh_sampling input.(obj|off) output.ply [-n_samples N] [-leaf_size L]
// Build: make -C tools

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

struct V3 {
  double x, y, z;
};

static V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static double norm(V3 a) { return std::sqrt(a.x * a.x + a.y * a.y + a.z * a.z); }

struct Mesh {
  std::vector<V3> verts;
  std::vector<std::array<int, 3>> tris;
};

static bool load_obj(const char* path, Mesh* m) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      V3 v;
      ss >> v.x >> v.y >> v.z;
      m->verts.push_back(v);
    } else if (tag == "f") {
      std::vector<int> idx;
      std::string tok;
      while (ss >> tok) {
        // formats: i, i/j, i/j/k, i//k ; negative = relative
        int i = std::atoi(tok.substr(0, tok.find('/')).c_str());
        if (i < 0) i = static_cast<int>(m->verts.size()) + i + 1;
        idx.push_back(i - 1);
      }
      for (size_t k = 2; k < idx.size(); ++k)  // fan-triangulate
        m->tris.push_back({idx[0], idx[k - 1], idx[k]});
    }
  }
  return !m->verts.empty() && !m->tris.empty();
}

static bool load_off(const char* path, Mesh* m) {
  std::ifstream f(path);
  if (!f) return false;
  std::string magic;
  f >> magic;
  if (magic != "OFF" && magic != "COFF") return false;
  const bool coff = (magic == "COFF");
  long nv = 0, nf = 0, ne = 0;
  f >> nv >> nf >> ne;
  m->verts.resize(nv);
  std::string rest;
  for (long i = 0; i < nv; ++i) {
    f >> m->verts[i].x >> m->verts[i].y >> m->verts[i].z;
    // COFF vertex lines carry per-vertex color after xyz — skip to EOL so
    // the next vertex doesn't parse color fields as coordinates
    if (coff) std::getline(f, rest);
  }
  for (long i = 0; i < nf; ++i) {
    int cnt;
    f >> cnt;
    std::vector<int> idx(cnt);
    for (int k = 0; k < cnt; ++k) f >> idx[k];
    for (int k = 2; k < cnt; ++k) m->tris.push_back({idx[0], idx[k - 1], idx[k]});
  }
  return !m->verts.empty() && !m->tris.empty();
}

// Barycentric sampling matching the reference's randomPointTriangle: sample
// (r1, r2) uniform, p = (1-sqrt(r1)) a + sqrt(r1)(1-r2) b + sqrt(r1) r2 c.
static V3 sample_triangle(const V3& a, const V3& b, const V3& c, double r1,
                          double r2) {
  double s = std::sqrt(r1);
  double wa = 1.0 - s, wb = s * (1.0 - r2), wc = s * r2;
  return {wa * a.x + wb * b.x + wc * c.x,
          wa * a.y + wb * b.y + wc * c.y,
          wa * a.z + wb * b.z + wc * c.z};
}

static std::vector<V3> uniform_sampling(const Mesh& m, size_t n,
                                        std::mt19937_64* rng) {
  std::vector<double> cum(m.tris.size());
  double total = 0;
  for (size_t i = 0; i < m.tris.size(); ++i) {
    const auto& t = m.tris[i];
    total += 0.5 * norm(cross(sub(m.verts[t[1]], m.verts[t[0]]),
                              sub(m.verts[t[2]], m.verts[t[0]])));
    cum[i] = total;
  }
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<V3> out;
  out.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    double r = uni(*rng) * total;
    size_t ti = std::lower_bound(cum.begin(), cum.end(), r) - cum.begin();
    if (ti >= m.tris.size()) ti = m.tris.size() - 1;
    const auto& t = m.tris[ti];
    out.push_back(sample_triangle(m.verts[t[0]], m.verts[t[1]], m.verts[t[2]],
                                  uni(*rng), uni(*rng)));
  }
  return out;
}

// Voxel-grid downsample: one centroid per occupied leaf (reference :188).
static std::vector<V3> voxel_downsample(const std::vector<V3>& pts,
                                        double leaf) {
  struct Acc {
    V3 sum{0, 0, 0};
    long cnt = 0;
  };
  // exact (ix,iy,iz) key with equality — hashing the indices INTO the key
  // would silently merge distinct colliding voxels into bogus centroids
  struct CellKey {
    uint64_t ix, iy, iz;
    bool operator==(const CellKey& o) const {
      return ix == o.ix && iy == o.iy && iz == o.iz;
    }
  };
  struct CellHash {
    size_t operator()(const CellKey& k) const {
      return static_cast<size_t>((k.ix * 73856093ULL) ^ (k.iy * 19349663ULL) ^
                                 (k.iz * 83492791ULL));
    }
  };
  std::unordered_map<CellKey, Acc, CellHash> cells;
  V3 lo = pts[0];
  for (const auto& p : pts) {
    lo.x = std::min(lo.x, p.x);
    lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
  }
  for (const auto& p : pts) {
    CellKey key{static_cast<uint64_t>((p.x - lo.x) / leaf),
                static_cast<uint64_t>((p.y - lo.y) / leaf),
                static_cast<uint64_t>((p.z - lo.z) / leaf)};
    auto& a = cells[key];
    a.sum.x += p.x;
    a.sum.y += p.y;
    a.sum.z += p.z;
    a.cnt++;
  }
  std::vector<V3> out;
  out.reserve(cells.size());
  for (const auto& kv : cells)
    out.push_back({kv.second.sum.x / kv.second.cnt,
                   kv.second.sum.y / kv.second.cnt,
                   kv.second.sum.z / kv.second.cnt});
  return out;
}

static bool write_ply(const char* path, const std::vector<V3>& pts) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  std::fprintf(f,
               "ply\nformat binary_little_endian 1.0\nelement vertex %zu\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n",
               pts.size());
  for (const auto& p : pts) {
    float xyz[3] = {static_cast<float>(p.x), static_cast<float>(p.y),
                    static_cast<float>(p.z)};
    std::fwrite(xyz, sizeof(float), 3, f);
  }
  std::fclose(f);
  return true;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s input.(obj|off) output.ply [-n_samples N]"
                 " [-leaf_size L] [-seed S]\n",
                 argv[0]);
    return 1;
  }
  size_t n_samples = 16384;
  double leaf = 0.0;
  uint64_t seed = 42;
  for (int i = 3; i + 1 < argc; i += 2) {
    if (!std::strcmp(argv[i], "-n_samples")) n_samples = std::strtoull(argv[i + 1], nullptr, 10);
    else if (!std::strcmp(argv[i], "-leaf_size")) leaf = std::atof(argv[i + 1]);
    else if (!std::strcmp(argv[i], "-seed")) seed = std::strtoull(argv[i + 1], nullptr, 10);
  }

  Mesh mesh;
  const char* in = argv[1];
  const char* dot = std::strrchr(in, '.');
  bool ok = false;
  if (dot && (!std::strcmp(dot, ".off") || !std::strcmp(dot, ".OFF")))
    ok = load_off(in, &mesh);
  else
    ok = load_obj(in, &mesh);
  if (!ok) {
    std::fprintf(stderr, "failed to load mesh: %s\n", in);
    return 1;
  }

  std::mt19937_64 rng(seed);
  std::vector<V3> pts = uniform_sampling(mesh, n_samples, &rng);
  if (leaf > 0) pts = voxel_downsample(pts, leaf);
  if (!write_ply(argv[2], pts)) {
    std::fprintf(stderr, "failed to write %s\n", argv[2]);
    return 1;
  }
  std::printf("sampled %zu points from %zu triangles -> %s\n", pts.size(),
              mesh.tris.size(), argv[2]);
  return 0;
}
