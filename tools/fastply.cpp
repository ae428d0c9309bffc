// Fast PLY point reader — native C++ replacement for the host-side IO hot
// path (the reference reads .ply via open3d inside DataLoader workers,
// dataset/shapenet.py:94-96).  Parses the vertex element of ascii /
// binary_little_endian / binary_big_endian PLY files and returns xyz as a
// flat float32 buffer.  Exposed via a C ABI for ctypes
// (vn_pointcloudcompletion_tpu/data/fastply_binding.py).
//
// Build: make -C tools   (produces libfastply.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Property {
  std::string name;
  int size;        // bytes
  bool is_float;   // float/double vs integer
  bool is_signed;
};

int type_size(const std::string& t) {
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16") return 2;
  if (t == "int" || t == "int32" || t == "uint" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

bool type_is_float(const std::string& t) {
  return t == "float" || t == "float32" || t == "double" || t == "float64";
}

[[maybe_unused]] uint64_t swap_bytes(const unsigned char* p, int size) {
  uint64_t v = 0;
  for (int i = 0; i < size; ++i) v = (v << 8) | p[i];
  return v;
}

double read_scalar(const unsigned char* p, const Property& prop, bool big_endian) {
  unsigned char buf[8];
  if (big_endian) {
    for (int i = 0; i < prop.size; ++i) buf[i] = p[prop.size - 1 - i];
    p = buf;
  }
  if (prop.is_float) {
    if (prop.size == 4) { float f; std::memcpy(&f, p, 4); return f; }
    double d; std::memcpy(&d, p, 8); return d;
  }
  uint64_t raw = 0;
  std::memcpy(&raw, p, prop.size);
  if (prop.is_signed) {
    switch (prop.size) {
      case 1: return static_cast<int8_t>(raw);
      case 2: return static_cast<int16_t>(raw);
      case 4: return static_cast<int32_t>(raw);
      default: return static_cast<int64_t>(raw);
    }
  }
  return static_cast<double>(raw);
}

}  // namespace

extern "C" {

// Returns a malloc'd float32 buffer of n*3 coordinates (caller frees with
// fastply_free); *out_n receives the vertex count, or <0 on error.
float* fastply_read_points(const char* path, int64_t* out_n) {
  *out_n = -1;
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;

  char line[4096];
  if (!std::fgets(line, sizeof(line), f) || std::strncmp(line, "ply", 3) != 0) {
    std::fclose(f);
    return nullptr;
  }

  std::string format;
  int64_t n_vertices = 0;
  std::vector<Property> props;
  bool in_vertex = false;
  bool header_done = false;
  // guard against unbounded headers
  for (int i = 0; i < 1000 && std::fgets(line, sizeof(line), f); ++i) {
    char a[64] = {0}, b[512] = {0}, c[512] = {0};
    if (std::sscanf(line, "%63s", a) != 1) continue;
    if (std::strcmp(a, "end_header") == 0) { header_done = true; break; }
    if (std::strcmp(a, "format") == 0) {
      std::sscanf(line, "%*s %511s", b);
      format = b;
    } else if (std::strcmp(a, "element") == 0) {
      long long cnt = 0;
      std::sscanf(line, "%*s %511s %lld", b, &cnt);
      in_vertex = std::strcmp(b, "vertex") == 0;
      if (in_vertex) n_vertices = cnt;
    } else if (std::strcmp(a, "property") == 0 && in_vertex) {
      std::sscanf(line, "%*s %511s %511s", b, c);
      if (std::strcmp(b, "list") == 0) { std::fclose(f); return nullptr; }
      Property p;
      p.name = c;
      p.size = type_size(b);
      p.is_float = type_is_float(b);
      p.is_signed = (b[0] != 'u');
      if (p.size < 0) { std::fclose(f); return nullptr; }
      props.push_back(p);
    }
  }
  if (!header_done || n_vertices <= 0) { std::fclose(f); return nullptr; }

  int xi = -1, yi = -1, zi = -1;
  int stride = 0;
  std::vector<int> offsets(props.size());
  for (size_t i = 0; i < props.size(); ++i) {
    offsets[i] = stride;
    stride += props[i].size;
    if (props[i].name == "x") xi = static_cast<int>(i);
    if (props[i].name == "y") yi = static_cast<int>(i);
    if (props[i].name == "z") zi = static_cast<int>(i);
  }
  if (xi < 0 || yi < 0 || zi < 0) { std::fclose(f); return nullptr; }

  float* out = static_cast<float*>(std::malloc(sizeof(float) * 3 * n_vertices));
  if (!out) { std::fclose(f); return nullptr; }

  if (format == "ascii") {
    for (int64_t v = 0; v < n_vertices; ++v) {
      for (size_t i = 0; i < props.size(); ++i) {
        double val = 0;
        if (std::fscanf(f, "%lf", &val) != 1) {
          std::free(out); std::fclose(f); return nullptr;
        }
        if (static_cast<int>(i) == xi) out[v * 3 + 0] = static_cast<float>(val);
        if (static_cast<int>(i) == yi) out[v * 3 + 1] = static_cast<float>(val);
        if (static_cast<int>(i) == zi) out[v * 3 + 2] = static_cast<float>(val);
      }
    }
  } else {
    bool big_endian;
    if (format == "binary_little_endian") big_endian = false;
    else if (format == "binary_big_endian") big_endian = true;
    else { std::free(out); std::fclose(f); return nullptr; }

    std::vector<unsigned char> data(static_cast<size_t>(stride) * n_vertices);
    if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
      std::free(out); std::fclose(f); return nullptr;
    }
    // all three props must be f32: the memcpy covers y and z too, so a
    // double y/z would be silently reinterpreted as garbage floats
    const bool fast_path =
        !big_endian && yi == xi + 1 && zi == xi + 2 &&
        props[xi].is_float && props[xi].size == 4 &&
        props[yi].is_float && props[yi].size == 4 &&
        props[zi].is_float && props[zi].size == 4;
    if (fast_path) {
      const int xoff = offsets[xi];
      for (int64_t v = 0; v < n_vertices; ++v) {
        std::memcpy(out + v * 3, data.data() + v * stride + xoff, 12);
      }
    } else {
      for (int64_t v = 0; v < n_vertices; ++v) {
        const unsigned char* row = data.data() + v * stride;
        out[v * 3 + 0] = static_cast<float>(
            read_scalar(row + offsets[xi], props[xi], big_endian));
        out[v * 3 + 1] = static_cast<float>(
            read_scalar(row + offsets[yi], props[yi], big_endian));
        out[v * 3 + 2] = static_cast<float>(
            read_scalar(row + offsets[zi], props[zi], big_endian));
      }
    }
  }
  std::fclose(f);
  *out_n = n_vertices;
  return out;
}

void fastply_free(float* p) { std::free(p); }

}  // extern "C"
