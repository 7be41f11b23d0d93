// potato_native: C++ host runtime for the TPU path tracer.
//
// Native fast paths for the host-side (cold) pipeline, mirroring the
// reference's native Rust implementations:
//   - OBJ parsing + vertex dedup   (reference src/mesh.rs:39-183)
//   - TGA decode/encode            (reference src/image.rs:42-138)
//   - Morton codes + argsort       (accel build, replaces src/bvh.rs sort)
//
// Exposed as a plain C ABI consumed via ctypes (potato_tpu/io/native.py);
// the Python implementations remain as behavioral oracles and fallback.

#include <array>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <charconv>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- OBJ ----

struct ObjResult {
  float* positions;  // (V,3)
  float* normals;    // (V,3)
  float* uvs;        // (V,2)
  int32_t* indices;  // (T,3)
  int64_t num_vertices;
  int64_t num_triangles;
  int32_t error;     // 0 ok, 1 non-triangular face
};

static bool parse_float(const char*& p, const char* end, float& out) {
  while (p < end && (*p == ' ' || *p == '\t')) ++p;
  auto res = std::from_chars(p, end, out);
  if (res.ec != std::errc()) return false;
  p = res.ptr;
  return true;
}

// key for vertex dedup: (v, vt, vn) triple
struct TripleHash {
  size_t operator()(const std::array<int32_t, 3>& k) const {
    uint64_t h = 1469598103934665603ull;
    for (int32_t x : k) {
      h ^= static_cast<uint32_t>(x);
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

ObjResult* obj_parse(const char* text, int64_t len) {
  auto* out = static_cast<ObjResult*>(std::calloc(1, sizeof(ObjResult)));
  std::vector<std::array<float, 3>> positions, normals;
  std::vector<std::array<float, 2>> uvs;
  // corners of parsed faces as (v, vt, vn) triples (-1 = absent)
  std::vector<std::array<int32_t, 3>> corners;
  std::vector<int32_t> face_sizes;

  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t')) ++q;

    auto starts = [&](const char* tag, size_t n) {
      return static_cast<size_t>(line_end - q) > n &&
             memcmp(q, tag, n) == 0 && (q[n] == ' ' || q[n] == '\t');
    };

    if (starts("v", 1)) {
      const char* r = q + 2;
      float x, y, z;
      if (parse_float(r, line_end, x) && parse_float(r, line_end, y) &&
          parse_float(r, line_end, z))
        positions.push_back({x, y, z});
    } else if (starts("vn", 2)) {
      const char* r = q + 3;
      float x, y, z;
      if (parse_float(r, line_end, x) && parse_float(r, line_end, y) &&
          parse_float(r, line_end, z))
        normals.push_back({x, y, z});
    } else if (starts("vt", 2)) {
      const char* r = q + 3;
      float u, v;
      if (parse_float(r, line_end, u) && parse_float(r, line_end, v))
        uvs.push_back({u, v});
    } else if (starts("f", 1)) {
      const char* r = q + 2;
      int n_corners = 0;
      bool ok = true;
      while (r < line_end) {
        while (r < line_end && (*r == ' ' || *r == '\t' || *r == '\r')) ++r;
        if (r >= line_end) break;
        // token: v[/vt][/vn], 1-based (reference src/mesh.rs:59-71)
        int32_t vi = 0, ti = 0, ni = 0;
        auto res = std::from_chars(r, line_end, vi);
        if (res.ec != std::errc()) { ok = false; break; }
        r = res.ptr;
        if (r < line_end && *r == '/') {
          ++r;
          if (r < line_end && *r != '/') {
            res = std::from_chars(r, line_end, ti);
            if (res.ec == std::errc()) r = res.ptr;
          }
          if (r < line_end && *r == '/') {
            ++r;
            res = std::from_chars(r, line_end, ni);
            if (res.ec == std::errc()) r = res.ptr;
          }
        }
        corners.push_back({vi - 1, ti - 1, ni - 1});
        ++n_corners;
      }
      if (!ok) {
        // skip unparsable face lines entirely (reference src/mesh.rs:119)
        corners.resize(corners.size() - n_corners);
      } else if (n_corners > 0) {
        face_sizes.push_back(n_corners);
      }
    }
    p = line_end + 1;
  }

  // dedup identical triples into shared vertices (reference mesh.rs:151-165)
  std::unordered_map<std::array<int32_t, 3>, int32_t, TripleHash> unique;
  std::vector<std::array<float, 3>> out_pos, out_nrm;
  std::vector<std::array<float, 2>> out_uv;
  std::vector<int32_t> out_idx;
  size_t corner_cursor = 0;
  for (int32_t fs : face_sizes) {
    if (fs != 3) {  // triangles only (reference mesh.rs:170-171)
      out->error = 1;
      return out;
    }
    for (int k = 0; k < 3; ++k) {
      const auto& c = corners[corner_cursor++];
      auto it = unique.find(c);
      int32_t idx;
      if (it == unique.end()) {
        idx = static_cast<int32_t>(out_pos.size());
        unique.emplace(c, idx);
        out_pos.push_back(c[0] >= 0 && c[0] < (int32_t)positions.size()
                              ? positions[c[0]]
                              : std::array<float, 3>{0, 0, 0});
        out_nrm.push_back(c[2] >= 0 && c[2] < (int32_t)normals.size()
                              ? normals[c[2]]
                              : std::array<float, 3>{0, 0, 0});
        out_uv.push_back(c[1] >= 0 && c[1] < (int32_t)uvs.size()
                             ? uvs[c[1]]
                             : std::array<float, 2>{0, 0});
      } else {
        idx = it->second;
      }
      out_idx.push_back(idx);
    }
  }

  out->num_vertices = static_cast<int64_t>(out_pos.size());
  out->num_triangles = static_cast<int64_t>(out_idx.size() / 3);
  out->positions = static_cast<float*>(std::malloc(out_pos.size() * 12));
  out->normals = static_cast<float*>(std::malloc(out_nrm.size() * 12));
  out->uvs = static_cast<float*>(std::malloc(out_uv.size() * 8));
  out->indices = static_cast<int32_t*>(std::malloc(out_idx.size() * 4));
  if (!out_pos.empty()) {
    memcpy(out->positions, out_pos.data(), out_pos.size() * 12);
    memcpy(out->normals, out_nrm.data(), out_nrm.size() * 12);
    memcpy(out->uvs, out_uv.data(), out_uv.size() * 8);
  }
  if (!out_idx.empty()) memcpy(out->indices, out_idx.data(), out_idx.size() * 4);
  return out;
}

void obj_free(ObjResult* r) {
  if (!r) return;
  std::free(r->positions);
  std::free(r->normals);
  std::free(r->uvs);
  std::free(r->indices);
  std::free(r);
}

// ---------------------------------------------------------------- TGA ----

// Decode uncompressed true-color TGA (24/32 bpp) into RGBA.
// Returns 0 on success; out buffer must hold width*height*4 bytes
// (query dims first with tga_dims). Honors the vertical-flip bit the same
// way as the reference (src/image.rs:95-99).
int32_t tga_dims(const uint8_t* data, int64_t len, int32_t* w, int32_t* h) {
  if (len < 18) return 1;
  if (data[0] != 0 || data[1] != 0 || data[2] != 2) return 2;
  uint8_t bpp = data[16];
  if (bpp != 24 && bpp != 32) return 3;
  *w = data[12] | (data[13] << 8);
  *h = data[14] | (data[15] << 8);
  return 0;
}

int32_t tga_decode(const uint8_t* data, int64_t len, uint8_t* out_rgba) {
  int32_t w, h;
  int32_t rc = tga_dims(data, len, &w, &h);
  if (rc != 0) return rc;
  uint8_t bpp = data[16];
  int ch = bpp / 8;
  bool flip = (data[17] & 0x20) != 0;
  if (len < 18 + (int64_t)w * h * ch) return 4;
  const uint8_t* px = data + 18;
  for (int64_t j = 0; j < h; ++j) {
    int64_t src_row = j;
    int64_t dst_row = flip ? (h - 1 - j) : j;
    const uint8_t* s = px + src_row * w * ch;
    uint8_t* d = out_rgba + dst_row * w * 4;
    for (int64_t i = 0; i < w; ++i) {
      d[4 * i + 0] = s[ch * i + 2];
      d[4 * i + 1] = s[ch * i + 1];
      d[4 * i + 2] = s[ch * i + 0];
      d[4 * i + 3] = ch == 4 ? s[ch * i + 3] : 255;
    }
  }
  return 0;
}

// Encode RGBA -> 32bpp BGRA TGA (header layout as reference image.rs:116-137).
// out must hold 18 + w*h*4 bytes.
void tga_encode(const uint8_t* rgba, int32_t w, int32_t h, uint8_t* out) {
  memset(out, 0, 18);
  out[2] = 2;
  out[12] = w & 0xFF; out[13] = (w >> 8) & 0xFF;
  out[14] = h & 0xFF; out[15] = (h >> 8) & 0xFF;
  out[16] = 32;
  uint8_t* d = out + 18;
  for (int64_t k = 0; k < (int64_t)w * h; ++k) {
    d[4 * k + 0] = rgba[4 * k + 2];
    d[4 * k + 1] = rgba[4 * k + 1];
    d[4 * k + 2] = rgba[4 * k + 0];
    d[4 * k + 3] = rgba[4 * k + 3];
  }
}

// -------------------------------------------------------------- Morton ----

static inline uint32_t spread3(uint32_t x) {
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

// 30-bit Morton codes over the bbox of `points` (n,3), then a stable
// argsort of the codes written to `order` (n). Radix sort, O(n).
void morton_argsort(const float* points, int64_t n, uint32_t* order) {
  if (n <= 0) return;
  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 1; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], points[3 * i + k]);
      hi[k] = std::max(hi[k], points[3 * i + k]);
    }
  std::vector<uint32_t> codes(n);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      float ext = std::max(hi[k] - lo[k], 1e-12f);
      float t = (points[3 * i + k] - lo[k]) / ext * 1024.0f;
      q[k] = (uint32_t)std::min(std::max(t, 0.0f), 1023.0f);
    }
    codes[i] = (spread3(q[0]) << 2) | (spread3(q[1]) << 1) | spread3(q[2]);
  }
  // LSD radix sort on 30-bit codes, 3 passes of 10 bits (stable)
  std::vector<uint32_t> idx(n), tmp(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = (uint32_t)i;
  for (int pass = 0; pass < 3; ++pass) {
    uint32_t shift = pass * 10;
    uint32_t count[1025] = {0};
    for (int64_t i = 0; i < n; ++i)
      ++count[((codes[idx[i]] >> shift) & 1023) + 1];
    for (int b = 0; b < 1024; ++b) count[b + 1] += count[b];
    for (int64_t i = 0; i < n; ++i)
      tmp[count[(codes[idx[i]] >> shift) & 1023]++] = idx[i];
    idx.swap(tmp);
  }
  memcpy(order, idx.data(), n * 4);
}

}  // extern "C"
