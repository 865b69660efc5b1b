// Host-native asset loaders: Wavefront OBJ meshes and MERL-100 BRDF tables.
//
// TPU-native counterparts of the reference's Assimp-based mesh import
// (src/MeshLoader.cpp:15-97) and MERL binary reader
// (src/BRDFLoader.cpp:15-50), re-implemented without third-party deps.
// Behavioral parity notes:
//   * vertices are re-centered at the mesh centroid (MeshLoader.cpp:50-60);
//   * the v texture coordinate is flipped (v -> 1-v, MeshLoader.cpp:74);
//   * smooth per-vertex normals are generated when the OBJ lacks them
//     (Assimp aiProcess_GenSmoothNormals equivalent);
//   * per-vertex tangents are derived from UVs (aiProcess_CalcTangentSpace
//     equivalent: Lengyel's method, orthogonalized against the normal);
//   * MERL: 3 int32 dims (90*90*180 checked), then 3n float64 -> float32.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "math3.h"

namespace vtrace {
namespace {

struct ObjIndex {
  int v = -1, vt = -1, vn = -1;
  bool operator==(const ObjIndex& o) const {
    return v == o.v && vt == o.vt && vn == o.vn;
  }
};

struct ObjIndexHash {
  size_t operator()(const ObjIndex& k) const {
    return ((size_t)k.v * 73856093u) ^ ((size_t)k.vt * 19349663u) ^
           ((size_t)k.vn * 83492791u);
  }
};

// Parse "v/vt/vn", "v//vn", "v/vt", or "v" (1-based; negatives relative).
ObjIndex parse_corner(const char* s, int nv, int nvt, int nvn) {
  ObjIndex ix;
  int vals[3] = {0, 0, 0};
  int slot = 0;
  const char* p = s;
  while (*p && slot < 3) {
    if (*p == '/') {
      ++slot;
      ++p;
      continue;
    }
    char* end;
    vals[slot] = (int)strtol(p, &end, 10);
    p = end;
  }
  auto fix = [](int i, int n) { return i > 0 ? i - 1 : (i < 0 ? n + i : -1); };
  ix.v = fix(vals[0], nv);
  ix.vt = fix(vals[1], nvt);
  ix.vn = fix(vals[2], nvn);
  return ix;
}

}  // namespace

extern "C" {

// Load an OBJ file: triangulated, indexed, centered at the centroid, with
// normals/tangents/uvs per unique (v,vt,vn) corner. Returns 0 on success.
// All outputs are malloc'd; caller frees with vt_free.
int vt_load_obj(const char* path, float** out_verts, float** out_normals,
                float** out_tangents, float** out_uvs, int* out_n_verts,
                int** out_tris, int* out_n_tris) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  std::vector<V3> pos, nrm;
  std::vector<float> uv;  // pairs
  std::vector<ObjIndex> corners;  // 3 per triangle
  char line[4096];
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      V3 p;
      if (std::sscanf(line + 2, "%f %f %f", &p.x, &p.y, &p.z) == 3)
        pos.push_back(p);
    } else if (line[0] == 'v' && line[1] == 'n') {
      V3 p;
      if (std::sscanf(line + 3, "%f %f %f", &p.x, &p.y, &p.z) == 3)
        nrm.push_back(p);
    } else if (line[0] == 'v' && line[1] == 't') {
      float u = 0, v = 0;
      if (std::sscanf(line + 3, "%f %f", &u, &v) >= 1) {
        uv.push_back(u);
        uv.push_back(v);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      // Triangulate the polygon as a fan.
      std::vector<ObjIndex> poly;
      char* save = nullptr;
      for (char* tok = strtok_r(line + 2, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save)) {
        poly.push_back(parse_corner(tok, (int)pos.size(), (int)(uv.size() / 2),
                                    (int)nrm.size()));
      }
      for (size_t i = 2; i < poly.size(); ++i) {
        corners.push_back(poly[0]);
        corners.push_back(poly[i - 1]);
        corners.push_back(poly[i]);
      }
    }
  }
  std::fclose(f);
  if (pos.empty() || corners.empty()) return 2;

  // Re-center at the centroid of referenced positions (reference behavior).
  V3 centroid{0, 0, 0};
  for (const V3& p : pos) centroid = centroid + p;
  centroid = centroid * (1.f / (float)pos.size());
  for (V3& p : pos) p = p - centroid;

  // Deduplicate (v,vt,vn) corners into unique output vertices.
  std::unordered_map<ObjIndex, int, ObjIndexHash> remap;
  std::vector<int> tri_idx;
  std::vector<ObjIndex> uniq;
  tri_idx.reserve(corners.size());
  for (const ObjIndex& c : corners) {
    auto it = remap.find(c);
    int idx;
    if (it == remap.end()) {
      idx = (int)uniq.size();
      remap.emplace(c, idx);
      uniq.push_back(c);
    } else {
      idx = it->second;
    }
    tri_idx.push_back(idx);
  }
  const int nv = (int)uniq.size();
  const int nt = (int)(tri_idx.size() / 3);

  std::vector<V3> V(nv), N(nv, V3{0, 0, 0}), T(nv, V3{0, 0, 0});
  std::vector<float> UV(2 * nv, 0.f);
  bool any_missing_normal = false;
  for (int i = 0; i < nv; ++i) {
    const ObjIndex& c = uniq[i];
    V[i] = (c.v >= 0 && c.v < (int)pos.size()) ? pos[c.v] : V3{0, 0, 0};
    if (c.vn >= 0 && c.vn < (int)nrm.size())
      N[i] = nrm[c.vn];
    else
      any_missing_normal = true;
    if (c.vt >= 0 && 2 * c.vt + 1 < (int)uv.size()) {
      UV[2 * i] = uv[2 * c.vt];
      UV[2 * i + 1] = 1.f - uv[2 * c.vt + 1];  // reference v-flip
    }
  }

  if (any_missing_normal) {
    // Area-weighted smooth normals over the shared-position graph.
    std::vector<V3> acc(pos.size(), V3{0, 0, 0});
    for (int t = 0; t < nt; ++t) {
      const ObjIndex &a = uniq[tri_idx[3 * t]], &b = uniq[tri_idx[3 * t + 1]],
                     &c = uniq[tri_idx[3 * t + 2]];
      V3 fn = cross(pos[b.v] - pos[a.v], pos[c.v] - pos[a.v]);
      acc[a.v] = acc[a.v] + fn;
      acc[b.v] = acc[b.v] + fn;
      acc[c.v] = acc[c.v] + fn;
    }
    for (int i = 0; i < nv; ++i)
      if (uniq[i].vn < 0) N[i] = normalize(acc[uniq[i].v]);
  }

  // Tangents (Lengyel): accumulate the UV-space u-direction per vertex,
  // then Gram-Schmidt against the normal.
  for (int t = 0; t < nt; ++t) {
    int i0 = tri_idx[3 * t], i1 = tri_idx[3 * t + 1], i2 = tri_idx[3 * t + 2];
    V3 e1 = V[i1] - V[i0], e2 = V[i2] - V[i0];
    float du1 = UV[2 * i1] - UV[2 * i0], dv1 = UV[2 * i1 + 1] - UV[2 * i0 + 1];
    float du2 = UV[2 * i2] - UV[2 * i0], dv2 = UV[2 * i2 + 1] - UV[2 * i0 + 1];
    float det = du1 * dv2 - du2 * dv1;
    V3 tan;
    if (std::fabs(det) > 1e-20f) {
      float r = 1.f / det;
      tan = (e1 * dv2 - e2 * dv1) * r;
    } else {
      tan = e1;  // degenerate UVs: any edge direction
    }
    T[i0] = T[i0] + tan;
    T[i1] = T[i1] + tan;
    T[i2] = T[i2] + tan;
  }
  for (int i = 0; i < nv; ++i) {
    V3 n = N[i];
    V3 t = T[i] - n * dot(n, T[i]);
    float l = length(t);
    if (l > 1e-12f) {
      T[i] = t * (1.f / l);
    } else {
      // Build any frame perpendicular to n.
      V3 h = std::fabs(n.x) < 0.9f ? V3{1, 0, 0} : V3{0, 1, 0};
      T[i] = normalize(cross(h, n));
    }
  }

  auto alloc3 = [&](const std::vector<V3>& src) {
    float* p = (float*)std::malloc(sizeof(float) * 3 * src.size());
    for (size_t i = 0; i < src.size(); ++i) {
      p[3 * i] = src[i].x;
      p[3 * i + 1] = src[i].y;
      p[3 * i + 2] = src[i].z;
    }
    return p;
  };
  *out_verts = alloc3(V);
  *out_normals = alloc3(N);
  *out_tangents = alloc3(T);
  *out_uvs = (float*)std::malloc(sizeof(float) * UV.size());
  std::memcpy(*out_uvs, UV.data(), sizeof(float) * UV.size());
  *out_tris = (int*)std::malloc(sizeof(int) * tri_idx.size());
  std::memcpy(*out_tris, tri_idx.data(), sizeof(int) * tri_idx.size());
  *out_n_verts = nv;
  *out_n_tris = nt;
  return 0;
}

// MERL-100 binary: dims (3 x int32, product must be 90*90*180), then
// 3*n float64 values -> float32 buffer of length 3*n (layout unchanged:
// the three color planes are consecutive, each n long).
int vt_load_merl(const char* path, float** out_data, int* out_n) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  int32_t dims[3];
  if (std::fread(dims, sizeof(int32_t), 3, f) != 3) {
    std::fclose(f);
    return 2;
  }
  int64_t n = (int64_t)dims[0] * dims[1] * dims[2];
  if (n != 90 * 90 * 180) {
    std::fclose(f);
    return 3;
  }
  std::vector<double> raw(3 * n);
  if (std::fread(raw.data(), sizeof(double), raw.size(), f) != raw.size()) {
    std::fclose(f);
    return 4;
  }
  std::fclose(f);
  *out_data = (float*)std::malloc(sizeof(float) * 3 * n);
  for (int64_t i = 0; i < 3 * n; ++i) (*out_data)[i] = (float)raw[i];
  *out_n = (int)n;
  return 0;
}

}  // extern "C"
}  // namespace vtrace
