// Native OBJ mesh loader (data-loader component).
//
// The reference parses meshes natively too (reference:
// mitsuba/src/shapes/obj.cpp — Wavefront OBJ with v/vn/vt indices and
// polygon triangulation); the framework's Python loader
// (sdmm_tpu/scene/shapes.py load_obj) is the fallback and correctness
// oracle. This library parses straight into flat per-triangle arrays
// (fan triangulation, negative-index resolution, per-face normals
// computed where vn is absent — the same rule TriSoup.add applies).
//
// C ABI (ctypes; no pybind11 in this image):
//   obj_load(path, &handle, &n_tris)      -> 0 on success
//   obj_copy(handle, v[T*9], n[T*9], uv[T*6])
//   obj_free(handle)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Corner {
  int32_t v, t, n;
};

struct ObjData {
  std::vector<double> tri_v;   // T*9
  std::vector<double> tri_n;   // T*9
  std::vector<double> tri_uv;  // T*6
};

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

inline int32_t resolve(long idx, size_t n) {
  return idx > 0 ? static_cast<int32_t>(idx - 1)
                 : static_cast<int32_t>(static_cast<long>(n) + idx);
}

}  // namespace

extern "C" {

int obj_load(const char* path, void** handle, int64_t* n_tris) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  std::vector<double> vs, vns, vts;
  auto* out = new ObjData();
  std::vector<Corner> face;
  face.reserve(8);

  char line[65536];
  while (std::fgets(line, sizeof(line), f)) {
    const char* p = line;
    if (p[0] == 'v' && p[1] == ' ') {
      p += 2;
      char* e;
      double x = std::strtod(p, &e);
      double y = std::strtod(e, &e);
      double z = std::strtod(e, &e);
      vs.push_back(x);
      vs.push_back(y);
      vs.push_back(z);
    } else if (p[0] == 'v' && p[1] == 'n' && p[2] == ' ') {
      p += 3;
      char* e;
      double x = std::strtod(p, &e);
      double y = std::strtod(e, &e);
      double z = std::strtod(e, &e);
      vns.push_back(x);
      vns.push_back(y);
      vns.push_back(z);
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      p += 3;
      char* e;
      double u = std::strtod(p, &e);
      double v = std::strtod(e, &e);
      vts.push_back(u);
      vts.push_back(v);
    } else if (p[0] == 'f' && p[1] == ' ') {
      p += 2;
      face.clear();
      while (true) {
        p = skip_ws(p);
        if (*p == '\0' || *p == '\n' || *p == '\r' || *p == '#') break;
        char* e;
        long vi = std::strtol(p, &e, 10);
        long ti = 0, ni = 0;
        if (*e == '/') {
          ++e;
          if (*e != '/') ti = std::strtol(e, &e, 10);
          if (*e == '/') ni = std::strtol(e + 1, &e, 10);
        }
        face.push_back({resolve(vi, vs.size() / 3),
                        ti ? resolve(ti, vts.size() / 2) : -1,
                        ni ? resolve(ni, vns.size() / 3) : -1});
        p = e;
      }
      // Fan triangulation (reference: obj.cpp, shapes.py load_obj).
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        const Corner ids[3] = {face[0], face[k], face[k + 1]};
        double pv[9];
        for (int c = 0; c < 3; ++c) {
          const double* src = &vs[3 * ids[c].v];
          pv[3 * c + 0] = src[0];
          pv[3 * c + 1] = src[1];
          pv[3 * c + 2] = src[2];
          out->tri_v.push_back(src[0]);
          out->tri_v.push_back(src[1]);
          out->tri_v.push_back(src[2]);
        }
        bool has_n = ids[0].n >= 0 && ids[1].n >= 0 && ids[2].n >= 0;
        if (has_n) {
          for (int c = 0; c < 3; ++c) {
            const double* src = &vns[3 * ids[c].n];
            out->tri_n.push_back(src[0]);
            out->tri_n.push_back(src[1]);
            out->tri_n.push_back(src[2]);
          }
        } else {
          // Face normal (TriSoup.add's rule for normals=None).
          double e1[3] = {pv[3] - pv[0], pv[4] - pv[1], pv[5] - pv[2]};
          double e2[3] = {pv[6] - pv[0], pv[7] - pv[1], pv[8] - pv[2]};
          double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                         e1[2] * e2[0] - e1[0] * e2[2],
                         e1[0] * e2[1] - e1[1] * e2[0]};
          double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
          len = len > 1e-20 ? len : 1e-20;
          for (int c = 0; c < 3; ++c) {
            out->tri_n.push_back(n[0] / len);
            out->tri_n.push_back(n[1] / len);
            out->tri_n.push_back(n[2] / len);
          }
        }
        bool has_t = ids[0].t >= 0 && ids[1].t >= 0 && ids[2].t >= 0;
        for (int c = 0; c < 3; ++c) {
          if (has_t) {
            const double* src = &vts[2 * ids[c].t];
            out->tri_uv.push_back(src[0]);
            out->tri_uv.push_back(src[1]);
          } else {
            out->tri_uv.push_back(0.0);
            out->tri_uv.push_back(0.0);
          }
        }
      }
    }
  }
  std::fclose(f);
  *handle = out;
  *n_tris = static_cast<int64_t>(out->tri_v.size() / 9);
  return 0;
}

void obj_copy(void* handle, double* v, double* n, double* uv) {
  auto* d = static_cast<ObjData*>(handle);
  std::memcpy(v, d->tri_v.data(), d->tri_v.size() * sizeof(double));
  std::memcpy(n, d->tri_n.data(), d->tri_n.size() * sizeof(double));
  std::memcpy(uv, d->tri_uv.data(), d->tri_uv.size() * sizeof(double));
}

void obj_free(void* handle) { delete static_cast<ObjData*>(handle); }

}  // extern "C"
