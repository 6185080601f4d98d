// tpupt native runtime: host-side heavy lifting in C++ (OBJ parsing, BVH build).
//
// The reference's entire runtime is native Rust: tobj parses OBJ meshes
// (mesh.rs:149-197) and BVH::build runs a full-sweep SAH (bvh.rs:24-120) at scene
// setup, both on the host. This library is the framework's native equivalent —
// the TPU compute path stays jax/XLA, but scene ingestion and acceleration-structure
// construction run here, loaded from Python via ctypes (no pybind11 dependency).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 native.cpp -o libtpupt_native.so
// (done on demand by tpupt/native/__init__.py and cached next to the source).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing (tobj single_index semantics: unified v/vt/vn re-indexing,
// fan triangulation of polygons)
// ---------------------------------------------------------------------------

struct ObjMesh {
  std::vector<float> positions;  // V*3
  std::vector<float> normals;    // V*3 (zeros if absent)
  std::vector<float> uvs;        // V*2 (zeros if absent)
  std::vector<int32_t> indices;  // F*3
  int has_normals = 0;
  int has_uvs = 0;
};

static int resolve_idx(long idx, size_t n) {
  return idx > 0 ? (int)(idx - 1) : (int)((long)n + idx);
}

void* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  std::vector<float> vpos, vnrm, vuv;
  auto* mesh = new ObjMesh();
  // key = (vi, ti, ni) packed
  std::unordered_map<uint64_t, int32_t> remap;
  remap.reserve(1 << 16);
  std::vector<int32_t> face;

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  while (p < end) {
    const char* eol = (const char*)memchr(p, '\n', end - p);
    if (!eol) eol = end;
    if (p[0] == 'v' && p[1] == ' ') {
      char* q = (char*)p + 2;
      float x = strtof(q, &q), y = strtof(q, &q), z = strtof(q, &q);
      vpos.push_back(x); vpos.push_back(y); vpos.push_back(z);
    } else if (p[0] == 'v' && p[1] == 'n' && p[2] == ' ') {
      char* q = (char*)p + 3;
      float x = strtof(q, &q), y = strtof(q, &q), z = strtof(q, &q);
      vnrm.push_back(x); vnrm.push_back(y); vnrm.push_back(z);
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      char* q = (char*)p + 3;
      float u = strtof(q, &q), v = strtof(q, &q);
      vuv.push_back(u); vuv.push_back(v);
    } else if (p[0] == 'f' && p[1] == ' ') {
      face.clear();
      const char* q = p + 2;
      while (q < eol) {
        while (q < eol && *q == ' ') q++;
        if (q >= eol) break;
        char* qq = (char*)q;
        long vi = strtol(qq, &qq, 10);
        long ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        if (*qq == '/') {
          qq++;
          if (*qq != '/') { ti = strtol(qq, &qq, 10); has_t = true; }
          if (*qq == '/') { qq++; ni = strtol(qq, &qq, 10); has_n = true; }
        }
        int v_i = resolve_idx(vi, vpos.size() / 3);
        int t_i = has_t ? resolve_idx(ti, vuv.size() / 2) : -1;
        int n_i = has_n ? resolve_idx(ni, vnrm.size() / 3) : -1;
        uint64_t key = ((uint64_t)(uint32_t)v_i << 42) ^
                       ((uint64_t)(uint32_t)(t_i + 1) << 21) ^
                       (uint64_t)(uint32_t)(n_i + 1);
        auto it = remap.find(key);
        int32_t out;
        if (it == remap.end()) {
          out = (int32_t)(mesh->positions.size() / 3);
          remap.emplace(key, out);
          mesh->positions.push_back(vpos[v_i * 3 + 0]);
          mesh->positions.push_back(vpos[v_i * 3 + 1]);
          mesh->positions.push_back(vpos[v_i * 3 + 2]);
          if (t_i >= 0) {
            mesh->uvs.push_back(vuv[t_i * 2 + 0]);
            mesh->uvs.push_back(vuv[t_i * 2 + 1]);
            mesh->has_uvs = 1;
          } else {
            mesh->uvs.push_back(0.f); mesh->uvs.push_back(0.f);
          }
          if (n_i >= 0) {
            mesh->normals.push_back(vnrm[n_i * 3 + 0]);
            mesh->normals.push_back(vnrm[n_i * 3 + 1]);
            mesh->normals.push_back(vnrm[n_i * 3 + 2]);
            mesh->has_normals = 1;
          } else {
            mesh->normals.push_back(0.f); mesh->normals.push_back(0.f);
            mesh->normals.push_back(0.f);
          }
        } else {
          out = it->second;
        }
        face.push_back(out);
        q = qq;
      }
      for (size_t k = 1; k + 1 < face.size(); k++) {  // fan triangulation
        mesh->indices.push_back(face[0]);
        mesh->indices.push_back(face[k]);
        mesh->indices.push_back(face[k + 1]);
      }
    }
    p = eol + 1;
  }
  return mesh;
}

int64_t obj_num_vertices(void* m) { return ((ObjMesh*)m)->positions.size() / 3; }
int64_t obj_num_faces(void* m) { return ((ObjMesh*)m)->indices.size() / 3; }
int obj_has_normals(void* m) { return ((ObjMesh*)m)->has_normals; }
int obj_has_uvs(void* m) { return ((ObjMesh*)m)->has_uvs; }

void obj_copy(void* m, float* pos, float* nrm, float* uv, int32_t* idx) {
  auto* mesh = (ObjMesh*)m;
  memcpy(pos, mesh->positions.data(), mesh->positions.size() * sizeof(float));
  memcpy(nrm, mesh->normals.data(), mesh->normals.size() * sizeof(float));
  memcpy(uv, mesh->uvs.data(), mesh->uvs.size() * sizeof(float));
  memcpy(idx, mesh->indices.data(), mesh->indices.size() * sizeof(int32_t));
}

void obj_free(void* m) { delete (ObjMesh*)m; }

// ---------------------------------------------------------------------------
// triangle BVH build: Morton sort + balanced pre-order emission with escape
// indices. Bit-identical output to the Python fallback (ops/bvh.py) so either
// can serve scene compilation; this one is the production path for big meshes.
// ---------------------------------------------------------------------------

static uint64_t spread10(uint64_t v) {
  v = (v | (v << 16)) & 0x030000FFull;
  v = (v | (v << 8)) & 0x0300F00Full;
  v = (v | (v << 4)) & 0x030C30C3ull;
  v = (v | (v << 2)) & 0x09249249ull;
  return v;
}

// leaf size must match ops/bvh.py LEAF_SIZE (and bvh.rs:22)
static const int LEAF_SIZE = 4;

struct BvhOut {
  std::vector<int32_t> order;
  std::vector<float> bmin, bmax;  // M*3
  std::vector<int32_t> skip, start, count;
};

static int64_t subtree_nodes(int64_t t) {
  if (t <= LEAF_SIZE) return 1;
  int64_t m = t / 2;
  return 1 + subtree_nodes(m) + subtree_nodes(t - m);
}

void* bvh_build(const float* v0, const float* e1, const float* e2, int64_t n) {
  auto* out = new BvhOut();
  const float pad = 1e-3f;  // aabb.rs:16-21

  std::vector<float> lo(n * 3), hi(n * 3);
  std::vector<double> cen(n * 3);
  double cmin[3] = {1e300, 1e300, 1e300}, cmax[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; i++) {
    for (int c = 0; c < 3; c++) {
      float a = v0[i * 3 + c];
      float b = a + e1[i * 3 + c];
      float d = a + e2[i * 3 + c];
      float l = std::min(a, std::min(b, d)) - pad;
      float h = std::max(a, std::max(b, d)) + pad;
      lo[i * 3 + c] = l;
      hi[i * 3 + c] = h;
      double ce = 0.5 * ((double)l + (double)h);
      cen[i * 3 + c] = ce;
      cmin[c] = std::min(cmin[c], ce);
      cmax[c] = std::max(cmax[c], ce);
    }
  }
  double span[3];
  for (int c = 0; c < 3; c++) span[c] = std::max(cmax[c] - cmin[c], 1e-12);

  std::vector<uint64_t> codes(n);
  for (int64_t i = 0; i < n; i++) {
    uint64_t q[3];
    for (int c = 0; c < 3; c++) {
      double x = (cen[i * 3 + c] - cmin[c]) / span[c];
      long long qi = (long long)(x * 1024.0);
      q[c] = (uint64_t)std::min(std::max(qi, 0ll), 1023ll);
    }
    codes[i] = (spread10(q[0]) << 2) | (spread10(q[1]) << 1) | spread10(q[2]);
  }
  out->order.resize(n);
  for (int64_t i = 0; i < n; i++) out->order[i] = (int32_t)i;
  std::stable_sort(out->order.begin(), out->order.end(),
                   [&](int32_t a, int32_t b) { return codes[a] < codes[b]; });

  std::vector<float> slo(n * 3), shi(n * 3);
  for (int64_t i = 0; i < n; i++) {
    memcpy(&slo[i * 3], &lo[out->order[i] * 3], 3 * sizeof(float));
    memcpy(&shi[i * 3], &hi[out->order[i] * 3], 3 * sizeof(float));
  }

  // pre-order emission with explicit stack (mirrors ops/bvh.py exactly)
  std::vector<std::pair<int64_t, int64_t>> work;
  work.emplace_back(0, n);
  while (!work.empty()) {
    auto [a, b] = work.back();
    work.pop_back();
    float bl[3] = {1e30f, 1e30f, 1e30f}, bh[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = a; i < b; i++)
      for (int c = 0; c < 3; c++) {
        bl[c] = std::min(bl[c], slo[i * 3 + c]);
        bh[c] = std::max(bh[c], shi[i * 3 + c]);
      }
    out->bmin.insert(out->bmin.end(), bl, bl + 3);
    out->bmax.insert(out->bmax.end(), bh, bh + 3);
    if (b - a <= LEAF_SIZE) {
      out->start.push_back((int32_t)a);
      out->count.push_back((int32_t)(b - a));
    } else {
      out->start.push_back(0);
      out->count.push_back(0);
      int64_t mid = (a + b) / 2;
      work.emplace_back(mid, b);
      work.emplace_back(a, mid);
    }
  }

  // skip patch via the same splits
  int64_t m_total = (int64_t)out->count.size();
  out->skip.assign(m_total, 0);
  std::vector<std::pair<int64_t, int64_t>> st;
  st.emplace_back(0, n);
  int64_t cursor = 0;
  while (!st.empty()) {
    auto [a, b] = st.back();
    st.pop_back();
    int64_t t = b - a;
    out->skip[cursor] = (int32_t)(cursor + subtree_nodes(t));
    cursor++;
    if (t > LEAF_SIZE) {
      int64_t mid = (a + b) / 2;
      st.emplace_back(mid, b);
      st.emplace_back(a, mid);
    }
  }
  (void)m_total;
  return out;
}

int64_t bvh_num_nodes(void* h) { return (int64_t)((BvhOut*)h)->count.size(); }

void bvh_copy(void* h, int32_t* order, float* bmin, float* bmax, int32_t* skip,
              int32_t* start, int32_t* count) {
  auto* o = (BvhOut*)h;
  memcpy(order, o->order.data(), o->order.size() * sizeof(int32_t));
  memcpy(bmin, o->bmin.data(), o->bmin.size() * sizeof(float));
  memcpy(bmax, o->bmax.data(), o->bmax.size() * sizeof(float));
  memcpy(skip, o->skip.data(), o->skip.size() * sizeof(int32_t));
  memcpy(start, o->start.data(), o->start.size() * sizeof(int32_t));
  memcpy(count, o->count.data(), o->count.size() * sizeof(int32_t));
}

void bvh_free(void* h) { delete (BvhOut*)h; }

}  // extern "C"
