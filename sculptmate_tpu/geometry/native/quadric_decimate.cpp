// Quadric edge-collapse mesh decimation (Garland-Heckbert quadrics with a
// threshold-sweep schedule), the native counterpart of the reference's
// offline decimator (mesh_simplify.py: SymetricMatrix quadrics, edge-collapse
// loop with threshold 1e-9*(iter+3)^aggressiveness, flip prevention, boundary
// detection, compaction) and of gpytoolbox.decimate's role in the live SF3D
// path (sf3d/models/mesh.py:195-199).
//
// Sequential edge-collapse is inherently ordered work, which is why this
// lives in host C++ rather than XLA. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC quadric_decimate.cpp -o libquadric_decimate.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct SymMat {
  // symmetric 4x4, 10 coefficients
  double m[10];
  SymMat() { std::memset(m, 0, sizeof(m)); }
  SymMat(double a, double b, double c, double d) {
    m[0] = a * a; m[1] = a * b; m[2] = a * c; m[3] = a * d;
    m[4] = b * b; m[5] = b * c; m[6] = b * d;
    m[7] = c * c; m[8] = c * d;
    m[9] = d * d;
  }
  SymMat operator+(const SymMat& o) const {
    SymMat r;
    for (int i = 0; i < 10; i++) r.m[i] = m[i] + o.m[i];
    return r;
  }
  void operator+=(const SymMat& o) {
    for (int i = 0; i < 10; i++) m[i] += o.m[i];
  }
  double det(int a11, int a12, int a13, int a21, int a22, int a23, int a31,
             int a32, int a33) const {
    return m[a11] * m[a22] * m[a33] + m[a13] * m[a21] * m[a32] +
           m[a12] * m[a23] * m[a31] - m[a13] * m[a22] * m[a31] -
           m[a11] * m[a23] * m[a32] - m[a12] * m[a21] * m[a33];
  }
};

struct Vec3 {
  double x, y, z;
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  double norm() const { return std::sqrt(x * x + y * y + z * z); }
  Vec3 normalized() const {
    double n = norm();
    return n > 1e-30 ? Vec3{x / n, y / n, z / n} : Vec3{0, 0, 0};
  }
};

struct Triangle {
  int v[3];
  double err[4];
  bool deleted, dirty;
  Vec3 n;
};

struct Vertex {
  Vec3 p;
  int tstart, tcount;
  SymMat q;
  bool border;
};

struct VRef {
  int tid, tvertex;
};

struct Simplifier {
  std::vector<Triangle> triangles;
  std::vector<Vertex> vertices;
  std::vector<VRef> refs;

  double vertex_error(const SymMat& q, double x, double y, double z) const {
    return q.m[0] * x * x + 2 * q.m[1] * x * y + 2 * q.m[2] * x * z +
           2 * q.m[3] * x + q.m[4] * y * y + 2 * q.m[5] * y * z +
           2 * q.m[6] * y + q.m[7] * z * z + 2 * q.m[8] * z + q.m[9];
  }

  double calculate_error(int id_v1, int id_v2, Vec3& p_result) const {
    SymMat q = vertices[id_v1].q + vertices[id_v2].q;
    bool border = vertices[id_v1].border && vertices[id_v2].border;
    double error;
    double det = q.det(0, 1, 2, 1, 4, 5, 2, 5, 7);
    if (det != 0 && !border) {
      p_result.x = -1.0 / det * q.det(1, 2, 3, 4, 5, 6, 5, 7, 8);
      p_result.y = 1.0 / det * q.det(0, 2, 3, 1, 5, 6, 2, 7, 8);
      p_result.z = -1.0 / det * q.det(0, 1, 3, 1, 4, 6, 2, 5, 8);
      error = vertex_error(q, p_result.x, p_result.y, p_result.z);
    } else {
      const Vec3& p1 = vertices[id_v1].p;
      const Vec3& p2 = vertices[id_v2].p;
      Vec3 p3 = (p1 + p2) * 0.5;
      double e1 = vertex_error(q, p1.x, p1.y, p1.z);
      double e2 = vertex_error(q, p2.x, p2.y, p2.z);
      double e3 = vertex_error(q, p3.x, p3.y, p3.z);
      error = std::fmin(e1, std::fmin(e2, e3));
      if (error == e1) p_result = p1;
      else if (error == e2) p_result = p2;
      else p_result = p3;
    }
    return error;
  }

  bool flipped(const Vec3& p, int i1, const Vertex& v0,
               std::vector<bool>& deleted) const {
    for (int k = 0; k < v0.tcount; k++) {
      const Triangle& t = triangles[refs[v0.tstart + k].tid];
      if (t.deleted) continue;
      int s = refs[v0.tstart + k].tvertex;
      int id1 = t.v[(s + 1) % 3];
      int id2 = t.v[(s + 2) % 3];
      if (id1 == i1 || id2 == i1) {  // face collapses onto the edge
        deleted[k] = true;
        continue;
      }
      Vec3 d1 = (vertices[id1].p - p).normalized();
      Vec3 d2 = (vertices[id2].p - p).normalized();
      if (std::fabs(d1.dot(d2)) > 0.999) return true;  // degenerate sliver
      Vec3 n = d1.cross(d2).normalized();
      deleted[k] = false;
      if (n.dot(t.n) < 0.2) return true;  // normal flip
    }
    return false;
  }

  void update_triangles(int i0, const Vertex& v, const std::vector<bool>& deleted,
                        int& deleted_triangles) {
    Vec3 p;
    for (int k = 0; k < v.tcount; k++) {
      VRef r = refs[v.tstart + k];
      Triangle& t = triangles[r.tid];
      if (t.deleted) continue;
      if (deleted[k]) {
        t.deleted = true;
        deleted_triangles++;
        continue;
      }
      t.v[r.tvertex] = i0;
      t.dirty = true;
      t.err[0] = calculate_error(t.v[0], t.v[1], p);
      t.err[1] = calculate_error(t.v[1], t.v[2], p);
      t.err[2] = calculate_error(t.v[2], t.v[0], p);
      t.err[3] = std::fmin(t.err[0], std::fmin(t.err[1], t.err[2]));
      refs.push_back(r);
    }
  }

  void update_mesh(int iteration) {
    if (iteration > 0) {  // compact triangle list
      size_t dst = 0;
      for (size_t i = 0; i < triangles.size(); i++)
        if (!triangles[i].deleted) triangles[dst++] = triangles[i];
      triangles.resize(dst);
    }

    if (iteration == 0) {
      for (auto& v : vertices) v.q = SymMat();
      for (auto& t : triangles) {
        Vec3 p[3] = {vertices[t.v[0]].p, vertices[t.v[1]].p, vertices[t.v[2]].p};
        Vec3 n = (p[1] - p[0]).cross(p[2] - p[0]).normalized();
        t.n = n;
        SymMat plane(n.x, n.y, n.z, -n.dot(p[0]));
        for (int j = 0; j < 3; j++) vertices[t.v[j]].q += plane;
      }
      Vec3 p;
      for (auto& t : triangles) {
        for (int j = 0; j < 3; j++)
          t.err[j] = calculate_error(t.v[j], t.v[(j + 1) % 3], p);
        t.err[3] = std::fmin(t.err[0], std::fmin(t.err[1], t.err[2]));
      }
    }

    // rebuild refs
    for (auto& v : vertices) { v.tstart = 0; v.tcount = 0; }
    for (auto& t : triangles)
      for (int j = 0; j < 3; j++) vertices[t.v[j]].tcount++;
    int tstart = 0;
    for (auto& v : vertices) { v.tstart = tstart; tstart += v.tcount; v.tcount = 0; }
    refs.resize(triangles.size() * 3);
    for (size_t i = 0; i < triangles.size(); i++) {
      const Triangle& t = triangles[i];
      for (int j = 0; j < 3; j++) {
        Vertex& v = vertices[t.v[j]];
        refs[v.tstart + v.tcount] = {(int)i, j};
        v.tcount++;
      }
    }

    if (iteration == 0) {  // border detection
      std::vector<int> vcount, vids;
      for (auto& v : vertices) v.border = false;
      for (size_t i = 0; i < vertices.size(); i++) {
        Vertex& v = vertices[i];
        vcount.clear();
        vids.clear();
        for (int j = 0; j < v.tcount; j++) {
          const Triangle& t = triangles[refs[v.tstart + j].tid];
          for (int k = 0; k < 3; k++) {
            int id = t.v[k];
            if (id == (int)i) continue;
            size_t ofs = 0;
            for (; ofs < vcount.size(); ofs++)
              if (vids[ofs] == id) break;
            if (ofs == vcount.size()) { vcount.push_back(1); vids.push_back(id); }
            else vcount[ofs]++;
          }
        }
        for (size_t j = 0; j < vcount.size(); j++)
          if (vcount[j] == 1) vertices[vids[j]].border = true;
      }
    }
  }

  void simplify(int target_count, double aggressiveness) {
    for (auto& t : triangles) { t.deleted = false; t.dirty = false; }
    int deleted_triangles = 0;
    std::vector<bool> deleted0, deleted1;
    int triangle_count = (int)triangles.size();

    for (int iteration = 0; iteration < 100; iteration++) {
      if (triangle_count - deleted_triangles <= target_count) break;
      update_mesh(iteration);
      for (auto& t : triangles) t.dirty = false;

      double threshold = 1e-9 * std::pow(double(iteration + 3), aggressiveness);

      for (size_t ti = 0; ti < triangles.size(); ti++) {
        Triangle& t = triangles[ti];
        if (t.err[3] > threshold || t.deleted || t.dirty) continue;
        for (int j = 0; j < 3; j++) {
          if (t.err[j] >= threshold) continue;
          int i0 = t.v[j];
          int i1 = t.v[(j + 1) % 3];
          Vertex& v0 = vertices[i0];
          Vertex& v1 = vertices[i1];
          if (v0.border != v1.border) continue;

          Vec3 p;
          calculate_error(i0, i1, p);
          deleted0.resize(v0.tcount);
          deleted1.resize(v1.tcount);
          if (flipped(p, i1, v0, deleted0)) continue;
          if (flipped(p, i0, v1, deleted1)) continue;

          v0.p = p;
          v0.q += v1.q;
          int tstart = (int)refs.size();
          update_triangles(i0, v0, deleted0, deleted_triangles);
          update_triangles(i0, v1, deleted1, deleted_triangles);
          int tcount = (int)refs.size() - tstart;
          v0.tstart = tstart;
          v0.tcount = tcount;
          break;
        }
        if (triangle_count - deleted_triangles <= target_count) break;
      }
    }
    // final compaction of vertices + triangles
    compact();
  }

  void compact() {
    std::vector<int> vmap(vertices.size(), -1);
    size_t dst = 0;
    for (size_t i = 0; i < triangles.size(); i++)
      if (!triangles[i].deleted) triangles[dst++] = triangles[i];
    triangles.resize(dst);
    int next = 0;
    for (auto& t : triangles)
      for (int j = 0; j < 3; j++)
        if (vmap[t.v[j]] < 0) vmap[t.v[j]] = next++;
    std::vector<Vertex> nv(next);
    for (size_t i = 0; i < vertices.size(); i++)
      if (vmap[i] >= 0) nv[vmap[i]] = vertices[i];
    for (auto& t : triangles)
      for (int j = 0; j < 3; j++) t.v[j] = vmap[t.v[j]];
    vertices = std::move(nv);
  }
};

}  // namespace

extern "C" {

// Returns actual output counts via out_nv/out_nf. Output buffers must be
// sized for the input (decimation never grows the mesh).
void quadric_decimate(const float* verts, int64_t nv, const int32_t* faces,
                      int64_t nf, double target_ratio, double aggressiveness,
                      float* out_verts, int64_t* out_nv, int32_t* out_faces,
                      int64_t* out_nf) {
  Simplifier s;
  s.vertices.resize(nv);
  for (int64_t i = 0; i < nv; i++) {
    s.vertices[i].p = {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
  }
  s.triangles.resize(nf);
  for (int64_t i = 0; i < nf; i++) {
    for (int j = 0; j < 3; j++) s.triangles[i].v[j] = faces[3 * i + j];
    s.triangles[i].deleted = false;
    s.triangles[i].dirty = false;
  }
  int target = (int)(nf * target_ratio);
  if (target < 4) target = 4;
  s.simplify(target, aggressiveness);

  *out_nv = (int64_t)s.vertices.size();
  *out_nf = (int64_t)s.triangles.size();
  for (size_t i = 0; i < s.vertices.size(); i++) {
    out_verts[3 * i] = (float)s.vertices[i].p.x;
    out_verts[3 * i + 1] = (float)s.vertices[i].p.y;
    out_verts[3 * i + 2] = (float)s.vertices[i].p.z;
  }
  for (size_t i = 0; i < s.triangles.size(); i++)
    for (int j = 0; j < 3; j++) out_faces[3 * i + j] = s.triangles[i].v[j];
}

}  // extern "C"
