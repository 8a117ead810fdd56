// Native SDF baker: grid-pruned exact point-triangle distance + fast
// (Barnes-Hut dipole) generalized winding number for the sign.
//
// Parity: AssetPipeline/SceneSDF.cpp bakes with 225 rays/voxel x uniform-
// grid DDA (distance approximated by ray hits, sign by backface majority).
// The Python rebuild (assets/sdf_bake.py) computes the EXACT quantity both
// approximate — point-triangle distance + winding-number sign — but its
// dense (voxels x triangles) numpy evaluation cannot bake Sponza-class
// meshes (260k tris) at full 64^3 resolution. This native version keeps
// the exact math and prunes:
//   - distance: uniform triangle grid + expanding Chebyshev shell search,
//     exact within the clamp radius (distances past the s8 quantization
//     clamp never matter);
//   - sign: Jacobson et al.-style hierarchical winding number (octree of
//     area vectors, far-field dipole approximation, exact van Oosterom-
//     Strackee solid angles near).
//
// Build: g++ -O3 -shared -fPIC (driven by plainrenderer_tpu/native).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float len(V3 a) { return std::sqrt(dot(a, a)); }
static inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// iquilezles exact point-triangle squared distance (the same math as
// assets/sdf_bake._sdf_block, SceneSDF.cpp:55-95 structure)
static float tri_dist2(V3 p, V3 a, V3 b, V3 c) {
  V3 ba = sub(b, a), cb = sub(c, b), ac = sub(a, c);
  V3 pa = sub(p, a), pb = sub(p, b), pc = sub(p, c);
  V3 nor = cross(ba, ac);
  float s1 = dot(cross(ba, nor), pa) >= 0.f ? 1.f : -1.f;
  float s2 = dot(cross(cb, nor), pb) >= 0.f ? 1.f : -1.f;
  float s3 = dot(cross(ac, nor), pc) >= 0.f ? 1.f : -1.f;
  if (s1 + s2 + s3 < 2.f) {
    auto seg = [](V3 rel, V3 edge) {
      float t = clampf(dot(rel, edge) / std::max(dot(edge, edge), 1e-20f),
                       0.f, 1.f);
      V3 d = sub(rel, mul(edge, t));
      return dot(d, d);
    };
    return std::min(std::min(seg(pa, ba), seg(pb, cb)), seg(pc, ac));
  }
  float dn = dot(nor, pa);
  return dn * dn / std::max(dot(nor, nor), 1e-20f);
}

// ---- hierarchical winding number -----------------------------------------

struct Node {
  V3 bb_min, bb_max;     // spatial bounds of contained triangle vertices
  V3 centroid;           // area-weighted centroid
  V3 area_vec;           // sum of 0.5 * cross (oriented area vectors)
  float radius;          // bounding radius around centroid
  int first, count;      // triangle range (leaf) in the sorted index array
  int child[8];          // -1 when absent
};

struct WindingTree {
  std::vector<Node> nodes;
  std::vector<int> tri_order;
  const float* verts;
  const int* tris;

  V3 tv(int t, int k) const {
    const int* idx = tris + 3 * t;
    const float* v = verts + 3 * idx[k];
    return {v[0], v[1], v[2]};
  }

  int build(std::vector<int>& ids, int depth) {
    Node n;
    n.bb_min = {1e30f, 1e30f, 1e30f};
    n.bb_max = {-1e30f, -1e30f, -1e30f};
    V3 awc = {0, 0, 0};
    n.area_vec = {0, 0, 0};
    float atotal = 0.f;
    for (int t : ids) {
      V3 a = tv(t, 0), b = tv(t, 1), c = tv(t, 2);
      V3 av = mul(cross(sub(b, a), sub(c, a)), 0.5f);
      float area = len(av) + 1e-20f;
      V3 cen = mul(add(add(a, b), c), 1.f / 3.f);
      awc = add(awc, mul(cen, area));
      atotal += area;
      n.area_vec = add(n.area_vec, av);
      for (V3 q : {a, b, c}) {
        n.bb_min.x = std::min(n.bb_min.x, q.x);
        n.bb_min.y = std::min(n.bb_min.y, q.y);
        n.bb_min.z = std::min(n.bb_min.z, q.z);
        n.bb_max.x = std::max(n.bb_max.x, q.x);
        n.bb_max.y = std::max(n.bb_max.y, q.y);
        n.bb_max.z = std::max(n.bb_max.z, q.z);
      }
    }
    n.centroid = atotal > 0 ? mul(awc, 1.f / atotal)
                            : mul(add(n.bb_min, n.bb_max), 0.5f);
    float r2 = 0.f;
    for (int t : ids)
      for (int k = 0; k < 3; ++k) {
        V3 d = sub(tv(t, k), n.centroid);
        r2 = std::max(r2, dot(d, d));
      }
    n.radius = std::sqrt(r2);
    for (int k = 0; k < 8; ++k) n.child[k] = -1;
    n.first = -1;
    n.count = (int)ids.size();

    int self = (int)nodes.size();
    nodes.push_back(n);
    if ((int)ids.size() <= 4 || depth > 24) {
      nodes[self].first = (int)tri_order.size();
      for (int t : ids) tri_order.push_back(t);
      return self;
    }
    V3 mid = mul(add(n.bb_min, n.bb_max), 0.5f);
    std::vector<int> buckets[8];
    for (int t : ids) {
      V3 cen = mul(add(add(tv(t, 0), tv(t, 1)), tv(t, 2)), 1.f / 3.f);
      int oct = (cen.x > mid.x) | ((cen.y > mid.y) << 1)
                | ((cen.z > mid.z) << 2);
      buckets[oct].push_back(t);
    }
    // degenerate split (all in one octant): make a leaf
    int nonempty = 0;
    for (auto& bkt : buckets) nonempty += !bkt.empty();
    if (nonempty <= 1) {
      nodes[self].first = (int)tri_order.size();
      for (int t : ids) tri_order.push_back(t);
      return self;
    }
    ids.clear();
    ids.shrink_to_fit();
    for (int k = 0; k < 8; ++k)
      if (!buckets[k].empty())
        nodes[self].child[k] = build(buckets[k], depth + 1);
    return self;
  }

  double solid_angle(V3 p, int t) const {
    V3 ra = sub(tv(t, 0), p), rb = sub(tv(t, 1), p), rc = sub(tv(t, 2), p);
    double la = len(ra), lb = len(rb), lc = len(rc);
    double num = dot(ra, cross(rb, rc));
    double den = la * lb * lc + dot(ra, rb) * lc + dot(rb, rc) * la
                 + dot(rc, ra) * lb;
    return 2.0 * std::atan2(num, den);
  }

  double eval(V3 p, int ni) const {
    const Node& n = nodes[ni];
    V3 d = sub(n.centroid, p);
    float dist = len(d);
    if (dist > 1.6f * n.radius + 1e-6f) {
      // far field: dipole approximation (Jacobson et al. fast winding)
      float inv3 = 1.0f / (dist * dist * dist);
      return dot(n.area_vec, d) * inv3;  // Omega approx (sans 4pi factor
                                         // cancellation: exact term below
                                         // also returns raw solid angle)
    }
    if (n.first >= 0) {
      double w = 0.0;
      for (int k = 0; k < n.count; ++k) w += solid_angle(p, tri_order[n.first + k]);
      return w;
    }
    double w = 0.0;
    for (int k = 0; k < 8; ++k)
      if (n.child[k] >= 0) w += eval(p, n.child[k]);
    return w;
  }
};

}  // namespace

extern "C" int bake_sdf(const float* verts, int n_verts, const int* tris,
                        int n_tris, const float* bb, int rx, int ry, int rz,
                        float max_dist, float* out) {
  (void)n_verts;
  if (n_tris <= 0 || rx <= 0 || ry <= 0 || rz <= 0) return 1;
  V3 bb_min = {bb[0], bb[1], bb[2]};
  V3 bb_max = {bb[3], bb[4], bb[5]};
  V3 ext = sub(bb_max, bb_min);
  V3 vox = {ext.x / rx, ext.y / ry, ext.z / rz};

  // ---- uniform triangle grid: CUBIC world-space cells, decoupled from
  // the (possibly anisotropic) bake grid, so the Chebyshev shell lower
  // bound (r-1)*cell stays tight on thin meshes ----
  float cell = std::max(vox.x, std::max(vox.y, vox.z));
  int gx = std::max(1, (int)std::ceil(ext.x / cell));
  int gy = std::max(1, (int)std::ceil(ext.y / cell));
  int gz = std::max(1, (int)std::ceil(ext.z / cell));
  auto cell_of = [&](float v, float lo, int n) {
    int c = (int)std::floor((v - lo) / cell);
    return std::max(0, std::min(n - 1, c));
  };
  std::vector<int> counts((size_t)gx * gy * gz + 1, 0);
  auto tri_cells = [&](int t, auto&& fn) {
    const int* idx = tris + 3 * t;
    V3 a = {verts[3 * idx[0]], verts[3 * idx[0] + 1], verts[3 * idx[0] + 2]};
    V3 b = {verts[3 * idx[1]], verts[3 * idx[1] + 1], verts[3 * idx[1] + 2]};
    V3 c = {verts[3 * idx[2]], verts[3 * idx[2] + 1], verts[3 * idx[2] + 2]};
    int x0 = cell_of(std::min(a.x, std::min(b.x, c.x)), bb_min.x, gx);
    int x1 = cell_of(std::max(a.x, std::max(b.x, c.x)), bb_min.x, gx);
    int y0 = cell_of(std::min(a.y, std::min(b.y, c.y)), bb_min.y, gy);
    int y1 = cell_of(std::max(a.y, std::max(b.y, c.y)), bb_min.y, gy);
    int z0 = cell_of(std::min(a.z, std::min(b.z, c.z)), bb_min.z, gz);
    int z1 = cell_of(std::max(a.z, std::max(b.z, c.z)), bb_min.z, gz);
    for (int z = z0; z <= z1; ++z)
      for (int y = y0; y <= y1; ++y)
        for (int x = x0; x <= x1; ++x)
          fn(((size_t)z * gy + y) * gx + x);
  };
  for (int t = 0; t < n_tris; ++t)
    tri_cells(t, [&](size_t c_) { counts[c_ + 1]++; });
  for (size_t i = 1; i < counts.size(); ++i) counts[i] += counts[i - 1];
  std::vector<int> items(counts.back());
  {
    std::vector<int> cursor(counts.begin(), counts.end() - 1);
    for (int t = 0; t < n_tris; ++t)
      tri_cells(t, [&](size_t c_) { items[cursor[c_]++] = t; });
  }

  // ---- winding tree ----
  WindingTree wt;
  wt.verts = verts;
  wt.tris = tris;
  {
    std::vector<int> ids(n_tris);
    for (int t = 0; t < n_tris; ++t) ids[t] = t;
    wt.nodes.reserve((size_t)n_tris / 4 + 64);
    wt.build(ids, 0);
  }

  const float four_pi = 4.0f * 3.14159265358979f;
  int rmax = (int)std::ceil(max_dist / cell) + 1;
  std::vector<int> stamp(n_tris, -1);  // dedupe: tris appear in many cells
  int voxel_serial = 0;

  for (int z = 0; z < rz; ++z) {
    float pz = bb_min.z + (z + 0.5f) * vox.z;
    for (int y = 0; y < ry; ++y) {
      float py = bb_min.y + (y + 0.5f) * vox.y;
      for (int x = 0; x < rx; ++x) {
        V3 p = {bb_min.x + (x + 0.5f) * vox.x, py, pz};
        ++voxel_serial;
        // the voxel's cell in TRIANGLE-GRID coords (cubic cells)
        int cxg = cell_of(p.x, bb_min.x, gx);
        int cyg = cell_of(p.y, bb_min.y, gy);
        int czg = cell_of(p.z, bb_min.z, gz);
        // expanding Chebyshev shells; keep scanning until the shell's
        // minimum possible distance exceeds the best found
        float best2 = max_dist * max_dist;
        bool found = false;
        for (int r = 0; r <= rmax; ++r) {
          float shell_min = (r - 1) * cell;  // lower bound for shell r
          if (found && shell_min * shell_min > best2) break;
          if (shell_min > max_dist) break;
          // the whole grid was inside the previous shell: nothing new
          if (r > 1 && czg - (r - 1) <= 0 && czg + (r - 1) >= gz - 1
              && cyg - (r - 1) <= 0 && cyg + (r - 1) >= gy - 1
              && cxg - (r - 1) <= 0 && cxg + (r - 1) >= gx - 1)
            break;
          int zl = std::max(0, czg - r), zh = std::min(gz - 1, czg + r);
          int yl = std::max(0, cyg - r), yh = std::min(gy - 1, cyg + r);
          int xl = std::max(0, cxg - r), xh = std::min(gx - 1, cxg + r);
          auto process_cell = [&](int cz, int cy, int cx) {
            size_t c_ = ((size_t)cz * gy + cy) * gx + cx;
            for (int k = counts[c_]; k < counts[c_ + 1]; ++k) {
              int t = items[k];
              if (stamp[t] == voxel_serial) continue;
              stamp[t] = voxel_serial;
              const int* idx = tris + 3 * t;
              V3 a = {verts[3 * idx[0]], verts[3 * idx[0] + 1],
                      verts[3 * idx[0] + 2]};
              V3 b = {verts[3 * idx[1]], verts[3 * idx[1] + 1],
                      verts[3 * idx[1] + 2]};
              V3 c = {verts[3 * idx[2]], verts[3 * idx[2] + 1],
                      verts[3 * idx[2] + 2]};
              float d2 = tri_dist2(p, a, b, c);
              if (d2 < best2) {
                best2 = d2;
                found = true;
              }
            }
          };
          for (int cz = zl; cz <= zh; ++cz) {
            bool zface = (cz == czg - r) || (cz == czg + r);
            for (int cy = yl; cy <= yh; ++cy) {
              bool yface = (cy == cyg - r) || (cy == cyg + r);
              if (r == 0 || zface || yface) {
                for (int cx = xl; cx <= xh; ++cx)
                  process_cell(cz, cy, cx);
              } else {
                // shell interior row: only the two x-faces belong to it
                if (cxg - r >= 0) process_cell(cz, cy, cxg - r);
                if (cxg + r <= gx - 1) process_cell(cz, cy, cxg + r);
              }
            }
          }
        }
        float dist = std::sqrt(best2);
        float w = (float)(wt.eval(p, 0)) / four_pi;
        float sgn = (std::fabs(w) > 0.5f) ? -1.f : 1.f;
        out[((size_t)z * ry + y) * rx + x] = sgn * dist;
      }
    }
  }
  return 0;
}
