// Native SAH BVH builder.
//
// C++ twin of scene/bvh.py::build_bvh — the init-time hot spot of the
// pipeline (the reference builds its BVH on the host in Rust,
// main.rs:74-263, with an O(k^2)-per-node sweep; SURVEY.md section 3.1
// flags eval_sah as the init hot spot). This implementation keeps the
// exact split semantics of the Python builder (same candidates, same
// 1e30 empty-side rule, same last-minimum tie-break, same abort rules,
// same node layout) so the two are bit-comparable, while running the
// sweep in O(k log k) native code for large mazes (config 5: 64x64).
//
// Build: g++ -O2 -shared -fPIC -o libmmx_native.so bvh_builder.cpp
// (done lazily by native/bindings.py; NumPy fallback if no compiler).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double BIG = 1e30;

struct V3 {
  double x, y, z;
};

inline V3 vmin(V3 a, V3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(V3 a, V3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline double half_area(V3 lo, V3 hi) {
  double ex = hi.x - lo.x, ey = hi.y - lo.y, ez = hi.z - lo.z;
  return ex * ey + ey * ez + ez * ex;
}

struct Builder {
  int n;
  std::vector<V3> lo_pts;   // per-prim min over its 4 growth corners
  std::vector<V3> hi_pts;   // per-prim max
  std::vector<V3> centers;
  std::vector<int64_t> prim_index;

  std::vector<V3> node_min, node_max;
  std::vector<int32_t> node_lf, node_ct;

  void node_bounds(int lo, int ct, V3* bmin, V3* bmax) const {
    V3 mn = {BIG, BIG, BIG}, mx = {-BIG, -BIG, -BIG};
    for (int i = lo; i < lo + ct; ++i) {
      mn = vmin(mn, lo_pts[prim_index[i]]);
      mx = vmax(mx, hi_pts[prim_index[i]]);
    }
    *bmin = mn;
    *bmax = mx;
  }

  int alloc(int lo, int ct) {
    V3 mn, mx;
    node_bounds(lo, ct, &mn, &mx);
    node_min.push_back(mn);
    node_max.push_back(mx);
    node_lf.push_back(lo);
    node_ct.push_back(ct);
    return static_cast<int>(node_lf.size()) - 1;
  }

  // Vectorized-sweep equivalent of scene/bvh.py best_split: per axis,
  // sort prims by center, prefix/suffix AABBs, candidate cost via
  // strict-less rank; axis-major iteration order with `<=` keeping the
  // LAST minimum (matches main.rs:118-129 semantics).
  void best_split(int lo, int ct, double* best_cost, int* best_axis,
                  double* best_pos) const {
    *best_cost = BIG;
    *best_axis = 6;
    *best_pos = 0.0;
    std::vector<int> order(ct);
    std::vector<double> sc(ct);
    std::vector<V3> pre_min(ct), pre_max(ct), suf_min(ct), suf_max(ct);
    std::vector<double> cost(ct);

    for (int axis = 0; axis < 3; ++axis) {
      auto caxis = [&](int64_t prim) {
        const V3& c = centers[prim];
        return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
      };
      for (int i = 0; i < ct; ++i) order[i] = i;
      std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return caxis(prim_index[lo + a]) < caxis(prim_index[lo + b]);
      });
      for (int i = 0; i < ct; ++i) sc[i] = caxis(prim_index[lo + order[i]]);

      V3 mn = {BIG, BIG, BIG}, mx = {-BIG, -BIG, -BIG};
      for (int i = 0; i < ct; ++i) {
        int64_t prim = prim_index[lo + order[i]];
        mn = vmin(mn, lo_pts[prim]);
        mx = vmax(mx, hi_pts[prim]);
        pre_min[i] = mn;
        pre_max[i] = mx;
      }
      mn = {BIG, BIG, BIG};
      mx = {-BIG, -BIG, -BIG};
      for (int i = ct - 1; i >= 0; --i) {
        int64_t prim = prim_index[lo + order[i]];
        mn = vmin(mn, lo_pts[prim]);
        mx = vmax(mx, hi_pts[prim]);
        suf_min[i] = mn;
        suf_max[i] = mx;
      }

      // Candidates in prim_index slice order (iteration order).
      for (int i = 0; i < ct; ++i) {
        double pos = caxis(prim_index[lo + i]);
        // rank m = #(centers < pos) == lower_bound over sorted centers
        int m = static_cast<int>(
            std::lower_bound(sc.begin(), sc.end(), pos) - sc.begin());
        double c;
        if (m == 0 || m == ct) {
          c = BIG;  // empty side (f32-overflow NaN rule in the reference)
        } else {
          double al = half_area(pre_min[m - 1], pre_max[m - 1]);
          double ar = half_area(suf_min[m], suf_max[m]);
          c = m * al + (ct - m) * ar;
          if (!(c > 0.0)) c = BIG;  // main.rs:205-210
        }
        cost[i] = c;
      }
      // last minimum in iteration order (cost <= best keeps latest)
      double amin = BIG + 1.0;
      int last_i = -1;
      for (int i = 0; i < ct; ++i)
        if (cost[i] <= amin) {
          amin = cost[i];
          last_i = i;
        }
      if (amin <= *best_cost) {
        *best_cost = amin;
        *best_axis = axis;
        *best_pos = caxis(prim_index[lo + last_i]);
      }
    }
  }

  void build() {
    int root = alloc(0, n);
    std::vector<int> stack = {root};
    std::vector<int64_t> left_buf, right_buf;
    while (!stack.empty()) {
      int ni = stack.back();
      stack.pop_back();
      int lo = node_lf[ni], ct = node_ct[ni];
      if (ct <= 1) continue;
      double bc, bp;
      int ba;
      best_split(lo, ct, &bc, &ba, &bp);
      double parent = ct * half_area(node_min[ni], node_max[ni]);
      if (bc > parent) continue;  // main.rs:130-135
      left_buf.clear();
      right_buf.clear();
      for (int i = lo; i < lo + ct; ++i) {
        const V3& c = centers[prim_index[i]];
        double v = ba == 0 ? c.x : (ba == 1 ? c.y : c.z);
        (v < bp ? left_buf : right_buf).push_back(prim_index[i]);
      }
      int lct = static_cast<int>(left_buf.size());
      if (lct == 0 || lct == ct) continue;  // main.rs:159-161
      std::copy(left_buf.begin(), left_buf.end(), prim_index.begin() + lo);
      std::copy(right_buf.begin(), right_buf.end(),
                prim_index.begin() + lo + lct);
      int li = alloc(lo, lct);
      int ri = alloc(lo + lct, ct - lct);
      node_lf[ni] = li;
      node_ct[ni] = 0;
      stack.push_back(ri);
      stack.push_back(li);
    }
  }
};

}  // namespace

extern "C" {

// Two-phase API so the caller allocates exact-size outputs:
//   handle = mmx_bvh_build(origin, u, v, n)   -> opaque pointer
//   mmx_bvh_num_nodes(handle)
//   mmx_bvh_export(handle, ...arrays...)       -> fills caller buffers
//   mmx_bvh_free(handle)

void* mmx_bvh_build(const float* origin, const float* u, const float* v,
                    int64_t n) {
  auto* b = new Builder();
  b->n = static_cast<int>(n);
  b->lo_pts.resize(n);
  b->hi_pts.resize(n);
  b->centers.resize(n);
  b->prim_index.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    V3 o = {origin[3 * i], origin[3 * i + 1], origin[3 * i + 2]};
    V3 cu = {o.x + u[3 * i], o.y + u[3 * i + 1], o.z + u[3 * i + 2]};
    V3 cv = {o.x + v[3 * i], o.y + v[3 * i + 1], o.z + v[3 * i + 2]};
    // Fourth corner (o + u) + v — same double-sum order as the Python
    // twin. The reference grows over only three corners
    // (main.rs:95-97), which misses rotated quads' far-corner triangle
    // (see scene/bvh.py docstring); four-corner growth is identical
    // for its axis-aligned quads.
    V3 cuv = {cu.x + v[3 * i], cu.y + v[3 * i + 1], cu.z + v[3 * i + 2]};
    b->lo_pts[i] = vmin(vmin(o, cuv), vmin(cu, cv));
    b->hi_pts[i] = vmax(vmax(o, cuv), vmax(cu, cv));
    // center = origin + (u + v) / 2 (main.rs:69-71)
    b->centers[i] = {o.x + (cu.x - o.x + cv.x - o.x) * 0.5,
                     o.y + (cu.y - o.y + cv.y - o.y) * 0.5,
                     o.z + (cu.z - o.z + cv.z - o.z) * 0.5};
    b->prim_index[i] = i;
  }
  b->build();
  return b;
}

int64_t mmx_bvh_num_nodes(void* handle) {
  return static_cast<Builder*>(handle)->node_lf.size();
}

void mmx_bvh_export(void* handle, float* aabb_min, float* aabb_max,
                    int32_t* left_first, int32_t* count,
                    int32_t* prim_index) {
  auto* b = static_cast<Builder*>(handle);
  int64_t m = b->node_lf.size();
  for (int64_t i = 0; i < m; ++i) {
    aabb_min[3 * i] = static_cast<float>(b->node_min[i].x);
    aabb_min[3 * i + 1] = static_cast<float>(b->node_min[i].y);
    aabb_min[3 * i + 2] = static_cast<float>(b->node_min[i].z);
    aabb_max[3 * i] = static_cast<float>(b->node_max[i].x);
    aabb_max[3 * i + 1] = static_cast<float>(b->node_max[i].y);
    aabb_max[3 * i + 2] = static_cast<float>(b->node_max[i].z);
    left_first[i] = b->node_lf[i];
    count[i] = b->node_ct[i];
  }
  for (int64_t i = 0; i < b->n; ++i)
    prim_index[i] = static_cast<int32_t>(b->prim_index[i]);
}

void mmx_bvh_free(void* handle) { delete static_cast<Builder*>(handle); }

}  // extern "C"
