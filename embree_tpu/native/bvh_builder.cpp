// Native binned-SAH BVH8 builder (host runtime component).
//
// Role parity with the reference's native builder stack
// (kernels/builders/bvh_builder_sah.h GeneralBVHBuilder::recurse,
// heuristic_binning.h binning/sweep, kernels/bvh/bvh_builder_sah.cpp) — the
// C++ fast path for large-scene commits, complementing the jittable JAX
// builder (which remains the on-device / differentiated path). Emits the same
// flat-array BVH8 the rest of the framework consumes (bvh.py layout: leaf ref
// = -(start<<4 | count) - 1, INVALID = -0x7FFFFFFF).
//
// Parallelism: OpenMP task recursion over subtrees (the work-stealing analog
// of common/tasking), sequential below a grain size.
//
// Build:  g++ -O3 -march=native -fopenmp -shared -fPIC bvh_builder.cpp -o libbvh.so
#include <algorithm>
#include <omp.h>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kInvalid = -0x7FFFFFFF;

constexpr int kBins = 16;
constexpr int kWidth = 8;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Bounds {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 up{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void extend(const Bounds& o) {
    lo = vmin(lo, o.lo);
    up = vmax(up, o.up);
  }
  float half_area() const {
    float dx = std::max(up.x - lo.x, 0.f);
    float dy = std::max(up.y - lo.y, 0.f);
    float dz = std::max(up.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Prim {
  Bounds b;
  Vec3 c;
  int id;
};

struct Builder {
  std::vector<Prim> prims;
  int leaf_size = 8;
  float* node_lower;  // (max_nodes, 8, 3)
  float* node_upper;
  int* node_child;  // (max_nodes, 8)
  int max_nodes;
  std::atomic<int> node_count{0};
  std::atomic<bool> overflow{false};

  // Find the best binned-SAH split of [begin,end); returns axis/pos or -1 for
  // a median fallback. Partitions in place, returns mid.
  int split(int begin, int end) {
    int n = end - begin;
    Bounds cb;
    for (int i = begin; i < end; ++i) {
      Bounds c;
      c.lo = prims[i].c;
      c.up = prims[i].c;
      cb.extend(c);
    }
    float ext[3] = {cb.up.x - cb.lo.x, cb.up.y - cb.lo.y, cb.up.z - cb.lo.z};
    float base[3] = {cb.lo.x, cb.lo.y, cb.lo.z};

    float best_cost = FLT_MAX;
    int best_axis = -1, best_bin = -1;
    for (int axis = 0; axis < 3; ++axis) {
      if (ext[axis] <= 1e-20f) continue;
      float scale = kBins / ext[axis];
      Bounds bins[kBins];
      int cnt[kBins] = {0};
      for (int i = begin; i < end; ++i) {
        const float* c = &prims[i].c.x;
        int b = std::min(int((c[axis] - base[axis]) * scale), kBins - 1);
        b = std::max(b, 0);
        bins[b].extend(prims[i].b);
        cnt[b]++;
      }
      // sweep (heuristic_binning.h:339)
      float right_area[kBins];
      Bounds acc;
      int right_cnt[kBins];
      int rc = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        acc.extend(bins[b]);
        rc += cnt[b];
        right_area[b] = acc.half_area();
        right_cnt[b] = rc;
      }
      Bounds lacc;
      int lc = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        lacc.extend(bins[b]);
        lc += cnt[b];
        if (lc == 0 || right_cnt[b + 1] == 0) continue;
        float cost = lacc.half_area() * lc + right_area[b + 1] * right_cnt[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }

    if (best_axis < 0) {  // degenerate: median split (builder fallback)
      int mid = begin + n / 2;
      std::nth_element(prims.begin() + begin, prims.begin() + mid,
                       prims.begin() + end, [&](const Prim& a, const Prim& b) {
                         return a.c.x < b.c.x;
                       });
      return mid;
    }
    float scale = kBins / ext[best_axis];
    float base_a = base[best_axis];
    auto it = std::partition(
        prims.begin() + begin, prims.begin() + end, [&](const Prim& p) {
          const float* c = &p.c.x;
          int b = std::max(
              0, std::min(int((c[best_axis] - base_a) * scale), kBins - 1));
          return b <= best_bin;
        });
    int mid = int(it - prims.begin());
    if (mid == begin || mid == end) mid = begin + n / 2;  // safety
    return mid;
  }

  Bounds range_bounds(int begin, int end) {
    Bounds b;
    for (int i = begin; i < end; ++i) b.extend(prims[i].b);
    return b;
  }

  // Split [begin,end) into up to `slots` subranges by recursive SAH splits
  // (the direct wide-node construction; collapse-at-build).
  int make_children(int begin, int end, int slots, int* starts, int* ends) {
    starts[0] = begin;
    ends[0] = end;
    int count = 1;
    while (count < slots) {
      // split the largest splittable subrange
      int pick = -1, pick_n = leaf_size;
      for (int i = 0; i < count; ++i) {
        int n = ends[i] - starts[i];
        if (n > pick_n) {
          pick_n = n;
          pick = i;
        }
      }
      if (pick < 0) break;
      int mid = split(starts[pick], ends[pick]);
      // shift to insert
      for (int i = count; i > pick + 1; --i) {
        starts[i] = starts[i - 1];
        ends[i] = ends[i - 1];
      }
      starts[pick + 1] = mid;
      ends[pick + 1] = ends[pick];
      ends[pick] = mid;
      ++count;
    }
    return count;
  }

  // Build a node over [begin,end); returns an encoded child ref.
  int build_node(int begin, int end, int depth) {
    int n = end - begin;
    if (n <= leaf_size) {
      return -((begin << 4) | n) - 1;
    }
    int starts[kWidth], ends[kWidth];
    int nc = make_children(begin, end, kWidth, starts, ends);

    int node = node_count.fetch_add(1);
    if (node >= max_nodes) {
      overflow = true;
      return kInvalid;
    }
    float* lo = node_lower + size_t(node) * kWidth * 3;
    float* up = node_upper + size_t(node) * kWidth * 3;
    int* ch = node_child + size_t(node) * kWidth;
    for (int k = 0; k < kWidth; ++k) ch[k] = kInvalid;

    bool parallel_here = depth < 4 && n > 8192;
    for (int k = 0; k < nc; ++k) {
      Bounds b = range_bounds(starts[k], ends[k]);
      lo[k * 3 + 0] = b.lo.x;
      lo[k * 3 + 1] = b.lo.y;
      lo[k * 3 + 2] = b.lo.z;
      up[k * 3 + 0] = b.up.x;
      up[k * 3 + 1] = b.up.y;
      up[k * 3 + 2] = b.up.z;
      if (parallel_here) {
#pragma omp task shared(ch) firstprivate(k)
        ch[k] = build_node(starts[k], ends[k], depth + 1);
      } else {
        ch[k] = build_node(starts[k], ends[k], depth + 1);
      }
    }
    if (parallel_here) {
#pragma omp taskwait
    }
    return node;
  }
};

}  // namespace

extern "C" {

// threads= device-config knob (state.h numThreads analog): caps the OpenMP
// team for subsequent builds; n <= 0 restores the default.
void set_build_threads(int n) {
  static int def = omp_get_max_threads();
  omp_set_num_threads(n > 0 ? n : def);
}

// Returns node count, or -1 on overflow / error. Node 0 is the root.
int build_bvh8(int n, const float* lo, const float* up, float* node_lower,
               float* node_upper, int* node_child, int* prim_order,
               int max_nodes, int leaf_size) {
  if (n <= 0) return -1;
  Builder b;
  b.leaf_size = (leaf_size >= 1 && leaf_size <= 15) ? leaf_size : 8;
  b.node_lower = node_lower;
  b.node_upper = node_upper;
  b.node_child = node_child;
  b.max_nodes = max_nodes;
  b.prims.resize(n);
  for (int i = 0; i < n; ++i) {
    Prim& p = b.prims[i];
    p.b.lo = {lo[i * 3], lo[i * 3 + 1], lo[i * 3 + 2]};
    p.b.up = {up[i * 3], up[i * 3 + 1], up[i * 3 + 2]};
    p.c = {(p.b.lo.x + p.b.up.x) * 0.5f, (p.b.lo.y + p.b.up.y) * 0.5f,
           (p.b.lo.z + p.b.up.z) * 0.5f};
    p.id = i;
  }

  int root;
#pragma omp parallel
  {
#pragma omp single
    {
      root = b.build_node(0, n, 0);
    }
  }
  if (b.overflow) return -1;

  if (root < 0) {
    // tiny scene: wrap the single leaf in a root node
    int node = b.node_count.fetch_add(1);
    if (node >= max_nodes) return -1;
    Bounds bb = b.range_bounds(0, n);
    float* l = node_lower + size_t(node) * kWidth * 3;
    float* u = node_upper + size_t(node) * kWidth * 3;
    int* ch = node_child + size_t(node) * kWidth;
    for (int k = 0; k < kWidth; ++k) ch[k] = kInvalid;
    ch[0] = root;
    for (int c = 0; c < 3; ++c) {
      l[c] = (&bb.lo.x)[c];
      u[c] = (&bb.up.x)[c];
    }
  }

  for (int i = 0; i < n; ++i) prim_order[i] = b.prims[i].id;
  return b.node_count.load();
}
}
