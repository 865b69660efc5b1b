// Dense page builder: native port of accel/wide.py build_dense_page.
//
// Role parity: the reference builds its acceleration structures in host C++
// (src/SBVH.cpp); our paged meshes additionally need a per-page 8-wide BVH
// over 8-triangle sub-blocks with leaf-parent nodes and a dense (8,128)
// triangle pack (see accel/wide.py for the layout rationale).  The Python
// builder costs ~100 ms per 4k-tri page; at 122 pages that dominated asset
// loading, so the hot path lives here.  The numpy implementation remains in
// wide.py as the equivalence oracle (tests/test_wide.py).

#include <algorithm>
#include <array>
#include <functional>
#include <tuple>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "math3.h"

namespace vtrace {
namespace {

constexpr float kBig = 3e38f;

struct Box {
  V3 lo{kBig, kBig, kBig}, hi{-kBig, -kBig, -kBig};
  void add(const V3& p) {
    lo.x = std::min(lo.x, p.x);
    lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x);
    hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  void add(const Box& b) {
    add(b.lo);
    add(b.hi);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
  float centroid(int ax) const {
    return ax == 0 ? lo.x + hi.x : ax == 1 ? lo.y + hi.y : lo.z + hi.z;
  }
};

// Binary sweep-SAH over prim boxes; same node encoding as csrc/sbvh.cc
// (nodes_f [M,12], nodes_i [M,4]; leaves = single prims, count 1).
struct BinBuilder {
  const std::vector<Box>& boxes;
  std::vector<float> nodes_f;  // 12 per node
  std::vector<int> nodes_i;    // 4 per node

  explicit BinBuilder(const std::vector<Box>& b) : boxes(b) {}

  int emit(std::vector<int>& ids, int lo, int hi) {  // [lo, hi)
    int my = (int)(nodes_i.size() / 4);
    nodes_f.insert(nodes_f.end(), 12, 0.f);
    nodes_i.insert(nodes_i.end(), 4, 0);

    auto set_child = [&](int side, const Box& bb, int ref, int cnt) {
      float* f = nodes_f.data() + 12 * my + 6 * side;
      f[0] = bb.lo.x;
      f[1] = bb.lo.y;
      f[2] = bb.lo.z;
      f[3] = bb.hi.x;
      f[4] = bb.hi.y;
      f[5] = bb.hi.z;
      nodes_i[4 * my + 2 * side] = ref;
      nodes_i[4 * my + 2 * side + 1] = cnt;
    };

    auto child = [&](int a, int b) {  // returns (ref, cnt) via set later
      Box bb;
      for (int i = a; i < b; ++i) bb.add(boxes[ids[i]]);
      if (b - a == 1) return std::tuple<Box, int, int>(bb, ids[a], 1);
      int ref = emit(ids, a, b);
      return std::tuple<Box, int, int>(bb, ref, 0);
    };

    if (hi - lo == 1) {
      auto [bb, ref, cnt] = child(lo, hi);
      set_child(0, bb, ref, cnt);
      Box inv;  // empty child: inverted box
      inv.lo = V3{1, 1, 1};
      inv.hi = V3{-1, -1, -1};
      set_child(1, inv, 0, -1);
      return my;
    }
    const int m = hi - lo;
    // Sweep all three axes for the best SAH split.
    float best_cost = kBig;
    int best_ax = 0, best_k = 0;
    std::vector<int> best_order(ids.begin() + lo, ids.begin() + hi);
    std::vector<int> order(m);
    std::vector<float> larea(m), rarea(m);
    for (int ax = 0; ax < 3; ++ax) {
      for (int i = 0; i < m; ++i) order[i] = ids[lo + i];
      std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return boxes[a].centroid(ax) < boxes[b].centroid(ax);
      });
      Box acc;
      for (int i = 0; i < m; ++i) {
        acc.add(boxes[order[i]]);
        larea[i] = acc.area();
      }
      acc = Box();
      for (int i = m - 1; i >= 0; --i) {
        acc.add(boxes[order[i]]);
        rarea[i] = acc.area();
      }
      for (int k = 0; k + 1 < m; ++k) {
        float cost = larea[k] * (k + 1) + rarea[k + 1] * (m - 1 - k);
        if (cost < best_cost) {
          best_cost = cost;
          best_ax = ax;
          best_k = k;
          best_order.assign(order.begin(), order.end());
        }
      }
    }
    (void)best_ax;
    for (int i = 0; i < m; ++i) ids[lo + i] = best_order[i];
    auto [b0, r0, c0] = child(lo, lo + best_k + 1);
    set_child(0, b0, r0, c0);
    auto [b1, r1, c1] = child(lo + best_k + 1, hi);
    set_child(1, b1, r1, c1);
    return my;
  }
};

struct WideSlot {
  Box box;
  int ref = 0;
  int cnt = -1;  // -1 empty, 0 inner, 1 sub-block leaf
};

}  // namespace

extern "C" {

// Build the dense page structures for `r` triangles (Möller–Trumbore form
// v0/e1/e2 [r*3] + uv corners [r*6]).  Outputs (malloc'd, caller frees via
// vt_free):
//   nodes8_i [n_nodes*18] int32, nodes8_f [n_nodes*8*8] f32,
//   pack [n_groups*8*128] f32.
// Returns max tree depth (>0) or -1 on allocation failure.
int vt_build_dense_page(const float* v0, const float* e1, const float* e2,
                        const float* uvs6, int r, int slot_base,
                        int** out_n8i, float** out_n8f, float** out_pack,
                        int* out_n_nodes, int* out_n_groups) {
  const int nsb = (r + 7) / 8;
  std::vector<Box> sb(nsb);
  for (int j = 0; j < nsb; ++j)
    for (int i = 8 * j; i < std::min(8 * j + 8, r); ++i) {
      V3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
      V3 b = a + V3{e1[3 * i], e1[3 * i + 1], e1[3 * i + 2]};
      V3 c = a + V3{e2[3 * i], e2[3 * i + 1], e2[3 * i + 2]};
      sb[j].add(a);
      sb[j].add(b);
      sb[j].add(c);
    }

  BinBuilder bb(sb);
  std::vector<int> ids(nsb);
  for (int i = 0; i < nsb; ++i) ids[i] = i;
  bb.emit(ids, 0, nsb);
  const int n_bin = (int)(bb.nodes_i.size() / 4);

  // ---- 8-wide collapse ----
  // Default: SAH-DP-optimal grouping (wide.py _sah_wide_forest — measured
  // -15% node visits / +10% device throughput vs greedy on both coherence
  // regimes, docs/PERF.md round 5).  VPT_WIDE_COLLAPSE=greedy keeps the
  // original largest-area expansion.
  struct WideNode {
    WideSlot slots[8];
    int n = 0;
    int ax = 0;
    int lp = 0;
  };
  const char* collapse_env = std::getenv("VPT_WIDE_COLLAPSE");
  const bool use_sah = !(collapse_env && std::string(collapse_env) == "greedy");
  // DP tables: cc[b][i] = min cost of subtree b as a forest of <= i wide
  // child slots; dd[b][j] = best two-way split of budget j; split[b][j]
  // the winning left budget.
  std::vector<std::array<double, 9>> cc, dd;
  std::vector<std::array<signed char, 9>> split;
  if (use_sah) {
    const double C_NODE = 1.0, C_LEAF = 0.25, INF = 1e300;
    cc.resize(n_bin);
    dd.resize(n_bin);
    split.resize(n_bin);
    auto side_area = [&](int b, int side) {
      const float* f = bb.nodes_f.data() + 12 * b + 6 * side;
      double dx = std::max(0.f, f[3] - f[0]);
      double dy = std::max(0.f, f[4] - f[1]);
      double dz = std::max(0.f, f[5] - f[2]);
      return dx * dy + dy * dz + dz * dx;
    };
    for (int b = n_bin - 1; b >= 0; --b) {  // children have larger ids
      double c0[9], c1[9];
      auto fill = [&](int side, double* out) -> bool {
        int cnt = bb.nodes_i[4 * b + 2 * side + 1];
        if (cnt < 0) return false;
        if (cnt > 0) {
          double c = side_area(b, side) * C_LEAF;
          for (int i = 0; i < 9; ++i) out[i] = c;
        } else {
          int ref = bb.nodes_i[4 * b + 2 * side];
          for (int i = 0; i < 9; ++i) out[i] = cc[ref][i];
        }
        return true;
      };
      bool h0 = fill(0, c0), h1 = fill(1, c1);
      for (int j = 0; j <= 8; ++j) {
        dd[b][j] = INF;
        split[b][j] = 0;
      }
      if (h0 && h1) {
        for (int j = 2; j <= 8; ++j)
          for (int k = 1; k < j; ++k) {
            double v = c0[k] + c1[j - k];
            if (v < dd[b][j]) {
              dd[b][j] = v;
              split[b][j] = (signed char)k;
            }
          }
      } else {
        const double* c = h0 ? c0 : c1;
        for (int j = 1; j <= 8; ++j) dd[b][j] = c[j];
      }
      Box un;
      for (int side = 0; side < 2; ++side)
        if (bb.nodes_i[4 * b + 2 * side + 1] >= 0) {
          const float* f = bb.nodes_f.data() + 12 * b + 6 * side;
          un.add(V3{f[0], f[1], f[2]});
          un.add(V3{f[3], f[4], f[5]});
        }
      double close = un.area() * C_NODE + dd[b][8];
      cc[b][1] = close;
      for (int i = 2; i <= 8; ++i) cc[b][i] = std::min(close, dd[b][i]);
    }
  }
  std::vector<WideNode> wide;
  std::vector<int> wide_of_bin(n_bin, -1);
  std::vector<int> depth_of;
  int max_depth = 1;
  {
    auto bin_children = [&](int b, WideSlot out[2]) {
      int k = 0;
      for (int side = 0; side < 2; ++side) {
        int cnt = bb.nodes_i[4 * b + 2 * side + 1];
        if (cnt < 0) continue;
        const float* f = bb.nodes_f.data() + 12 * b + 6 * side;
        out[k].box.lo = V3{f[0], f[1], f[2]};
        out[k].box.hi = V3{f[3], f[4], f[5]};
        out[k].ref = bb.nodes_i[4 * b + 2 * side];
        out[k].cnt = cnt;
        ++k;
      }
      return k;
    };
    // SAH reconstruction: slots of a closed node = its budget-8 split tree.
    std::function<void(int, int, std::vector<WideSlot>&)> distribute =
        [&](int b, int budget, std::vector<WideSlot>& out) {
          bool h0 = bb.nodes_i[4 * b + 1] >= 0;
          bool h1 = bb.nodes_i[4 * b + 3] >= 0;
          int k = split[b][budget];
          int sides[2][2] = {{0, budget}, {-1, 0}};
          if (h0 && h1) {
            sides[0][0] = 0;
            sides[0][1] = k;
            sides[1][0] = 1;
            sides[1][1] = budget - k;
          } else if (!h0) {
            sides[0][0] = 1;
          }
          for (int si = 0; si < 2; ++si) {
            int side = sides[si][0], bud = sides[si][1];
            if (side < 0) continue;
            int cnt = bb.nodes_i[4 * b + 2 * side + 1];
            int ref = bb.nodes_i[4 * b + 2 * side];
            const float* f = bb.nodes_f.data() + 12 * b + 6 * side;
            WideSlot s;
            s.box.lo = V3{f[0], f[1], f[2]};
            s.box.hi = V3{f[3], f[4], f[5]};
            s.ref = ref;
            if (cnt > 0) {
              s.cnt = cnt;
              out.push_back(s);
            } else if (bud == 1 || cc[ref][1] <= dd[ref][bud]) {
              s.cnt = 0;  // close: ref becomes a wide node of its own
              out.push_back(s);
            } else {
              distribute(ref, bud, out);
            }
          }
        };
    std::vector<int> order{0};
    wide.emplace_back();
    depth_of.push_back(1);
    wide_of_bin[0] = 0;
    while (!order.empty()) {
      int b = order.back();
      order.pop_back();
      int w = wide_of_bin[b];
      std::vector<WideSlot> slots;
      if (use_sah) {
        distribute(b, 8, slots);
      } else {
        WideSlot two[2];
        int k = bin_children(b, two);
        slots.assign(two, two + k);
        for (;;) {
          if ((int)slots.size() >= 8) break;
          int best = -1;
          float best_a = -1.f;
          for (size_t i = 0; i < slots.size(); ++i)
            if (slots[i].cnt == 0 && slots[i].box.area() > best_a) {
              best = (int)i;
              best_a = slots[i].box.area();
            }
          if (best < 0) break;
          WideSlot two2[2];
          int k2 = bin_children(slots[best].ref, two2);
          if ((int)slots.size() - 1 + k2 > 8) break;
          slots.erase(slots.begin() + best);
          slots.insert(slots.end(), two2, two2 + k2);
        }
      }
      // Sort children along the widest union axis.
      Box un;
      for (auto& s : slots) un.add(s.box);
      V3 d = un.hi - un.lo;
      int ax = d.x >= d.y && d.x >= d.z ? 0 : (d.y >= d.z ? 1 : 2);
      std::stable_sort(slots.begin(), slots.end(),
                       [&](const WideSlot& a, const WideSlot& b2) {
                         return a.box.centroid(ax) < b2.box.centroid(ax);
                       });
      for (auto& s : slots)
        if (s.cnt == 0) {
          int wid = (int)wide.size();
          wide.emplace_back();
          wide_of_bin[s.ref] = wid;
          depth_of.push_back(depth_of[w] + 1);
          max_depth = std::max(max_depth, depth_of[w] + 1);
          order.push_back(s.ref);
        }
      WideNode& node = wide[w];
      node.ax = ax;
      node.n = (int)slots.size();
      for (int i = 0; i < node.n; ++i) {
        node.slots[i] = slots[i];
        if (slots[i].cnt == 0) node.slots[i].ref = wide_of_bin[slots[i].ref];
      }
    }
  }

  // ---- leaf-parent bundling + bin-packed pack groups ----
  // Leaf-parents share pack row-groups: an LP with m sub-blocks claims m
  // consecutive lane slots of some group (first-fit decreasing) and its
  // children sit at child positions == the assigned lane slots (leaf order
  // within a node is free — any-hit bits are already fixed).  One group
  // per LP left groups ~1/3 full, and the pack dominates every page DMA.
  // All 8 slots of an LP (members AND empties) carry ref = grp so the
  // kernel's `grp = refs[0]` read works from any position.
  struct LP {
    int node;
    std::vector<WideSlot> members;  // box + sub-block id (in .ref)
  };
  std::vector<LP> lps;
  bool any_bundled = false;
  const int n_first = (int)wide.size();
  for (int w = 0; w < n_first; ++w) {
    WideNode& nd = wide[w];
    int n_sub = 0, n_inner = 0;
    for (int i = 0; i < nd.n; ++i)
      nd.slots[i].cnt == 1 ? ++n_sub : nd.slots[i].cnt == 0 ? ++n_inner : 0;
    if (!n_sub) continue;
    LP lp;
    for (int i = 0; i < nd.n; ++i)
      if (nd.slots[i].cnt == 1) lp.members.push_back(nd.slots[i]);
    if (!n_inner) {
      // Pure leaf node becomes a leaf-parent in place.
      lp.node = w;
      nd.lp = 1;
    } else {
      // Mixed: bundle the sub-block children under one new leaf-parent.
      any_bundled = true;
      int wid = (int)wide.size();
      wide.emplace_back();
      wide.back().lp = 1;
      lp.node = wid;
      WideNode& src = wide[w];  // re-ref after potential realloc
      Box un;
      int first = -1;
      for (int i = 0; i < src.n; ++i)
        if (src.slots[i].cnt == 1) {
          un.add(src.slots[i].box);
          if (first < 0) {
            first = i;
          } else {
            src.slots[i].cnt = -1;  // emptied
            src.slots[i].box.lo = V3{kBig, kBig, kBig};
            src.slots[i].box.hi = V3{-kBig, -kBig, -kBig};
          }
        }
      src.slots[first].box = un;
      src.slots[first].ref = wid;
      src.slots[first].cnt = 0;
    }
    lps.push_back(std::move(lp));
  }
  max_depth += any_bundled ? 1 : 0;

  // First-fit decreasing (stable: ties keep tree order).
  std::vector<int> lp_order(lps.size());
  for (size_t i = 0; i < lps.size(); ++i) lp_order[i] = (int)i;
  std::stable_sort(lp_order.begin(), lp_order.end(), [&](int a, int b) {
    return lps[a].members.size() > lps[b].members.size();
  });
  struct Member {
    int j, sid;
  };
  std::vector<std::vector<Member>> groups;
  std::vector<int> group_fill;
  for (int i : lp_order) {
    const int m = (int)lps[i].members.size();
    int g = -1;
    for (size_t k = 0; k < group_fill.size(); ++k)
      if (group_fill[k] + m <= 8) {
        g = (int)k;
        break;
      }
    if (g < 0) {
      g = (int)groups.size();
      groups.emplace_back();
      group_fill.push_back(0);
    }
    WideNode& nd = wide[lps[i].node];
    const int off = group_fill[g];
    group_fill[g] += m;
    nd.n = 8;
    for (int c = 0; c < 8; ++c) {
      nd.slots[c].ref = g;
      nd.slots[c].cnt = -1;
      nd.slots[c].box.lo = V3{kBig, kBig, kBig};
      nd.slots[c].box.hi = V3{-kBig, -kBig, -kBig};
    }
    for (int k = 0; k < m; ++k) {
      const WideSlot& src = lps[i].members[k];
      nd.slots[off + k].box = src.box;
      nd.slots[off + k].cnt = 8;
      groups[g].push_back({off + k, src.ref});
    }
  }

  // ---- emit arrays ----
  const int n_nodes = (int)wide.size();
  const int n_groups = std::max((int)groups.size(), 1);
  int* n8i = (int*)std::malloc(sizeof(int) * 18 * (size_t)n_nodes);
  float* n8f = (float*)std::malloc(sizeof(float) * 64 * (size_t)n_nodes);
  float* pack =
      (float*)std::calloc((size_t)n_groups * 8 * 128, sizeof(float));
  if (!n8i || !n8f || !pack) {
    std::free(n8i);
    std::free(n8f);
    std::free(pack);
    return -1;
  }
  for (int w = 0; w < n_nodes; ++w) {
    const WideNode& nd = wide[w];
    int* rec = n8i + 18 * w;
    float* fb = n8f + 64 * w;
    for (int c = 0; c < 8; ++c) {
      const WideSlot& s = nd.slots[c];
      float* row = fb + 8 * c;
      if (c < nd.n && s.cnt != -1) {
        row[0] = s.box.lo.x;
        row[1] = s.box.lo.y;
        row[2] = s.box.lo.z;
        row[3] = s.box.hi.x;
        row[4] = s.box.hi.y;
        row[5] = s.box.hi.z;
        rec[2 * c] = s.ref;
        rec[2 * c + 1] = s.cnt;
      } else {
        row[0] = row[1] = row[2] = kBig;
        row[3] = row[4] = row[5] = -kBig;
        // LP empties keep ref = grp (the kernel reads grp from slot 0).
        rec[2 * c] = s.ref;
        rec[2 * c + 1] = -1;
      }
      row[6] = row[7] = 0.f;
    }
    rec[16] = nd.ax;
    rec[17] = nd.lp;
  }
  for (size_t g = 0; g < groups.size(); ++g)
    for (const Member& m : groups[g])
      for (int i = 0; i < 8; ++i) {
        int s = m.sid * 8 + i;
        if (s >= r) break;
        float* row = pack + ((size_t)g * 8 + i) * 128 + 16 * m.j;
        std::memcpy(row + 0, v0 + 3 * s, 12);
        std::memcpy(row + 3, e1 + 3 * s, 12);
        std::memcpy(row + 6, e2 + 3 * s, 12);
        row[9] = (float)(slot_base + s);
        std::memcpy(row + 10, uvs6 + 6 * s, 24);
      }

  *out_n8i = n8i;
  *out_n8f = n8f;
  *out_pack = pack;
  *out_n_nodes = n_nodes;
  *out_n_groups = n_groups;
  return max_depth;
}

}  // extern "C"
}  // namespace vtrace
