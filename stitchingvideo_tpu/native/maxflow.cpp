// Boykov–Kolmogorov max-flow / min-cut on 4-connected grid graphs.
//
// Native host-side stage for graph-cut seam finding, mirroring the role of
// the reference's vendored GCGraph (reference src/gcgraph.hpp:45-385) under
// GraphCutSeamFinder (src/seam_finders.cpp:1052-1305). This is a fresh
// implementation of the published BK algorithm ("An Experimental Comparison
// of Min-Cut/Max-Flow Algorithms for Energy Minimization in Vision",
// Boykov & Kolmogorov, PAMI 2004) specialized to grid graphs: CSR adjacency
// built once, search-tree growth/augment/adopt with FIFO active list.
//
// C ABI, consumed via ctypes from seams/graphcut.py.

#include <cstdint>
#include <cstring>
#include <vector>
#include <deque>
#include <cmath>

namespace {

constexpr int FREE_TREE = 0;
constexpr int SRC_TREE = 1;
constexpr int SNK_TREE = 2;
constexpr int NO_ARC = -1;
constexpr int TERMINAL_ARC = -2;

struct Graph {
  int n = 0;
  // CSR arcs: arc a and (a ^ 1) are a reverse pair.
  std::vector<int> head;        // per-node first arc index into arc_list
  std::vector<int> next_arc;    // linked list of arcs per node
  std::vector<int> arc_to;      // arc target node
  std::vector<double> r_cap;    // residual capacity per arc
  std::vector<double> tr_cap;   // terminal residual: >0 source, <0 sink

  std::vector<int> parent_arc;  // arc from parent -> this (in this node's in-arcs: stored as arc index whose to==this? we store arc index a such that arc_to[a^1]==parent)
  std::vector<uint8_t> tree;
  std::vector<uint32_t> ts;     // timestamp for dist heuristic
  std::vector<uint32_t> dist;

  std::deque<int> active;
  std::deque<int> orphans;
  uint32_t time = 0;

  void init(int n_nodes, size_t n_edges_hint) {
    n = n_nodes;
    head.assign(n, NO_ARC);
    next_arc.reserve(n_edges_hint * 2);
    arc_to.reserve(n_edges_hint * 2);
    r_cap.reserve(n_edges_hint * 2);
    tr_cap.assign(n, 0.0);
  }

  void add_term(int v, double src, double snk) { tr_cap[v] += src - snk; }

  void add_edge(int u, int v, double cap_uv, double cap_vu) {
    int a = (int)arc_to.size();
    arc_to.push_back(v); r_cap.push_back(cap_uv);
    next_arc.push_back(head[u]); head[u] = a;
    int b = a + 1;
    arc_to.push_back(u); r_cap.push_back(cap_vu);
    next_arc.push_back(head[v]); head[v] = b;
  }

  double maxflow(uint8_t* labels_out) {
    parent_arc.assign(n, NO_ARC);
    tree.assign(n, FREE_TREE);
    ts.assign(n, 0);
    dist.assign(n, 0);
    active.clear();
    orphans.clear();
    double flow = 0.0;

    for (int v = 0; v < n; ++v) {
      if (tr_cap[v] > 0) { tree[v] = SRC_TREE; parent_arc[v] = TERMINAL_ARC; active.push_back(v); dist[v] = 1; }
      else if (tr_cap[v] < 0) { tree[v] = SNK_TREE; parent_arc[v] = TERMINAL_ARC; active.push_back(v); dist[v] = 1; }
    }

    while (true) {
      // ---- grow ----
      int meet_arc = NO_ARC;  // arc from src-tree node to snk-tree node
      while (!active.empty() && meet_arc == NO_ARC) {
        int v = active.front();
        if (tree[v] == FREE_TREE || parent_arc[v] == NO_ARC) { active.pop_front(); continue; }
        uint8_t tv = tree[v];
        for (int a = head[v]; a != NO_ARC; a = next_arc[a]) {
          // capacity in the growth direction: from v outward for SRC tree,
          // toward v for SNK tree.
          double cap = (tv == SRC_TREE) ? r_cap[a] : r_cap[a ^ 1];
          if (cap <= 0) continue;
          int u = arc_to[a];
          if (tree[u] == FREE_TREE) {
            tree[u] = tv;
            parent_arc[u] = a ^ 1;  // arc from u back toward v
            ts[u] = ts[v];
            dist[u] = dist[v] + 1;
            active.push_back(u);
          } else if (tree[u] != tv) {
            meet_arc = (tv == SRC_TREE) ? a : (a ^ 1);
            break;
          }
        }
        if (meet_arc == NO_ARC) active.pop_front();
      }
      if (meet_arc == NO_ARC) break;
      ++time;

      // ---- augment: path is src-tree ... u -(meet_arc)-> w ... snk-tree ----
      int u = (meet_arc >= 0) ? arc_to[meet_arc ^ 1] : -1;  // tail of meet arc
      int w = arc_to[meet_arc];
      // bottleneck
      double bottleneck = r_cap[meet_arc];
      for (int v = u; ; ) {
        int pa = parent_arc[v];
        if (pa == TERMINAL_ARC) { bottleneck = std::min(bottleneck, tr_cap[v]); break; }
        bottleneck = std::min(bottleneck, r_cap[pa ^ 1]);  // arc parent->v
        v = arc_to[pa];
      }
      for (int v = w; ; ) {
        int pa = parent_arc[v];
        if (pa == TERMINAL_ARC) { bottleneck = std::min(bottleneck, -tr_cap[v]); break; }
        bottleneck = std::min(bottleneck, r_cap[pa]);      // arc v->parent
        v = arc_to[pa];
      }
      // apply
      r_cap[meet_arc] -= bottleneck;
      r_cap[meet_arc ^ 1] += bottleneck;
      for (int v = u; ; ) {
        int pa = parent_arc[v];
        if (pa == TERMINAL_ARC) {
          tr_cap[v] -= bottleneck;
          if (tr_cap[v] <= 0) { parent_arc[v] = NO_ARC; orphans.push_back(v); }
          break;
        }
        r_cap[pa ^ 1] -= bottleneck;
        r_cap[pa] += bottleneck;
        if (r_cap[pa ^ 1] <= 0) { parent_arc[v] = NO_ARC; orphans.push_back(v); }
        v = arc_to[pa];
      }
      for (int v = w; ; ) {
        int pa = parent_arc[v];
        if (pa == TERMINAL_ARC) {
          tr_cap[v] += bottleneck;
          if (tr_cap[v] >= 0) { parent_arc[v] = NO_ARC; orphans.push_back(v); }
          break;
        }
        r_cap[pa] -= bottleneck;
        r_cap[pa ^ 1] += bottleneck;
        if (r_cap[pa] <= 0) { parent_arc[v] = NO_ARC; orphans.push_back(v); }
        v = arc_to[pa];
      }
      flow += bottleneck;

      // ---- adopt ----
      while (!orphans.empty()) {
        int v = orphans.front(); orphans.pop_front();
        uint8_t tv = tree[v];
        bool found = false;
        uint32_t best_dist = UINT32_MAX;
        int best_arc = NO_ARC;
        for (int a = head[v]; a != NO_ARC; a = next_arc[a]) {
          int p = arc_to[a];
          if (tree[p] != tv) continue;
          double cap = (tv == SRC_TREE) ? r_cap[a ^ 1] : r_cap[a];  // toward v for SRC
          if (cap <= 0) continue;
          // check p has a valid rooted origin
          uint32_t d = 0;
          int q = p;
          bool rooted = false;
          while (true) {
            if (ts[q] == time) { d += dist[q]; rooted = true; break; }
            int pa = parent_arc[q];
            if (pa == TERMINAL_ARC) { ts[q] = time; dist[q] = 1; d += 1; rooted = true; break; }
            if (pa == NO_ARC) { rooted = false; break; }
            ++d;
            q = arc_to[pa];
          }
          if (!rooted) continue;
          // cache dists along the path
          for (int q2 = p; ts[q2] != time; ) {
            ts[q2] = time; dist[q2] = d--;
            int pa = parent_arc[q2];
            if (pa == TERMINAL_ARC || pa == NO_ARC) break;
            q2 = arc_to[pa];
          }
          if (d + 1 < best_dist) { best_dist = d + 1; best_arc = a; found = true; }
        }
        if (found) {
          parent_arc[v] = best_arc;
          ts[v] = time;
          dist[v] = best_dist;
        } else {
          // v becomes free; children become orphans, neighbors may activate
          for (int a = head[v]; a != NO_ARC; a = next_arc[a]) {
            int p = arc_to[a];
            if (tree[p] != tv) continue;
            double cap = (tv == SRC_TREE) ? r_cap[a ^ 1] : r_cap[a];
            if (cap > 0) active.push_back(p);
            if (parent_arc[p] >= 0 && arc_to[parent_arc[p]] == v) {
              parent_arc[p] = NO_ARC;
              orphans.push_back(p);
            }
          }
          tree[v] = FREE_TREE;
        }
      }
    }

    if (labels_out) {
      for (int v = 0; v < n; ++v)
        labels_out[v] = (tree[v] == SRC_TREE) ? 1 : 0;
    }
    return flow;
  }
};

}  // namespace

extern "C" {

// Grid max-flow. All arrays row-major.
//   term_src/term_snk: [h*w] terminal capacities.
//   cap_right: [h*(w-1)] symmetric capacity between (y,x) and (y,x+1).
//   cap_down:  [(h-1)*w] symmetric capacity between (y,x) and (y+1,x).
//   labels_out: [h*w] -> 1 if node stays with the source.
// Returns the max-flow value.
double grid_maxflow(int h, int w,
                    const float* term_src, const float* term_snk,
                    const float* cap_right, const float* cap_down,
                    uint8_t* labels_out) {
  Graph g;
  g.init(h * w, (size_t)h * (w - 1) + (size_t)(h - 1) * w);
  // Terminal caps are folded to a single excess per node; flow through a node
  // that has both terminals is min(src, snk) and saturates immediately.
  double base_flow = 0.0;
  for (int v = 0; v < h * w; ++v) {
    g.add_term(v, term_src[v], term_snk[v]);
    base_flow += std::min((double)term_src[v], (double)term_snk[v]);
  }
  for (int y = 0; y < h; ++y)
    for (int x = 0; x + 1 < w; ++x) {
      double c = cap_right[y * (w - 1) + x];
      if (c > 0) g.add_edge(y * w + x, y * w + x + 1, c, c);
    }
  for (int y = 0; y + 1 < h; ++y)
    for (int x = 0; x < w; ++x) {
      double c = cap_down[y * w + x];
      if (c > 0) g.add_edge(y * w + x, (y + 1) * w + x, c, c);
    }
  return base_flow + g.maxflow(labels_out);
}

}  // extern "C"
