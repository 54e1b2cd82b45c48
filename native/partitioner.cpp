// Multilevel greedy graph partitioner — the framework's native replacement
// for METIS (the reference partitions via PyG ClusterData -> METIS C
// library, reference main.py:63). Produces edge-balanced node partitions
// that minimize cut edges; partitions map onto TPU cores.
//
// Pipeline (the METIS recipe, simplified, all O(E)):
//   1. COARSEN: one size-capped greedy clustering pass in BFS order —
//      each node joins its neighbors' majority cluster if below the size
//      cap (n / (4 * num_parts)), else opens a new cluster. Clusters stay
//      inside communities because most edges are intra-community.
//   2. PARTITION the cluster graph with LDG (Linear Deterministic Greedy,
//      Stanton & Kliot 2012): stream clusters, maximize
//      edge_weight_to_p * (1 - deg_p / cap_deg). Balance is tracked in
//      DEGREE units: induced-subgraph batches are padded to the MAX
//      per-partition edge count, so edge-count skew directly wastes
//      compute as padding. A node cap bounds partition size for the
//      dense-subgraph route.
//   3. UNCOARSEN + refinement sweeps: move boundary nodes to their
//      majority partition while both caps permit, until moves die out.
//
// Single-level LDG + 1 sweep measured 52% intra-partition edges on a
// community-structured 117M-edge graph whose locality is 82%; the
// multilevel pipeline recovers ~watermark locality (communities survive
// coarsening, so the coarse LDG packs whole communities).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// senders/receivers: COO edge list (directed; symmetrized internally)
// part_out: int32[N] partition id per node
// deg_slack/node_slack: hard-cap multipliers over the perfectly balanced
// per-partition degree / node count (legacy entry point uses 1.05 / 1.35).
// Looser caps let whole communities stay in one partition (higher intra
// fraction) at the cost of edge-count skew — which the driver's padded
// shape CLASSES absorb (data/partition.py shape_classes), so the skew no
// longer costs padded compute the way a single global pad shape did.
void greedy_partition_ex(const int32_t* senders, const int32_t* receivers,
                         int64_t num_edges, int32_t num_nodes,
                         int32_t num_parts, double deg_slack,
                         double node_slack, int32_t* part_out) {
  // build symmetric CSR
  std::vector<int64_t> deg(num_nodes + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    deg[senders[e] + 1]++;
    deg[receivers[e] + 1]++;
  }
  for (int32_t v = 0; v < num_nodes; ++v) deg[v + 1] += deg[v];
  std::vector<int32_t> adj(2 * num_edges);
  std::vector<int64_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t e = 0; e < num_edges; ++e) {
    adj[fill[senders[e]]++] = receivers[e];
    adj[fill[receivers[e]]++] = senders[e];
  }

  // Balance is tracked in DEGREE units, not node counts: induced-subgraph
  // batches are padded to the MAX per-partition edge count, so edge-count
  // skew (power-law hubs) directly wastes compute as padding. A node cap
  // (1.35x mean) still bounds partition node counts for the dense route.
  const double total_deg = 2.0 * static_cast<double>(num_edges);
  const double cap_deg = total_deg / num_parts * deg_slack;
  const double cap_node =
      static_cast<double>(num_nodes) / num_parts * node_slack + 1.0;
  std::vector<double> part_deg(num_parts, 0.0);
  std::vector<int64_t> part_size(num_parts, 0);
  std::vector<int64_t> nbr_count(num_parts, 0);
  std::memset(part_out, 0xff, sizeof(int32_t) * num_nodes);  // -1

  // BFS order over all components
  std::vector<int32_t> order;
  order.reserve(num_nodes);
  std::vector<char> seen(num_nodes, 0);
  for (int32_t root = 0; root < num_nodes; ++root) {
    if (seen[root]) continue;
    std::queue<int32_t> bfs;
    bfs.push(root);
    seen[root] = 1;
    while (!bfs.empty()) {
      int32_t v = bfs.front();
      bfs.pop();
      order.push_back(v);
      for (int64_t i = deg[v]; i < deg[v + 1]; ++i) {
        int32_t u = adj[i];
        if (!seen[u]) {
          seen[u] = 1;
          bfs.push(u);
        }
      }
    }
  }

  // --- 1. coarsen: size-capped greedy clustering in BFS order ---
  const int64_t cap_cluster =
      std::max<int64_t>(num_nodes / (int64_t{4} * num_parts), 1);
  std::vector<int32_t> cluster(num_nodes, -1);
  std::vector<int64_t> cl_size;
  std::vector<int64_t> cl_deg;
  {
    // sparse scratch: only clusters adjacent to v are touched/reset, so
    // the pass stays O(E) even when many clusters exist
    std::vector<int64_t> cl_nbr(num_nodes, 0);
    std::vector<int32_t> touched;
    for (int32_t v : order) {
      touched.clear();
      for (int64_t i = deg[v]; i < deg[v + 1]; ++i) {
        int32_t c = cluster[adj[i]];
        if (c >= 0) {
          if (cl_nbr[c] == 0) touched.push_back(c);
          cl_nbr[c]++;
        }
      }
      int32_t best = -1;
      int64_t best_w = 0;
      for (int32_t c : touched) {
        if (cl_nbr[c] > best_w && cl_size[c] < cap_cluster) {
          best_w = cl_nbr[c];
          best = c;
        }
        cl_nbr[c] = 0;
      }
      if (best < 0) {
        best = static_cast<int32_t>(cl_size.size());
        cl_size.push_back(0);
        cl_deg.push_back(0);
      }
      cluster[v] = best;
      cl_size[best]++;
      cl_deg[best] += deg[v + 1] - deg[v];
    }
  }
  const int32_t num_cl = static_cast<int32_t>(cl_size.size());

  // --- coarse edge weights: sort (min,max) cluster pairs, run-length ---
  std::vector<int64_t> pairs;
  pairs.reserve(num_edges);
  for (int64_t e = 0; e < num_edges; ++e) {
    int32_t a = cluster[senders[e]], b = cluster[receivers[e]];
    if (a == b) continue;
    if (a > b) std::swap(a, b);
    pairs.push_back(static_cast<int64_t>(a) * num_cl + b);
  }
  std::sort(pairs.begin(), pairs.end());

  // --- 2. LDG over clusters, heaviest-degree first, edge-weighted ---
  std::vector<int32_t> cl_order(num_cl);
  for (int32_t c = 0; c < num_cl; ++c) cl_order[c] = c;
  std::sort(cl_order.begin(), cl_order.end(),
            [&](int32_t a, int32_t b) { return cl_deg[a] > cl_deg[b]; });
  // coarse CSR from the sorted pair list (weights = multiplicity)
  std::vector<std::vector<std::pair<int32_t, int64_t>>> cadj(num_cl);
  for (size_t i = 0; i < pairs.size();) {
    size_t j = i;
    while (j < pairs.size() && pairs[j] == pairs[i]) ++j;
    int32_t a = static_cast<int32_t>(pairs[i] / num_cl);
    int32_t b = static_cast<int32_t>(pairs[i] % num_cl);
    int64_t w = static_cast<int64_t>(j - i);
    cadj[a].push_back({b, w});
    cadj[b].push_back({a, w});
    i = j;
  }
  // Greedy max-attachment assignment (Prim-style) under HARD degree/node
  // caps. Streaming orders fail here two ways (both measured): LDG's
  // multiplicative balance is dominated by the coarse weights (every
  // cluster chases one partition, 15% intra), and heaviest-first majority
  // seeds one community's clusters across several partitions (49% intra).
  // Instead: repeatedly place the UNASSIGNED cluster with the strongest
  // edge weight to any feasible partition — communities agglomerate into
  // one partition each until its cap forces a spill; zero-attachment
  // clusters (new communities) seed the least-loaded feasible partition,
  // heaviest first.
  //
  // The max-attachment search runs through a lazy-deletion max-heap: every
  // att increase pushes a fresh (weight, cluster, partition) entry, so the
  // current maximum is always present; popped entries are discarded when
  // stale (cluster already placed, weight superseded) or infeasible
  // (caps only grow, so infeasibility is permanent). A naive rescan is
  // O(num_cl^2 * num_parts) — fragmented or weakly-community graphs
  // produce num_cl ~ n clusters and the rescan effectively hangs.
  std::vector<int32_t> cl_part(num_cl, -1);
  // att[c][p]: edge weight from unassigned cluster c into partition p
  std::vector<double> att(static_cast<size_t>(num_cl) * num_parts, 0.0);
  struct AttEntry {
    double w;
    int32_t r;     // cluster's rank in cl_order (heaviest first)
    int32_t c, p;
    bool operator<(const AttEntry& o) const {
      if (w != o.w) return w < o.w;
      if (r != o.r) return r > o.r;  // ties: heavier cluster first
      return p > o.p;                // then lower partition id
    }
  };
  std::vector<int32_t> cl_rank(num_cl);
  for (int32_t i = 0; i < num_cl; ++i) cl_rank[cl_order[i]] = i;
  std::priority_queue<AttEntry> heap;
  size_t seed_ptr = 0;  // advancing cursor into cl_order for seeding
  for (int32_t placed = 0; placed < num_cl; ++placed) {
    int32_t best_c = -1, best_p = -1;
    while (!heap.empty()) {
      AttEntry top = heap.top();
      heap.pop();
      if (cl_part[top.c] >= 0 ||
          top.w != att[static_cast<size_t>(top.c) * num_parts + top.p] ||
          part_deg[top.p] + static_cast<double>(cl_deg[top.c]) > cap_deg ||
          part_size[top.p] + cl_size[top.c] > cap_node)
        continue;
      best_c = top.c;
      best_p = top.p;
      break;
    }
    if (best_c < 0) {
      // no positive feasible attachment: seed the heaviest unassigned
      // cluster in the least-loaded feasible partition
      while (seed_ptr < cl_order.size() && cl_part[cl_order[seed_ptr]] >= 0)
        ++seed_ptr;
      best_c = cl_order[seed_ptr];
      double mn = 0.0;
      for (int32_t p = 0; p < num_parts; ++p) {
        bool fits =
            part_deg[p] + static_cast<double>(cl_deg[best_c]) <= cap_deg &&
            part_size[p] + cl_size[best_c] <= cap_node;
        if (best_p < 0 ? true : (fits && part_deg[p] < mn)) {
          if (best_p < 0 && !fits) continue;
          best_p = p;
          mn = part_deg[p];
        }
      }
      if (best_p < 0) {  // truly all full -> least-loaded by degree
        double m2 = part_deg[0];
        best_p = 0;
        for (int32_t p = 1; p < num_parts; ++p)
          if (part_deg[p] < m2) { m2 = part_deg[p]; best_p = p; }
      }
    }
    cl_part[best_c] = best_p;
    part_size[best_p] += cl_size[best_c];
    part_deg[best_p] += static_cast<double>(cl_deg[best_c]);
    for (auto& [d, w] : cadj[best_c])
      if (cl_part[d] < 0) {
        double& a = att[static_cast<size_t>(d) * num_parts + best_p];
        a += static_cast<double>(w);
        heap.push({a, cl_rank[d], d, best_p});
      }
  }

  // --- 3. project to nodes ---
  for (int32_t v = 0; v < num_nodes; ++v) part_out[v] = cl_part[cluster[v]];

  // refinement sweeps: move boundary nodes to their majority partition
  // while both caps permit; iterate until moves die out (<0.1% of nodes).
  // One sweep recovered only ~52% intra-partition edges on a
  // community-structured 117M-edge graph; converged sweeps recover the
  // community structure the stream order fragmented.
  const double max_deg = cap_deg * 1.02;
  const double max_node = cap_node * 1.02;
  for (int sweep = 0; sweep < 12; ++sweep) {
    int64_t moves = 0;
    for (int32_t v = 0; v < num_nodes; ++v) {
      const double dv = static_cast<double>(deg[v + 1] - deg[v]);
      std::fill(nbr_count.begin(), nbr_count.end(), 0);
      for (int64_t i = deg[v]; i < deg[v + 1]; ++i)
        nbr_count[part_out[adj[i]]]++;
      int32_t cur = part_out[v];
      int32_t best = cur;
      for (int32_t p = 0; p < num_parts; ++p) {
        if (p == cur) continue;
        if (nbr_count[p] > nbr_count[best]
            && part_deg[p] + dv <= max_deg
            && part_size[p] + 1 <= max_node)
          best = p;
      }
      if (best != cur) {
        part_out[v] = best;
        part_size[cur]--;
        part_size[best]++;
        part_deg[cur] -= dv;
        part_deg[best] += dv;
        moves++;
      }
    }
    if (moves * 1000 < num_nodes) break;
  }
}

void greedy_partition(const int32_t* senders, const int32_t* receivers,
                      int64_t num_edges, int32_t num_nodes,
                      int32_t num_parts, int32_t* part_out) {
  greedy_partition_ex(senders, receivers, num_edges, num_nodes, num_parts,
                      1.05, 1.35, part_out);
}

// cut quality metric: number of edges crossing partitions
int64_t count_cut_edges(const int32_t* senders, const int32_t* receivers,
                        int64_t num_edges, const int32_t* part) {
  int64_t cut = 0;
  for (int64_t e = 0; e < num_edges; ++e)
    if (part[senders[e]] != part[receivers[e]]) cut++;
  return cut;
}

}  // extern "C"
