// Greedy streaming graph partitioner (LDG-style) — the framework's native
// replacement for METIS (the reference partitions via PyG ClusterData ->
// METIS C library, reference main.py:63). Produces balanced node partitions
// that minimize cut edges; partitions map onto TPU cores.
//
// Algorithm: nodes streamed in BFS order from a degree-weighted seed; each
// node goes to the partition maximizing
//     |neighbors already in p| * (1 - size_p / capacity)
// (Linear Deterministic Greedy, Stanton & Kliot 2012). A second refinement
// sweep moves boundary nodes to their majority partition when balance
// permits. O(E) per sweep, no external dependencies.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// senders/receivers: COO edge list (directed; symmetrized internally)
// part_out: int32[N] partition id per node
void greedy_partition(const int32_t* senders, const int32_t* receivers,
                      int64_t num_edges, int32_t num_nodes,
                      int32_t num_parts, int32_t* part_out) {
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

  const double capacity =
      static_cast<double>(num_nodes) / num_parts + 1.0;
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

  // LDG assignment
  for (int32_t v : order) {
    std::fill(nbr_count.begin(), nbr_count.end(), 0);
    for (int64_t i = deg[v]; i < deg[v + 1]; ++i) {
      int32_t p = part_out[adj[i]];
      if (p >= 0) nbr_count[p]++;
    }
    int32_t best = 0;
    double best_score = -1.0;
    for (int32_t p = 0; p < num_parts; ++p) {
      double balance = 1.0 - part_size[p] / capacity;
      if (balance <= 0) continue;
      double score = (nbr_count[p] + 1e-3) * balance;
      if (score > best_score) {
        best_score = score;
        best = p;
      }
    }
    if (best_score < 0) {  // all full (shouldn't happen) -> smallest
      int64_t mn = part_size[0];
      best = 0;
      for (int32_t p = 1; p < num_parts; ++p)
        if (part_size[p] < mn) { mn = part_size[p]; best = p; }
    }
    part_out[v] = best;
    part_size[best]++;
  }

  // one refinement sweep: move to majority partition if balance allows
  const double max_size = capacity * 1.02;
  for (int32_t v = 0; v < num_nodes; ++v) {
    std::fill(nbr_count.begin(), nbr_count.end(), 0);
    for (int64_t i = deg[v]; i < deg[v + 1]; ++i)
      nbr_count[part_out[adj[i]]]++;
    int32_t cur = part_out[v];
    int32_t best = cur;
    for (int32_t p = 0; p < num_parts; ++p) {
      if (p == cur) continue;
      if (nbr_count[p] > nbr_count[best] && part_size[p] + 1 <= max_size)
        best = p;
    }
    if (best != cur) {
      part_out[v] = best;
      part_size[cur]--;
      part_size[best]++;
    }
  }
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
