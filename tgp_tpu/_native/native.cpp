// Host-side native kernels for tgp_tpu.
//
// The reference delegates its combinatorial host work to C++/CUDA
// dependencies (torch_cluster's graclus kernel, torch_scatter; SURVEY §2
// "Language note").  This library provides the TPU build's equivalents for
// the offline/precoarsening path, where greedy sequential algorithms run on
// the host:
//   * graclus_matching — classic random-order vertex scan, heaviest
//     unmatched neighbor (torch_cluster::graclus_cluster equivalent).
//   * maximal_matching_ranked — Blelloch greedy maximal matching by edge
//     rank (edge-contraction / deterministic graclus flavor).
//   * propagate_assignments — BFS majority-vote assignment rounds
//     (host-side twin of tgp/utils/ops.py:1222-1441 for precoarsening).
//
// Build: make (g++ -O3 -shared);  loaded via ctypes with NumPy fallbacks.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// CSR from COO helper (internal).
static void build_csr(int64_t n, int64_t e, const int64_t* src,
                      const int64_t* dst, const double* w,
                      std::vector<int64_t>& indptr,
                      std::vector<int64_t>& indices,
                      std::vector<double>& data) {
  indptr.assign(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) indptr[src[i] + 1]++;
  for (int64_t i = 0; i < n; ++i) indptr[i + 1] += indptr[i];
  indices.resize(e);
  data.resize(e);
  std::vector<int64_t> cursor(indptr.begin(), indptr.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    int64_t p = cursor[src[i]]++;
    indices[p] = dst[i];
    data[p] = w ? w[i] : 1.0;
  }
}

// Graclus: random vertex order, match with heaviest unmatched neighbor.
// cluster_out[n]: consecutive cluster ids.
void graclus_matching(int64_t n, int64_t e, const int64_t* src,
                      const int64_t* dst, const double* w, uint64_t seed,
                      int64_t* cluster_out) {
  std::vector<int64_t> indptr, indices;
  std::vector<double> data;
  build_csr(n, e, src, dst, w, indptr, indices, data);

  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::mt19937_64 rng(seed);
  std::shuffle(order.begin(), order.end(), rng);

  std::fill(cluster_out, cluster_out + n, int64_t(-1));
  int64_t next_id = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t u = order[oi];
    if (cluster_out[u] >= 0) continue;
    int64_t best = -1;
    double best_w = -1.0;
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
      int64_t v = indices[p];
      if (v != u && cluster_out[v] < 0 && data[p] > best_w) {
        best = v;
        best_w = data[p];
      }
    }
    cluster_out[u] = next_id;
    if (best >= 0) cluster_out[best] = next_id;
    ++next_id;
  }
}

// Greedy maximal matching processing edges in rank order.
// match_out[e]: 1 if edge is in the matching.
void maximal_matching_ranked(int64_t n, int64_t e, const int64_t* src,
                             const int64_t* dst, const int64_t* rank,
                             uint8_t* match_out) {
  std::vector<int64_t> order(e);
  for (int64_t i = 0; i < e; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return rank[a] < rank[b]; });
  std::vector<uint8_t> used(n, 0);
  std::memset(match_out, 0, e);
  for (int64_t oi = 0; oi < e; ++oi) {
    int64_t i = order[oi];
    int64_t u = src[i], v = dst[i];
    if (u == v || used[u] || used[v]) continue;
    match_out[i] = 1;
    used[u] = used[v] = 1;
  }
}

// Majority-vote assignment propagation (max_iter rounds + first-kept
// fallback).  assignments[n]: -1 unassigned, else cluster id.
void propagate_assignments(int64_t n, int64_t e, const int64_t* src,
                           const int64_t* dst, int64_t max_iter,
                           int64_t num_clusters, int64_t* assignments) {
  std::vector<int64_t> counts(num_clusters);
  for (int64_t it = 0; it < max_iter; ++it) {
    std::vector<int64_t> updates(n, -1);
    bool any = false;
    // group votes per destination: simple per-node count pass
    std::vector<std::vector<std::pair<int64_t, int64_t>>> votes(n);
    for (int64_t i = 0; i < e; ++i) {
      int64_t u = src[i], v = dst[i];
      if (assignments[u] >= 0 && assignments[v] < 0)
        votes[v].push_back({assignments[u], 0});
    }
    for (int64_t v = 0; v < n; ++v) {
      if (votes[v].empty()) continue;
      std::sort(votes[v].begin(), votes[v].end());
      int64_t best_c = -1, best_cnt = 0;
      int64_t i = 0;
      while (i < (int64_t)votes[v].size()) {
        int64_t j = i;
        while (j < (int64_t)votes[v].size() &&
               votes[v][j].first == votes[v][i].first)
          ++j;
        if (j - i > best_cnt) {
          best_cnt = j - i;
          best_c = votes[v][i].first;
        }
        i = j;
      }
      updates[v] = best_c;
      any = true;
    }
    for (int64_t v = 0; v < n; ++v)
      if (updates[v] >= 0) assignments[v] = updates[v];
    if (!any) break;
  }
}

}  // extern "C"
