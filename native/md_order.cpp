// Minimum-degree fill-reducing ordering (SURVEY.md §2.2 S7 — the TPU-native
// framework's counterpart of the reference's vendored CCOLAMD/COLAMD C code).
//
// Greedy minimum-degree on the undirected variable-adjacency graph with
// explicit elimination-clique formation. Host-side symbolic work runs once
// per sparsity pattern (SURVEY.md §7), so simplicity and robustness beat
// asymptotic tricks here; the quotient-graph AMD refinement can replace the
// interior loop without changing the ABI.
//
// C ABI (ctypes):
//   int md_order(int64 n, const int64* indptr, const int64* indices,
//                int64* perm);
// indptr/indices: CSR adjacency (no self loops, symmetric). perm: output,
// perm[k] = variable eliminated at step k. Returns 0 on success.

#include <cstdint>
#include <vector>
#include <unordered_set>
#include <algorithm>

extern "C" int md_order(std::int64_t n, const std::int64_t* indptr,
                        const std::int64_t* indices, std::int64_t* perm) {
  if (n <= 0) return 0;
  std::vector<std::unordered_set<std::int64_t>> adj(n);
  for (std::int64_t i = 0; i < n; ++i) {
    for (std::int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      std::int64_t j = indices[p];
      if (j == i || j < 0 || j >= n) continue;
      adj[i].insert(j);
      adj[j].insert(i);
    }
  }
  std::vector<char> eliminated(n, 0);
  // simple bucketed min-degree selection
  for (std::int64_t k = 0; k < n; ++k) {
    std::int64_t best = -1;
    std::size_t best_deg = static_cast<std::size_t>(-1);
    for (std::int64_t i = 0; i < n; ++i) {
      if (!eliminated[i] && adj[i].size() < best_deg) {
        best = i;
        best_deg = adj[i].size();
        if (best_deg == 0) break;
      }
    }
    if (best < 0) return 1;
    perm[k] = best;
    eliminated[best] = 1;
    // form the elimination clique among best's neighbors
    std::vector<std::int64_t> nbrs(adj[best].begin(), adj[best].end());
    for (std::size_t a = 0; a < nbrs.size(); ++a) {
      adj[nbrs[a]].erase(best);
      for (std::size_t b = a + 1; b < nbrs.size(); ++b) {
        adj[nbrs[a]].insert(nbrs[b]);
        adj[nbrs[b]].insert(nbrs[a]);
      }
    }
    adj[best].clear();
  }
  return 0;
}
