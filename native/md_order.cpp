// Minimum-degree fill-reducing ordering (SURVEY.md §2.2 S7 — the TPU-native
// framework's counterpart of the reference's vendored CCOLAMD/COLAMD C code).
//
// Greedy minimum-degree on the undirected variable-adjacency graph with
// explicit elimination-clique formation. Pivot selection uses degree
// buckets (doubly-linked lists per degree, rising min-degree cursor) so
// selection is amortized O(1) instead of an O(n) scan per step; the
// remaining cost is clique formation, which is what AMD's quotient-graph
// refinement would remove without changing this ABI. Host-side symbolic
// work runs once per sparsity pattern (SURVEY.md §7).
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

namespace {

struct Buckets {
  std::vector<std::int64_t> head, nxt, prv, deg;
  std::int64_t mindeg = 0;

  explicit Buckets(std::int64_t n)
      : head(n + 1, -1), nxt(n, -1), prv(n, -1), deg(n, 0) {}

  void insert(std::int64_t i, std::int64_t d) {
    deg[i] = d;
    nxt[i] = head[d];
    prv[i] = -1;
    if (head[d] >= 0) prv[head[d]] = i;
    head[d] = i;
    if (d < mindeg) mindeg = d;
  }

  void remove(std::int64_t i) {
    if (prv[i] >= 0) nxt[prv[i]] = nxt[i];
    else head[deg[i]] = nxt[i];
    if (nxt[i] >= 0) prv[nxt[i]] = prv[i];
  }

  std::int64_t pop_min(std::int64_t n) {
    while (mindeg <= n && head[mindeg] < 0) ++mindeg;
    if (mindeg > n) return -1;
    std::int64_t i = head[mindeg];
    remove(i);
    return i;
  }
};

}  // namespace

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
  Buckets bk(n);
  for (std::int64_t i = 0; i < n; ++i)
    bk.insert(i, static_cast<std::int64_t>(adj[i].size()));

  std::vector<char> eliminated(n, 0);
  for (std::int64_t k = 0; k < n; ++k) {
    std::int64_t best = bk.pop_min(n);
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
    for (std::int64_t a : nbrs) {
      if (eliminated[a]) continue;
      std::int64_t d = static_cast<std::int64_t>(adj[a].size());
      if (d != bk.deg[a]) {
        bk.remove(a);
        bk.insert(a, d);
      }
    }
  }
  return 0;
}
