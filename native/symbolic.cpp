// Symbolic Cholesky factorization (SURVEY.md §2.2 S8 — the host-side
// counterpart of GTSAM's EliminationTree/JunctionTree symbolic phase).
//
// Given the variable adjacency and an elimination order, computes the
// column structure of the Cholesky factor L (struct[j] = sorted nonzero
// positions below j, in elimination positions) and the elimination-tree
// parent array, by the standard child-merge recurrence:
//
//   struct[j] = (original entries below j)  U  ( U_{c: parent(c)=j}
//               struct[c] \ {j} ),   parent[j] = min(struct[j]).
//
// Runs in O(nnz(L) * avg-merge) with a boolean workspace — replaces the
// quadratic set-based Python fallback in gpslam_tpu/ops/order.py, making
// the general supernodal path's setup practical at KITTI-scale graphs.
//
// C ABI (ctypes):
//   int64 symbolic_factor(int64 n, const int64* indptr, const int64*
//       indices, const int64* perm, int64* out_parent, int64* out_sptr,
//       int64* out_sidx, int64 cap);
// indptr/indices: CSR adjacency (symmetric, no self loops); perm[k] = the
// variable eliminated at step k. Outputs (all in elimination positions):
// out_parent (n), out_sptr (n+1), out_sidx (cap). Returns nnz(L offdiag)
// on success; -(needed) if cap is too small (caller re-allocates and
// retries); -1 on bad input.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" std::int64_t symbolic_factor(
    std::int64_t n, const std::int64_t* indptr, const std::int64_t* indices,
    const std::int64_t* perm, std::int64_t* out_parent, std::int64_t* out_sptr,
    std::int64_t* out_sidx, std::int64_t cap) {
  if (n < 0) return -1;
  if (n == 0) {
    out_sptr[0] = 0;
    return 0;
  }
  std::vector<std::int64_t> pos(n);
  for (std::int64_t k = 0; k < n; ++k) {
    std::int64_t v = perm[k];
    if (v < 0 || v >= n) return -1;
    pos[v] = k;
  }
  // children linked lists over the etree, discovered as we go
  std::vector<std::int64_t> first_child(n, -1), next_sibling(n, -1);
  std::vector<char> mark(n, 0);
  std::vector<std::int64_t> cur;           // current column's structure
  std::vector<std::vector<std::int64_t>> lstruct(n);

  std::int64_t nnz = 0;
  out_sptr[0] = 0;
  for (std::int64_t j = 0; j < n; ++j) {
    cur.clear();
    std::int64_t v = perm[j];
    // original entries strictly below j
    for (std::int64_t p = indptr[v]; p < indptr[v + 1]; ++p) {
      std::int64_t i = pos[indices[p]];
      if (i > j && !mark[i]) {
        mark[i] = 1;
        cur.push_back(i);
      }
    }
    // merge children's structures (minus j itself)
    for (std::int64_t c = first_child[j]; c >= 0; c = next_sibling[c]) {
      for (std::int64_t i : lstruct[c]) {
        if (i != j && !mark[i]) {
          mark[i] = 1;
          cur.push_back(i);
        }
      }
    }
    std::sort(cur.begin(), cur.end());
    for (std::int64_t i : cur) mark[i] = 0;

    std::int64_t parent = cur.empty() ? -1 : cur.front();
    out_parent[j] = parent;
    if (parent >= 0) {
      next_sibling[j] = first_child[parent];
      first_child[parent] = j;
    }
    nnz += static_cast<std::int64_t>(cur.size());
    out_sptr[j + 1] = nnz;
    if (nnz <= cap) {
      std::copy(cur.begin(), cur.end(), out_sidx + out_sptr[j]);
    }
    lstruct[j] = cur;
  }
  if (nnz > cap) return -nnz;
  return nnz;
}
