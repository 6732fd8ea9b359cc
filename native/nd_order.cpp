// Nested-dissection fill-reducing ordering (SURVEY.md §2.2 S7 — the
// framework's counterpart of the reference's vendored METIS option,
// gtsam Ordering::Metis).
//
// Recursive bisection with BFS level-structure vertex separators:
//   - pseudo-peripheral start (3 BFS sweeps),
//   - separator = narrowest BFS level inside the 25-75% mass window,
//     shrunk to the vertices actually adjacent to the far side,
//   - children ordered first, separator last  =>  BALANCED elimination
//     tree (depth O(log N) on near-chain SLAM graphs) — what the
//     level-batched TPU supernodal kernels need.
//   - leaves (<= leaf_size <= 64) by local min-degree over uint64
//     adjacency bitmasks.
//
// C ABI (ctypes):
//   int nd_order(int64 n, const int64* indptr, const int64* indices,
//                int64 leaf_size, int64* perm);
// indptr/indices: CSR adjacency (no self loops, symmetric). perm: output,
// perm[k] = variable eliminated at step k. Returns 0 on success.

#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

using i64 = std::int64_t;

struct NDState {
  i64 n;
  const i64 *indptr, *indices;
  i64 leaf_size;
  std::vector<i64> stamp, level, queue, order;
  i64 sid = 0;

  NDState(i64 n_, const i64* ip, const i64* ix, i64 ls)
      : n(n_), indptr(ip), indices(ix), leaf_size(ls),
        stamp(n_, -1), level(n_, -1) {
    queue.reserve(n_);
    order.reserve(n_);
  }

  // BFS within {v : stamp[v] == sid} from start; levels into level[].
  // Returns the number of levels (max level + 1).
  i64 bfs(const std::vector<i64>& verts, i64 start) {
    for (i64 v : verts) level[v] = -1;
    queue.clear();
    queue.push_back(start);
    level[start] = 0;
    i64 maxlv = 0;
    for (size_t h = 0; h < queue.size(); ++h) {
      i64 v = queue[h];
      i64 lv = level[v];
      for (i64 p = indptr[v]; p < indptr[v + 1]; ++p) {
        i64 u = indices[p];
        if (stamp[u] == sid && level[u] < 0) {
          level[u] = lv + 1;
          if (lv + 1 > maxlv) maxlv = lv + 1;
          queue.push_back(u);
        }
      }
    }
    return maxlv + 1;
  }

  i64 pseudo_peripheral(const std::vector<i64>& verts) {
    i64 v = verts[0];
    for (int sweep = 0; sweep < 3; ++sweep) {
      i64 nlv = bfs(verts, v);
      i64 nxt = v;
      for (i64 u : verts)
        if (level[u] == nlv - 1) { nxt = u; break; }
      if (nxt == v) break;
      v = nxt;
    }
    return v;
  }

  // local min-degree on <= 64 vertices via uint64 adjacency masks
  void leaf_md(const std::vector<i64>& verts) {
    const int m = static_cast<int>(verts.size());
    std::vector<std::uint64_t> adj(m, 0);
    // map global -> local via stamp trick: reuse level[] as local index
    for (int i = 0; i < m; ++i) level[verts[i]] = i;
    for (int i = 0; i < m; ++i) {
      i64 v = verts[i];
      for (i64 p = indptr[v]; p < indptr[v + 1]; ++p) {
        i64 u = indices[p];
        if (stamp[u] == sid) adj[i] |= (1ull << level[u]);
      }
    }
    std::uint64_t alive = (m == 64) ? ~0ull : ((1ull << m) - 1);
    for (int step = 0; step < m; ++step) {
      int best = -1, bestdeg = m + 1;
      for (int i = 0; i < m; ++i) {
        if (!(alive & (1ull << i))) continue;
        int deg = __builtin_popcountll(adj[i] & alive);
        if (deg < bestdeg) { bestdeg = deg; best = i; }
      }
      order.push_back(verts[best]);
      alive &= ~(1ull << best);
      std::uint64_t nb = adj[best] & alive;
      for (int i = 0; i < m; ++i)
        if (nb & (1ull << i)) adj[i] |= nb;  // clique the neighbors
    }
  }

  void run() {
    // explicit stack: (verts, emit) — emit=true appends verts verbatim
    std::vector<std::pair<std::vector<i64>, bool>> stack;
    std::vector<i64> all(n);
    for (i64 i = 0; i < n; ++i) all[i] = i;
    stack.emplace_back(std::move(all), false);
    while (!stack.empty()) {
      auto [verts, emit] = std::move(stack.back());
      stack.pop_back();
      if (emit) {
        for (i64 v : verts) order.push_back(v);
        continue;
      }
      if ((i64)verts.size() <= leaf_size) {
        ++sid;
        for (i64 v : verts) stamp[v] = sid;
        leaf_md(verts);
        continue;
      }
      ++sid;
      for (i64 v : verts) stamp[v] = sid;
      i64 src = pseudo_peripheral(verts);
      i64 nlv = bfs(verts, src);

      // disconnected: split reached / unreached
      std::vector<i64> reached, unreached;
      for (i64 v : verts)
        (level[v] >= 0 ? reached : unreached).push_back(v);
      if (!unreached.empty()) {
        stack.emplace_back(std::move(unreached), false);
        stack.emplace_back(std::move(reached), false);
        continue;
      }
      if (nlv < 3) {  // tiny diameter: no useful separator
        leaf_md_any(verts);
        continue;
      }
      // narrowest level in the 25-75% mass window. mid MUST stay within
      // [1, nlv-2]: mid = nlv-1 would make B (= levels > mid) and S empty
      // and A == verts — no progress, infinite recursion (hit on arrowhead
      // landmark graphs whose BFS mass concentrates in the last level).
      std::vector<i64> width(nlv, 0);
      for (i64 v : verts) ++width[level[v]];
      i64 quarter = (i64)verts.size() / 4;
      i64 lo = 1, hi = nlv - 2, acc = 0;
      for (i64 l = 0; l < nlv; ++l) {
        acc += width[l];
        if (acc <= quarter) lo = std::max<i64>(1, l + 1);
        if (acc < 3 * quarter) hi = std::min<i64>(nlv - 2, l + 1);
      }
      lo = std::min<i64>(lo, nlv - 2);
      if (hi < lo) hi = lo;
      i64 mid = lo;
      for (i64 l = lo; l <= hi; ++l)
        if (width[l] < width[mid]) mid = l;

      std::vector<i64> A, B, S;
      for (i64 v : verts) {
        if (level[v] < mid) A.push_back(v);
        else if (level[v] > mid) B.push_back(v);
        else {
          bool sep = false;
          for (i64 p = indptr[v]; p < indptr[v + 1] && !sep; ++p) {
            i64 u = indices[p];
            if (stamp[u] == sid && level[u] == mid + 1) sep = true;
          }
          (sep ? S : A).push_back(v);
        }
      }
      // LIFO: push separator first so it's emitted after both children
      stack.emplace_back(std::move(S), true);
      if (!B.empty()) stack.emplace_back(std::move(B), false);
      if (!A.empty()) stack.emplace_back(std::move(A), false);
    }
  }

  // min-degree for a not-necessarily-small set (tiny-diameter case);
  // chunks of 64 via leaf_md is wrong (ignores cross-chunk edges), so use
  // a simple greedy peel by current degree — these sets are small cliquish
  // clusters where any order has similar fill.
  void leaf_md_any(const std::vector<i64>& verts) {
    if ((i64)verts.size() <= 64) { leaf_md(verts); return; }
    // degree-ascending static order (cheap, adequate for dense clusters)
    std::vector<std::pair<i64, i64>> dv;
    dv.reserve(verts.size());
    for (i64 v : verts) {
      i64 d = 0;
      for (i64 p = indptr[v]; p < indptr[v + 1]; ++p)
        if (stamp[indices[p]] == sid) ++d;
      dv.emplace_back(d, v);
    }
    std::sort(dv.begin(), dv.end());
    for (auto& [d, v] : dv) order.push_back(v);
  }
};

}  // namespace

extern "C" int nd_order(i64 n, const i64* indptr, const i64* indices,
                        i64 leaf_size, i64* perm) {
  if (n <= 0) return 0;
  if (leaf_size < 2) leaf_size = 2;
  if (leaf_size > 64) leaf_size = 64;
  NDState st(n, indptr, indices, leaf_size);
  st.run();
  if ((i64)st.order.size() != n) return 1;
  for (i64 i = 0; i < n; ++i) perm[i] = st.order[i];
  return 0;
}
