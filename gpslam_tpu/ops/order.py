"""Host-side symbolic analysis: fill-reducing ordering + elimination tree
(SURVEY.md §2.2 S7-S8; reference: gtsam/inference/Ordering + vendored
CCOLAMD C code, elimination/junction trees).

Runs ONCE per sparsity pattern on the host (§7 architecture principle) and
feeds the general sparse solver path. The minimum-degree ordering is a C++
extension (native/md_order.cpp), compiled on first use and loaded via
ctypes, with a pure-numpy fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIBS = {}

_I64P = ctypes.POINTER(ctypes.c_int64)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def _load_native(name: str = "md_order") -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load a native/<name>.cpp library."""
    if name in _LIBS:
        return _LIBS[name]
    _LIBS[name] = None
    src = os.path.join(_repo_root(), "native", f"{name}.cpp")
    if not os.path.exists(src):
        return None
    cache = os.path.join(tempfile.gettempdir(), "gpslam_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"lib{name}.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so)
        if name == "md_order":
            lib.md_order.restype = ctypes.c_int
            lib.md_order.argtypes = [ctypes.c_int64] + [_I64P] * 3
        elif name == "nd_order":
            lib.nd_order.restype = ctypes.c_int
            lib.nd_order.argtypes = (
                [ctypes.c_int64] + [_I64P] * 2 + [ctypes.c_int64, _I64P]
            )
        elif name == "symbolic":
            lib.symbolic_factor.restype = ctypes.c_int64
            lib.symbolic_factor.argtypes = (
                [ctypes.c_int64] + [_I64P] * 6 + [ctypes.c_int64]
            )
        elif name == "fastload":
            _F64PP = ctypes.POINTER(ctypes.POINTER(ctypes.c_double))
            lib.fl_count.restype = ctypes.c_int
            lib.fl_count.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, _I64P,
            ]
            lib.fl_fill.restype = ctypes.c_int
            lib.fl_fill.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64, _F64PP, _I64P,
            ]
        _LIBS[name] = lib
    except OSError:
        return None
    return _LIBS[name]


def adjacency_from_graph(graph, values) -> Tuple[np.ndarray, np.ndarray, list]:
    """Block-variable CSR adjacency from a factor graph.

    Variables are numbered group-by-group in `values` order; returns
    (indptr, indices, var_names[(group, local_index)]).
    """
    import jax

    offsets = {}
    names = []
    off = 0
    for g, v in values.items():
        n = jax.tree_util.tree_leaves(v)[0].shape[0]
        offsets[g] = off
        names.extend((g, i) for i in range(n))
        off += n
    nvar = off
    pairs = set()
    for b in graph.batches:
        idx = [np.asarray(ix) for ix in b.idx]
        for m in range(idx[0].shape[0]):
            vs = [offsets[g] + int(idx[s][m]) for s, g in enumerate(b.groups)]
            for a in range(len(vs)):
                for c in range(a + 1, len(vs)):
                    if vs[a] != vs[c]:
                        pairs.add((min(vs[a], vs[c]), max(vs[a], vs[c])))
    adj = [[] for _ in range(nvar)]
    for a, c in pairs:
        adj[a].append(c)
        adj[c].append(a)
    indptr = np.zeros(nvar + 1, np.int64)
    for i in range(nvar):
        indptr[i + 1] = indptr[i] + len(adj[i])
    indices = np.zeros(indptr[-1], np.int64)
    for i in range(nvar):
        indices[indptr[i] : indptr[i + 1]] = sorted(adj[i])
    return indptr, indices, names


def min_degree_ordering(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Fill-reducing elimination order; native C++ if available else numpy."""
    n = indptr.shape[0] - 1
    lib = _load_native()
    if lib is not None:
        perm = np.zeros(n, np.int64)
        rc = lib.md_order(
            ctypes.c_int64(n),
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc == 0:
            return perm
    return _min_degree_py(indptr, indices)


def _min_degree_py(indptr, indices):
    n = indptr.shape[0] - 1
    adj = [set(indices[indptr[i] : indptr[i + 1]].tolist()) for i in range(n)]
    eliminated = np.zeros(n, bool)
    perm = np.zeros(n, np.int64)
    for k in range(n):
        degs = np.array([len(adj[i]) if not eliminated[i] else n + 1
                         for i in range(n)])
        best = int(np.argmin(degs))
        perm[k] = best
        eliminated[best] = True
        nbrs = list(adj[best])
        for a in nbrs:
            adj[a].discard(best)
        for ai in range(len(nbrs)):
            for bi in range(ai + 1, len(nbrs)):
                adj[nbrs[ai]].add(nbrs[bi])
                adj[nbrs[bi]].add(nbrs[ai])
        adj[best] = set()
    return perm


def _bfs_levels(indptr, indices, stamp, sid, level, verts, start):
    """BFS levels within the sub-vertex-set `verts` (those with stamp == sid),
    written into `level` (global scratch, reset for `verts` only — O(|verts|),
    never O(n)). Vectorized numpy frontier expansion."""
    level[verts] = -1
    level[start] = 0
    frontier = np.asarray([start], np.int64)
    lv = 0
    while frontier.size:
        counts = indptr[frontier + 1] - indptr[frontier]
        tot = counts.sum()
        if tot == 0:
            break
        starts = indptr[frontier]
        offs = np.repeat(starts, counts) + (
            np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        nbrs = indices[offs]
        nbrs = nbrs[(stamp[nbrs] == sid) & (level[nbrs] < 0)]
        nbrs = np.unique(nbrs)
        lv += 1
        level[nbrs] = lv
        frontier = nbrs


def _pseudo_peripheral(indptr, indices, stamp, sid, level, verts):
    """A few BFS sweeps to find a vertex of near-maximal eccentricity."""
    v = int(verts[0])
    for _ in range(3):
        _bfs_levels(indptr, indices, stamp, sid, level, verts, v)
        lvv = level[verts]
        far = verts[lvv == lvv.max()]
        nxt = int(far[0])
        if nxt == v:
            break
        v = nxt
    return v


def nested_dissection_ordering(indptr: np.ndarray, indices: np.ndarray,
                               leaf_size: int = 64) -> np.ndarray:
    """Nested-dissection-class fill-reducing ordering (SURVEY.md §2.2 S7:
    GTSAM's Ordering::Metis option; reference vendors METIS for the same
    purpose).

    Recursive bisection with BFS level-structure vertex separators:
    children first, separator last — which makes the elimination tree
    BALANCED (depth O(log N) on near-chain SLAM graphs instead of the O(N)
    chains min-degree produces). That balance is what the level-batched TPU
    supernodal kernels need: few wide levels instead of thousands of narrow
    ones. Leaves (<= leaf_size) fall back to local min-degree.

    Native C++ implementation (native/nd_order.cpp) when a compiler is
    available — BFS with tiny frontiers is Python-call-bound on near-chain
    graphs; the numpy fallback below is identical in structure.
    """
    n = indptr.shape[0] - 1
    lib = _load_native("nd_order")
    if lib is not None and n > 0:
        indptr64 = np.ascontiguousarray(indptr, np.int64)
        indices64 = np.ascontiguousarray(indices, np.int64)
        perm = np.zeros(n, np.int64)
        rc = lib.nd_order(
            ctypes.c_int64(n),
            indptr64.ctypes.data_as(_I64P),
            indices64.ctypes.data_as(_I64P),
            ctypes.c_int64(leaf_size),
            perm.ctypes.data_as(_I64P),
        )
        if rc == 0:
            return perm
    order: list = []
    stamp = np.full(n, -1, np.int64)  # split-id stamps: O(|verts|) resets
    level = np.full(n, -1, np.int64)  # BFS scratch
    sid_next = [0]

    def local_md(verts):
        # extract the subgraph and min-degree order it
        gid = {int(v): i for i, v in enumerate(verts)}
        m = len(verts)
        adj = [[] for _ in range(m)]
        vset = set(gid)
        for i, v in enumerate(verts):
            for p in range(indptr[v], indptr[v + 1]):
                u = int(indices[p])
                if u in vset:
                    adj[i].append(gid[u])
        sub_ptr = np.zeros(m + 1, np.int64)
        for i in range(m):
            sub_ptr[i + 1] = sub_ptr[i] + len(adj[i])
        sub_idx = np.zeros(sub_ptr[-1], np.int64)
        for i in range(m):
            sub_idx[sub_ptr[i]:sub_ptr[i + 1]] = sorted(adj[i])
        sub_perm = min_degree_ordering(sub_ptr, sub_idx)
        order.extend(int(verts[q]) for q in sub_perm)

    stack = [(np.arange(n, dtype=np.int64), False)]
    # explicit stack with post-order emission: (verts, emit_separator)
    while stack:
        verts, sep = stack.pop()
        if sep:
            order.extend(int(v) for v in verts)
            continue
        if len(verts) <= leaf_size:
            local_md(verts)
            continue
        sid = sid_next[0]
        sid_next[0] += 1
        stamp[verts] = sid
        src = _pseudo_peripheral(indptr, indices, stamp, sid, level, verts)
        _bfs_levels(indptr, indices, stamp, sid, level, verts, src)
        lv = level[verts]
        unreached = verts[lv < 0]
        reached = verts[lv >= 0]
        if unreached.size:  # disconnected: split by component reach
            stack.append((unreached, False))
            stack.append((reached, False))
            continue
        lmax = lv.max()
        if lmax < 2:  # tiny diameter: no useful separator
            local_md(verts)
            continue
        # candidate separator levels: the 25-75% mass window; pick the
        # NARROWEST level there (loop closures fatten arbitrary levels —
        # the narrow ones are the real bottlenecks)
        widths = np.bincount(lv, minlength=lmax + 1)
        csum = np.cumsum(widths)
        lo = int(np.searchsorted(csum, len(verts) // 4))
        hi = int(np.searchsorted(csum, (3 * len(verts)) // 4))
        lo = max(1, min(lo, lmax - 1))
        hi = max(lo, min(hi, lmax - 1))
        mid = lo + int(np.argmin(widths[lo:hi + 1]))
        lvv = level[verts]
        S0 = verts[lvv == mid]
        # shrink: only level-mid vertices adjacent to level mid+1 actually
        # separate; the rest join A (stamp check: `level` is shared scratch,
        # stale sibling values must not count)
        keep = np.zeros(len(S0), bool)
        for i, v in enumerate(S0):
            nb = indices[indptr[v]:indptr[v + 1]]
            if np.any((level[nb] == mid + 1) & (stamp[nb] == sid)):
                keep[i] = True
        S = S0[keep]
        A = np.concatenate([verts[lvv < mid], S0[~keep]])
        B = verts[lvv > mid]
        # emit order: A, B, then S (LIFO stack: push S first)
        stack.append((S, True))
        if B.size:
            stack.append((B, False))
        if A.size:
            stack.append((A, False))
    perm = np.asarray(order, np.int64)
    assert perm.shape[0] == n and np.unique(perm).shape[0] == n
    return perm


def constrained_ordering(indptr: np.ndarray, indices: np.ndarray,
                         last_mask: np.ndarray,
                         method: str = "md") -> np.ndarray:
    """Constrained fill-reducing ordering: variables with last_mask=True are
    eliminated LAST (GTSAM's Ordering::ColamdConstrainedLast — the
    landmarks-last ordering for SLAM, which confines landmark fill to the
    trailing arrowhead instead of scattering it through the trajectory).

    The non-constrained subgraph is ordered by `method` ("md" min-degree or
    "nd" nested dissection); the constrained group follows in min-degree
    order of its own subgraph.
    """
    n = indptr.shape[0] - 1
    last_mask = np.asarray(last_mask, bool)
    first = np.where(~last_mask)[0]
    last = np.where(last_mask)[0]

    def sub_order(verts):
        if verts.size == 0:
            return verts
        gid = np.full(n, -1, np.int64)
        gid[verts] = np.arange(verts.size)
        adj = [[] for _ in range(verts.size)]
        for i, v in enumerate(verts):
            for p in range(indptr[v], indptr[v + 1]):
                u = gid[indices[p]]
                if u >= 0:
                    adj[i].append(int(u))
        ptr = np.zeros(verts.size + 1, np.int64)
        for i in range(verts.size):
            ptr[i + 1] = ptr[i] + len(adj[i])
        idx = np.zeros(ptr[-1], np.int64)
        for i in range(verts.size):
            idx[ptr[i]:ptr[i + 1]] = sorted(adj[i])
        if method == "nd":
            sp = nested_dissection_ordering(ptr, idx)
        else:
            sp = min_degree_ordering(ptr, idx)
        return verts[sp]

    return np.concatenate([sub_order(first), sub_order(last)])


def fill_of(indptr, indices, perm) -> int:
    """Fill-in (extra factor blocks) of an ordering — for comparing
    orderings; thin wrapper over symbolic_factor."""
    _, _, fill = symbolic_factor(indptr, indices, perm)
    return fill


def symbolic_factor(indptr, indices, perm) -> Tuple[list, np.ndarray, int]:
    """Symbolic elimination in the given order.

    Returns (struct[j] = sorted post-elimination neighbors-above of the j-th
    eliminated variable, parent[] elimination-tree array in elimination
    positions, fill = number of extra off-diagonal block entries created).

    Native C++ child-merge implementation (native/symbolic.cpp, near
    O(nnz L)) when a compiler is available; quadratic set-based numpy
    fallback otherwise — results are identical (both sorted).
    """
    n = indptr.shape[0] - 1
    lib = _load_native("symbolic")
    if lib is not None and n > 0:
        indptr64 = np.ascontiguousarray(indptr, np.int64)
        indices64 = np.ascontiguousarray(indices, np.int64)
        perm64 = np.ascontiguousarray(perm, np.int64)
        parent = np.zeros(n, np.int64)
        sptr = np.zeros(n + 1, np.int64)
        cap = int(4 * len(indices64) + 16 * n)
        for _ in range(2):
            sidx = np.zeros(max(cap, 1), np.int64)
            nnz = lib.symbolic_factor(
                ctypes.c_int64(n),
                indptr64.ctypes.data_as(_I64P),
                indices64.ctypes.data_as(_I64P),
                perm64.ctypes.data_as(_I64P),
                parent.ctypes.data_as(_I64P),
                sptr.ctypes.data_as(_I64P),
                sidx.ctypes.data_as(_I64P),
                ctypes.c_int64(cap),
            )
            if nnz >= 0:
                struct = [
                    sidx[sptr[j] : sptr[j + 1]].tolist() for j in range(n)
                ]
                orig_nnz = len(indices64) // 2
                return struct, parent, int(nnz - orig_nnz)
            if nnz == -1:
                break  # bad input; fall through to the numpy path
            cap = -int(nnz)
    pos = np.zeros(n, np.int64)
    pos[perm] = np.arange(n)
    adj = [set((pos[indices[indptr[i] : indptr[i + 1]]]).tolist())
           for i in perm]
    # adj is now in elimination positions
    orig_nnz = sum(len(a) for a in adj) // 2
    struct = []
    parent = np.full(n, -1, np.int64)
    for j in range(n):
        above = sorted(a for a in adj[j] if a > j)
        struct.append(above)
        if above:
            parent[j] = above[0]
            for a in range(len(above)):
                for b in range(a + 1, len(above)):
                    adj[above[a]].add(above[b])
                    adj[above[b]].add(above[a])
    factor_nnz = sum(len(s) for s in struct)
    fill = factor_nnz - orig_nnz
    return struct, parent, fill


def etree_levels(parent: np.ndarray) -> list:
    """Partition elimination positions into dependency levels (children
    before parents): the static level schedule for batched supernodal
    factorization (SURVEY.md §2.2 S8 -> padded level schedule)."""
    n = parent.shape[0]
    depth = np.zeros(n, np.int64)
    # parents always have larger position; one forward pass suffices
    for j in range(n):
        p = parent[j]
        if p >= 0:
            depth[p] = max(depth[p], depth[j] + 1)
    levels = [[] for _ in range(int(depth.max()) + 1 if n else 0)]
    for j in range(n):
        levels[int(depth[j])].append(j)
    return levels
