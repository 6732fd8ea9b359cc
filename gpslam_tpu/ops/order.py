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
