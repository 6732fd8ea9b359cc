"""Dataset file-format loaders (reference: gpslam MATLAB loaders + GTSAM
dataset.cpp readers, SURVEY.md §2.1 G12 / L8).

Supported:
  g2o   VERTEX_SE2 / EDGE_SE2 and VERTEX_SE3:QUAT / EDGE_SE3:QUAT
  TORO  VERTEX2 / EDGE2
  Plaza text export (Djugash "Autonomous Lawnmower" range-only SLAM):
        whitespace-separated sections with line tags GT/DR/TL/TD
        (groundtruth, dead-reckoned odometry, true landmarks, range data)

Loaders return plain numpy dicts compatible with the models/ builders; they
never touch jax (host-side IO only).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

_FL_NCOLS = 32  # max numeric fields per record (EDGE_SE3:QUAT has 30)


def _native_records(path: str, tags: Tuple[str, ...]
                    ) -> Optional[Dict[str, np.ndarray]]:
    """Tokenize via native/fastload.cpp (the C++ dataset reader, compiled on
    use like the ordering/symbolic libraries): returns tag -> (rows, 32)
    float64 table, or None when the native library is unavailable (callers
    fall back to pure-Python line parsing)."""
    from ..ops.order import _load_native

    lib = _load_native("fastload")
    if lib is None:
        return None
    ntags = len(tags)
    tag_bytes = "\n".join(tags).encode()
    path_b = path.encode()
    counts = np.zeros(ntags, np.int64)
    if lib.fl_count(path_b, tag_bytes, ntags,
                    counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))):
        return None
    bufs = [np.zeros((int(c), _FL_NCOLS)) for c in counts]
    PD = ctypes.POINTER(ctypes.c_double)
    ptrs = (PD * ntags)(*[b.ctypes.data_as(PD) for b in bufs])
    rows = np.zeros(ntags, np.int64)
    if lib.fl_fill(path_b, tag_bytes, ntags, _FL_NCOLS, ptrs,
                   rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))):
        return None
    if (rows != counts).any():
        return None
    return dict(zip(tags, bufs))


def _chol_upper(info: np.ndarray) -> np.ndarray:
    """A with A^T A = info (our whitening convention): chol(info).T.
    Batched over leading dims."""
    return np.swapaxes(np.linalg.cholesky(info), -1, -2)


def _se2_tables(V: np.ndarray, E: np.ndarray, info_cols) -> Dict[str, np.ndarray]:
    """Shared vectorized assembly for 2D pose-graph formats: V = (n, 32)
    vertex table (id, x, y, theta), E = (m, 32) edge table (i, j, z0..z2,
    u0..u5); info_cols maps the 6 upper-triangle entries u -> (3,3) index
    pairs, format-specific."""
    ids = V[:, 0].astype(np.int64)
    n = int(ids.max()) + 1 if len(ids) else 0
    init = np.zeros((n, 3))
    init[ids] = V[:, 1:4]
    m = E.shape[0]
    info = np.zeros((m, 3, 3))
    for c, (a, b) in enumerate(info_cols):
        info[:, a, b] = info[:, b, a] = E[:, 5 + c]
    return {
        "init_pose": init,
        "edges_i": E[:, 0].astype(np.int64),
        "edges_j": E[:, 1].astype(np.int64),
        "edges_z": E[:, 2:5].copy(),
        "edges_sqrt_info": _chol_upper(info),
    }


# g2o EDGE_SE2 info order: upper triangle row-major (xx xy xt yy yt tt)
_G2O_SE2_INFO = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
# TORO EDGE2 info order: (xx, xy, yy, tt, xt, yt)
_TORO_INFO = [(0, 0), (0, 1), (1, 1), (2, 2), (0, 2), (1, 2)]


def load_g2o_se2(path: str) -> Dict[str, np.ndarray]:
    """Parse a 2D g2o pose graph. Returns
    {init_pose (N,3), edges_i, edges_j, edges_z (M,3), edges_sqrt_info
    (M,3,3)} with consecutive-index edges usable as odometry."""
    rec = _native_records(path, ("VERTEX_SE2", "EDGE_SE2"))
    if rec is not None:
        return _se2_tables(rec["VERTEX_SE2"], rec["EDGE_SE2"], _G2O_SE2_INFO)
    poses: Dict[int, List[float]] = {}
    ei, ej, ez, einfo = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE2":
                poses[int(tok[1])] = [float(x) for x in tok[2:5]]
            elif tok[0] == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                z = [float(x) for x in tok[3:6]]
                u = [float(x) for x in tok[6:12]]
                info = np.array(
                    [
                        [u[0], u[1], u[2]],
                        [u[1], u[3], u[4]],
                        [u[2], u[4], u[5]],
                    ]
                )
                ei.append(i)
                ej.append(j)
                ez.append(z)
                einfo.append(_chol_upper(info))
    n = max(poses) + 1
    init = np.zeros((n, 3))
    for k, p in poses.items():
        init[k] = p
    return {
        "init_pose": init,
        "edges_i": np.asarray(ei, np.int64),
        "edges_j": np.asarray(ej, np.int64),
        "edges_z": np.asarray(ez),
        "edges_sqrt_info": np.asarray(einfo),
    }


def load_toro_se2(path: str) -> Dict[str, np.ndarray]:
    """Parse a TORO 2D graph (VERTEX2 / EDGE2). EDGE2 information order is
    (xx, xy, yy, tt, xt, yt) per the TORO spec."""
    rec = _native_records(path, ("VERTEX2", "EDGE2"))
    if rec is not None:
        return _se2_tables(rec["VERTEX2"], rec["EDGE2"], _TORO_INFO)
    poses: Dict[int, List[float]] = {}
    ei, ej, ez, einfo = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX2":
                poses[int(tok[1])] = [float(x) for x in tok[2:5]]
            elif tok[0] == "EDGE2":
                i, j = int(tok[1]), int(tok[2])
                z = [float(x) for x in tok[3:6]]
                u = [float(x) for x in tok[6:12]]
                info = np.array(
                    [
                        [u[0], u[1], u[4]],
                        [u[1], u[2], u[5]],
                        [u[4], u[5], u[3]],
                    ]
                )
                ei.append(i)
                ej.append(j)
                ez.append(z)
                einfo.append(_chol_upper(info))
    n = max(poses) + 1
    init = np.zeros((n, 3))
    for k, p in poses.items():
        init[k] = p
    return {
        "init_pose": init,
        "edges_i": np.asarray(ei, np.int64),
        "edges_j": np.asarray(ej, np.int64),
        "edges_z": np.asarray(ez),
        "edges_sqrt_info": np.asarray(einfo),
    }


def _quat_to_rot_batch(qxyzw: np.ndarray) -> np.ndarray:
    """(..., 4) [qx, qy, qz, qw] -> (..., 3, 3) rotation matrices."""
    q = qxyzw / np.linalg.norm(qxyzw, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty((*q.shape[:-1], 3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _quat_to_rot(qx, qy, qz, qw):
    return _quat_to_rot_batch(np.array([qx, qy, qz, qw]))


_TRIU6 = [(a, b) for a in range(6) for b in range(a, 6)]  # row-major triu


def load_g2o_se3(path: str) -> Dict[str, np.ndarray]:
    """Parse a 3D g2o pose graph (VERTEX_SE3:QUAT / EDGE_SE3:QUAT).

    g2o EDGE_SE3:QUAT information is ordered (x, y, z, qx, qy, qz) i.e.
    translation first; our tangent is [omega, v] rotation-first, so the 6x6
    information is permuted accordingly.
    """
    perm = np.array([3, 4, 5, 0, 1, 2])  # (trans,rot) -> (rot,trans)
    rec = _native_records(path, ("VERTEX_SE3:QUAT", "EDGE_SE3:QUAT"))
    if rec is not None:
        V, E = rec["VERTEX_SE3:QUAT"], rec["EDGE_SE3:QUAT"]
        ids = V[:, 0].astype(np.int64)
        n = int(ids.max()) + 1 if len(ids) else 0
        R = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()
        t = np.zeros((n, 3))
        R[ids] = _quat_to_rot_batch(V[:, 4:8])
        t[ids] = V[:, 1:4]
        m = E.shape[0]
        info = np.zeros((m, 6, 6))
        for c, (a, b_) in enumerate(_TRIU6):
            info[:, a, b_] = info[:, b_, a] = E[:, 9 + c]
        info = info[:, perm][:, :, perm]
        return {
            "init_R": R,
            "init_t": t,
            "edges_i": E[:, 0].astype(np.int64),
            "edges_j": E[:, 1].astype(np.int64),
            "edges_R": _quat_to_rot_batch(E[:, 5:9]),
            "edges_t": E[:, 2:5].copy(),
            "edges_sqrt_info": _chol_upper(info),
        }
    R_by: Dict[int, np.ndarray] = {}
    t_by: Dict[int, np.ndarray] = {}
    ei, ej, eR, et, einfo = [], [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE3:QUAT":
                i = int(tok[1])
                x, y, z, qx, qy, qz, qw = (float(v) for v in tok[2:9])
                R_by[i] = _quat_to_rot(qx, qy, qz, qw)
                t_by[i] = np.array([x, y, z])
            elif tok[0] == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                x, y, z, qx, qy, qz, qw = (float(v) for v in tok[3:10])
                u = [float(v) for v in tok[10:31]]
                info = np.zeros((6, 6))
                k = 0
                for a in range(6):
                    for b_ in range(a, 6):
                        info[a, b_] = info[b_, a] = u[k]
                        k += 1
                info = info[np.ix_(perm, perm)]
                ei.append(i)
                ej.append(j)
                eR.append(_quat_to_rot(qx, qy, qz, qw))
                et.append(np.array([x, y, z]))
                einfo.append(_chol_upper(info))
    n = max(R_by) + 1
    R = np.stack([R_by[k] if k in R_by else np.eye(3) for k in range(n)])
    t = np.stack([t_by[k] if k in t_by else np.zeros(3) for k in range(n)])
    return {
        "init_R": R,
        "init_t": t,
        "edges_i": np.asarray(ei, np.int64),
        "edges_j": np.asarray(ej, np.int64),
        "edges_R": np.asarray(eR),
        "edges_t": np.asarray(et),
        "edges_sqrt_info": np.asarray(einfo),
    }


def load_plaza(path: str) -> Dict[str, np.ndarray]:
    """Parse a Plaza-style range-only SLAM text export.

    Line format (whitespace separated, one record per line):
      GT t x y theta        groundtruth pose at time t
      DR t dx dy dtheta     dead-reckoned odometry increment over (t-1, t]
      TL id x y             true landmark position
      TD t id range         range measurement to landmark id at time t

    Returns {gt (K,4), odom (M,4), landmarks (L,3), ranges (R,3)} raw
    tables; models/plaza.py turns them into a trajectory problem.
    """
    rec = _native_records(path, ("GT", "DR", "TL", "TD"))
    if rec is not None:
        return {
            "gt": rec["GT"][:, :4].copy(),
            "odom": rec["DR"][:, :4].copy(),
            "landmarks": rec["TL"][:, :3].copy(),
            "ranges": rec["TD"][:, :3].copy(),
        }
    gt, dr, tl, td = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            tag, vals = tok[0], [float(x) for x in tok[1:]]
            if tag == "GT":
                gt.append(vals)
            elif tag == "DR":
                dr.append(vals)
            elif tag == "TL":
                tl.append(vals)
            elif tag == "TD":
                td.append(vals)
    return {
        "gt": np.asarray(gt),
        "odom": np.asarray(dr),
        "landmarks": np.asarray(tl),
        "ranges": np.asarray(td),
    }
