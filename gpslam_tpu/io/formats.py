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

from typing import Dict, List

import numpy as np


def _chol_upper(info: np.ndarray) -> np.ndarray:
    """A with A^T A = info (our whitening convention): chol(info).T."""
    return np.linalg.cholesky(info).T


def load_g2o_se2(path: str) -> Dict[str, np.ndarray]:
    """Parse a 2D g2o pose graph. Returns
    {init_pose (N,3), edges_i, edges_j, edges_z (M,3), edges_sqrt_info
    (M,3,3)} with consecutive-index edges usable as odometry."""
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


def _quat_to_rot(qx, qy, qz, qw):
    q = np.array([qw, qx, qy, qz])
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def load_g2o_se3(path: str) -> Dict[str, np.ndarray]:
    """Parse a 3D g2o pose graph (VERTEX_SE3:QUAT / EDGE_SE3:QUAT).

    g2o EDGE_SE3:QUAT information is ordered (x, y, z, qx, qy, qz) i.e.
    translation first; our tangent is [omega, v] rotation-first, so the 6x6
    information is permuted accordingly.
    """
    R_by: Dict[int, np.ndarray] = {}
    t_by: Dict[int, np.ndarray] = {}
    ei, ej, eR, et, einfo = [], [], [], [], []
    perm = np.array([3, 4, 5, 0, 1, 2])  # (trans,rot) -> (rot,trans)
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
