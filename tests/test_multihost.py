"""TRUE multi-process execution of the sharded solvers (N=2 "hosts" x 4
virtual CPU devices, gloo collectives) — the §5.8a multi-host requirement
tested without a pod: same code path as `jax.distributed` TPU bring-up,
different transport. Both processes must agree with the single-process
solve on the same problem."""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import pytest

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import synthetic
from gpslam_tpu.models import linear2d
from gpslam_tpu.ops import chain
from gpslam_tpu.solve import lm_solve

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out):
    res = {}
    for line in out.splitlines():
        if line.startswith("RESULT "):
            _, name, val = line.split()
            res[name] = float(val)
    return res


def test_two_process_sharded_solves_match_single_process():
    data = synthetic.make_linear2d_range_slam(n_states=64, seed=0)
    graph, values = linear2d.build(data, dtype=jnp.float32)
    _, st = lm_solve(graph, values, LMConfig(max_iterations=8),
                     solver=chain.make_chain_solver(graph))
    ref = float(st.error)

    from gpslam_tpu.models import pose2_slam

    data_lc = synthetic.make_se2_pose_graph(n_states=30, seed=4)
    graph_lc, values_lc = pose2_slam.build(data_lc, dtype=jnp.float32)
    _, st_lc = lm_solve(graph_lc, values_lc, LMConfig(max_iterations=8))
    ref_sn = float(st_lc.error)

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    for out in outs:
        res = _parse(out)
        assert set(res) == {"factor", "time", "supernode"}, out[-2000:]
        for name in ("factor", "time"):
            assert res[name] == pytest.approx(ref, rel=2e-3), (
                name, res[name], ref, out[-1500:])
        assert res["supernode"] == pytest.approx(ref_sn, rel=2e-3), (
            res["supernode"], ref_sn, out[-1500:])
