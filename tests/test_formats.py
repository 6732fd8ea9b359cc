"""Dataset loader tests: g2o/TORO/Plaza parsing + end-to-end solve from a
loaded file (reference L8 path, SURVEY.md G12)."""

import numpy as np
import jax.numpy as jnp

from gpslam_tpu.config import LMConfig
from gpslam_tpu.io import formats, synthetic
from gpslam_tpu.models import pose2_slam
from gpslam_tpu.solve import lm_solve

G2O_2D = """\
VERTEX_SE2 0 0.0 0.0 0.0
VERTEX_SE2 1 1.1 0.1 0.05
VERTEX_SE2 2 2.0 0.3 0.1
VERTEX_SE2 3 2.9 0.8 1.57
EDGE_SE2 0 1 1.0 0.0 0.0 100.0 0.0 0.0 100.0 0.0 400.0
EDGE_SE2 1 2 1.0 0.0 0.05 100.0 0.0 0.0 100.0 0.0 400.0
EDGE_SE2 2 3 1.0 0.2 1.5 100.0 0.0 0.0 100.0 0.0 400.0
EDGE_SE2 0 3 2.9 0.8 1.57 50.0 0.0 0.0 50.0 0.0 200.0
"""


def test_load_g2o_se2(tmp_path):
    p = tmp_path / "g.g2o"
    p.write_text(G2O_2D)
    d = formats.load_g2o_se2(str(p))
    assert d["init_pose"].shape == (4, 3)
    assert d["edges_i"].shape == (4,)
    # sqrt_info^T sqrt_info == info
    A = d["edges_sqrt_info"][0]
    np.testing.assert_allclose(A.T @ A, np.diag([100.0, 100.0, 400.0]),
                               atol=1e-9)


def test_g2o_end_to_end_solve(tmp_path):
    p = tmp_path / "g.g2o"
    p.write_text(G2O_2D)
    loaded = formats.load_g2o_se2(str(p))
    data = pose2_slam.data_from_g2o(loaded)
    graph, values = pose2_slam.build(data, dtype=jnp.float64)
    vals, stats = lm_solve(graph, values, LMConfig())
    assert float(stats.error) <= float(stats.error0)
    assert np.isfinite(float(stats.error))


def test_load_toro_roundtrip(tmp_path):
    txt = """\
VERTEX2 0 0.0 0.0 0.0
VERTEX2 1 1.0 0.0 0.1
EDGE2 0 1 1.0 0.0 0.1 100.0 0.0 100.0 400.0 0.0 0.0
"""
    p = tmp_path / "t.graph"
    p.write_text(txt)
    d = formats.load_toro_se2(str(p))
    assert d["init_pose"].shape == (2, 3)
    A = d["edges_sqrt_info"][0]
    np.testing.assert_allclose(A.T @ A, np.diag([100.0, 100.0, 400.0]),
                               atol=1e-9)


def test_load_g2o_se3(tmp_path):
    txt = """\
VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1
VERTEX_SE3:QUAT 1 1 0 0 0 0 0.0998334 0.9950042
EDGE_SE3:QUAT 0 1 1 0 0 0 0 0.0998334 0.9950042 \
100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 400 0 0 400 0 400
"""
    p = tmp_path / "g3.g2o"
    p.write_text(txt)
    d = formats.load_g2o_se3(str(p))
    assert d["init_R"].shape == (2, 3, 3)
    np.testing.assert_allclose(
        d["init_R"][0] @ d["init_R"][0].T, np.eye(3), atol=1e-9
    )
    A = d["edges_sqrt_info"][0]
    info = A.T @ A
    # rotation-first permutation: rot block (400s) leads
    np.testing.assert_allclose(np.diag(info)[:3], [400.0] * 3, atol=1e-9)
    np.testing.assert_allclose(np.diag(info)[3:], [100.0] * 3, atol=1e-9)


def test_load_plaza(tmp_path):
    txt = """\
GT 0.0 0.0 0.0 0.0
GT 1.0 1.0 0.0 0.0
DR 1.0 1.0 0.0 0.0
TL 0 5.0 5.0
TD 0.5 0 7.07
"""
    p = tmp_path / "plaza.txt"
    p.write_text(txt)
    d = formats.load_plaza(str(p))
    assert d["gt"].shape == (2, 4)
    assert d["landmarks"].shape == (1, 3)
    assert d["ranges"].shape == (1, 3)


SE3_TXT = """\
VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1
VERTEX_SE3:QUAT 1 1 0 0 0 0 0.0998334 0.9950042
EDGE_SE3:QUAT 0 1 1 0 0 0 0 0.0998334 0.9950042 \
100 2 0 0 0 0 100 0 0 0 0 100 0 0 0 400 3 0 400 0 400
"""

PLAZA_TXT = """\
GT 0.0 0.0 0.0 0.0
GT 1.0 1.0 0.0 0.0
DR 1.0 1.0 0.0 0.0
TL 0 5.0 5.0
TD 0.5 0 7.07
"""


def test_native_loader_available_and_matches_python(tmp_path, monkeypatch):
    """native/fastload.cpp path must be live on this machine AND bit-agree
    with the pure-Python fallback on every format."""
    assert formats._native_records(__file__, ("nope",)) is not None, \
        "native fastload library failed to compile/load"

    files = {
        "g2.g2o": (G2O_2D, formats.load_g2o_se2),
        "t.graph": (
            "VERTEX2 0 0.0 0.0 0.0\nVERTEX2 1 1.0 0.0 0.1\n"
            "EDGE2 0 1 1.0 0.0 0.1 100.0 1.0 100.0 400.0 2.0 3.0\n",
            formats.load_toro_se2,
        ),
        "g3.g2o": (SE3_TXT, formats.load_g2o_se3),
        "plaza.txt": (PLAZA_TXT, formats.load_plaza),
    }
    for name, (txt, loader) in files.items():
        p = tmp_path / name
        p.write_text(txt)
        d_native = loader(str(p))
        monkeypatch.setattr(formats, "_native_records",
                            lambda *a, **k: None)
        d_py = loader(str(p))
        monkeypatch.undo()
        assert set(d_native) == set(d_py), name
        for k in d_py:
            np.testing.assert_allclose(
                np.asarray(d_native[k], float), np.asarray(d_py[k], float),
                atol=1e-12, err_msg=f"{name}:{k}",
            )
