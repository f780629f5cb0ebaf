import numpy as np

from cerebro_tpu.eval import ate_rmse


def test_ate_identity():
    xyz = np.random.default_rng(0).normal(size=(50, 3))
    assert ate_rmse(xyz, xyz) < 1e-5


def test_ate_alignment_removes_rigid_offset():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3)).astype(np.float32)
    ang = 0.5
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    est = gt @ R.T + np.array([5.0, -3.0, 1.0], np.float32)
    assert ate_rmse(est, gt, align=False) > 3.0
    assert ate_rmse(est, gt, align=True) < 1e-3


def test_ate_detects_real_error():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    est = gt + rng.normal(0, 0.3, size=(50, 3))
    e = ate_rmse(est, gt, align=True)
    assert 0.2 < e < 0.8
