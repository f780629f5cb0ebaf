"""Zhang-style planar calibration on synthetic boards with known intrinsics
(the camodocal CameraCalibration capability, SURVEY.md §2.2)."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import calibration, cameras, se3

FX, FY, CX, CY = 460.0, 455.0, 370.0, 245.0
K1, K2 = -0.25, 0.06


def make_board(rows=6, cols=8, square=0.08):
    ys, xs = np.mgrid[0:rows, 0:cols].astype(np.float32)
    return np.stack([xs.ravel() * square, ys.ravel() * square], -1)


def render_views(rng, board, n_views=8, noise_px=0.15):
    cam = cameras.make_pinhole(FX, FY, CX, CY, (K1, K2, 0.0, 0.0))
    board3 = np.concatenate([board, np.zeros((len(board), 1), np.float32)], -1)
    obs, poses = [], []
    for _ in range(n_views):
        ypr = np.deg2rad(rng.uniform(-25, 25, 3)).astype(np.float32)
        R = np.asarray(se3.ypr_to_rot(jnp.asarray(ypr)))
        t = np.array(
            [rng.uniform(-0.15, 0.15) - 0.3, rng.uniform(-0.1, 0.1) - 0.2, rng.uniform(0.6, 1.2)],
            np.float32,
        )
        P = board3 @ R.T + t
        uv = np.array(cameras.project(cam, jnp.asarray(P)))
        uv += rng.normal(0, noise_px, uv.shape)
        obs.append(uv.astype(np.float32))
        poses.append(np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t))))
    return np.stack(obs), np.stack(poses)


def test_homography_exact(rng):
    H_gt = np.array([[1.2, 0.1, 30.0], [-0.05, 0.9, 10.0], [1e-4, -2e-4, 1.0]], np.float32)
    src = rng.uniform(0, 100, (40, 2)).astype(np.float32)
    sh = np.concatenate([src, np.ones((40, 1), np.float32)], -1) @ H_gt.T
    dst = sh[:, :2] / sh[:, 2:3]
    H = np.asarray(calibration.estimate_homography(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(H, H_gt, atol=2e-3)


def test_full_calibration_recovers_intrinsics(rng):
    board = make_board()
    obs, _ = render_views(rng, board, n_views=10)
    res = calibration.calibrate_planar(jnp.asarray(board), jnp.asarray(obs))
    cam = res.camera
    assert float(res.rms_px) < 0.5, f"RMS {float(res.rms_px)} px"
    assert abs(float(cam.fx) - FX) < 2.0
    assert abs(float(cam.fy) - FY) < 2.0
    assert abs(float(cam.cx) - CX) < 2.0
    assert abs(float(cam.cy) - CY) < 2.0
    assert abs(float(cam.dist[0]) - K1) < 0.02
    assert abs(float(cam.dist[1]) - K2) < 0.05


def test_calibration_noise_free_is_tight(rng):
    board = make_board()
    obs, _ = render_views(rng, board, n_views=8, noise_px=0.0)
    res = calibration.calibrate_planar(jnp.asarray(board), jnp.asarray(obs))
    assert float(res.rms_px) < 0.02
    assert abs(float(res.camera.fx) - FX) < 0.2
    assert abs(float(res.camera.dist[0]) - K1) < 2e-3


def test_degenerate_views_flagged(rng):
    """Identical views are a degenerate Zhang configuration — must be
    reported, not silently returned as NaN."""
    board = make_board()
    obs, _ = render_views(rng, board, n_views=6)
    obs_same = np.repeat(obs[:1], 6, axis=0)
    res = calibration.calibrate_planar(jnp.asarray(board), jnp.asarray(obs_same))
    assert not res.success
    good = calibration.calibrate_planar(jnp.asarray(board), jnp.asarray(obs))
    assert good.success
