"""Chessboard corner detection + end-to-end calibration-from-images.

Covers the capability of camodocal's Chessboard.cc front-end: synthetic
boards are rendered under known homographies / camera poses (with radtan
distortion), the detector must recover the ordered subpixel grid, and the
full image -> corners -> Zhang -> GN pipeline must recover the intrinsics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cerebro_tpu.geometry import se3
from cerebro_tpu.geometry.calibration import calibrate_planar
from cerebro_tpu.geometry.cameras import lift, make_pinhole, project
from cerebro_tpu.geometry.chessboard import (
    board_points,
    detect_chessboard,
    find_corner_candidates,
)

ROWS, COLS = 5, 7  # inner corners


def _checker(xb: np.ndarray, yb: np.ndarray, square: float, soft: float):
    """Antialiased checker color at board coords; squares span
    [0, (COLS+1)*sq] x [0, (ROWS+1)*sq]; inner corner (i,j) at
    ((j+1)sq, (i+1)sq)."""

    def softsq(t):
        # smooth square wave of period 2, transitions EXACTLY at integers
        # (symmetric: zero-crossings of sin), edge width ~ soft/pi
        return 0.5 * (1.0 + np.tanh(np.sin(np.pi * t) / soft))

    cx = softsq(xb / square)
    cy = softsq(yb / square)
    col = cx * cy + (1 - cx) * (1 - cy)  # XOR-ish, antialiased
    inside = (
        (xb > 0) & (xb < (COLS + 1) * square) & (yb > 0) & (yb < (ROWS + 1) * square)
    )
    return np.where(inside, col, 0.5)


def _render_homography(Hm: np.ndarray, hw=(240, 320), square=1.0):
    """Render the board through pixel = H [xb, yb, 1]."""
    H, W = hw
    Hi = np.linalg.inv(Hm)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    p = np.stack([u, v, np.ones_like(u)], axis=-1) @ Hi.T
    xb = p[..., 0] / p[..., 2]
    yb = p[..., 1] / p[..., 2]
    # antialias width ~ 1 px mapped into board units via local scale
    scale = np.abs(Hm[0, 0]) + np.abs(Hm[1, 1])
    img = _checker(xb, yb, square, soft=2.0 / max(scale, 1e-6))
    return img.astype(np.float32)


def _inner_corners_h(Hm: np.ndarray, square=1.0) -> np.ndarray:
    g = board_points((ROWS, COLS), square) + square  # inner corner positions
    p = np.concatenate([g, np.ones((len(g), 1))], axis=1) @ Hm.T
    return (p[:, :2] / p[:, 2:3]).astype(np.float64)


def _match_sets(a: np.ndarray, b: np.ndarray) -> float:
    """Mean nearest-neighbor distance from a to b (both (N,2))."""
    d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    return float(d.min(axis=1).mean())


def test_corner_candidates_on_axis_aligned_board():
    sq = 28.0
    Hm = np.array([[sq, 0, 30.0], [0, sq, 25.0], [0, 0, 1.0]])
    img = _render_homography(Hm, hw=(240, 320), square=1.0)
    gt = _inner_corners_h(Hm)
    uv, score = find_corner_candidates(jnp.asarray(img), ROWS * COLS + 8)
    uv = np.asarray(uv)[np.asarray(score) > 0]
    err = _match_sets(gt, uv)
    assert err < 0.35, err


def test_detect_ordered_grid_under_perspective():
    rng = np.random.default_rng(3)
    for trial in range(3):
        sq = 26.0
        # mild perspective + rotation
        th = rng.uniform(-0.3, 0.3)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A = R * sq
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = [60.0 + 10 * trial, 50.0]
        Hm[2, :2] = rng.uniform(-6e-4, 6e-4, size=2)
        img = _render_homography(Hm, hw=(240, 320), square=1.0)
        noisy = img + rng.normal(0, 0.01, img.shape).astype(np.float32)
        corners, found = detect_chessboard(noisy, (ROWS, COLS))
        assert found, f"trial {trial}: board not found"
        gt = _inner_corners_h(Hm)
        # ordering may start from any of 4 orientations; compare as sets
        err = _match_sets(gt, corners.astype(np.float64))
        assert err < 0.4, (trial, err)
        # and the assignment must be a consistent grid: every corner used once
        assert len(np.unique(corners, axis=0)) == ROWS * COLS


def _render_camera_view(cam, w_T_board: np.ndarray, hw=(240, 320), square=0.04):
    """Render the board through the (distorted) camera: per-pixel lift ->
    ray -> plane intersection in board frame."""
    H, W = hw
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    uv = np.stack([u, v], axis=-1).reshape(-1, 2)
    rays = np.asarray(lift(cam, jnp.asarray(uv)))  # (N, 3) unit rays, cam frame
    Rcb = w_T_board[:3, :3]  # board -> cam
    tcb = w_T_board[:3, 3]
    # X_cam = R X_b + t; ray: X_cam = s d  =>  X_b = R^T (s d - t), (X_b)_z = 0
    Rt = Rcb.T
    denom = rays @ Rt[2]
    denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    s = (Rt[2] @ tcb) / denom
    Xb = (s[:, None] * rays - tcb) @ Rt.T
    behind = s <= 0
    img = _checker(Xb[:, 0], Xb[:, 1], square, soft=0.06)
    img = np.where(behind, 0.5, img)
    return img.reshape(H, W).astype(np.float32)


def test_calibration_from_rendered_images():
    gt = make_pinhole(300.0, 310.0, 160.0, 120.0, (-0.12, 0.05, 0.0, 0.0),
                      width=320, height=240)
    rng = np.random.default_rng(0)
    sq = 0.04
    board_w = (COLS + 1) * sq
    board_h = (ROWS + 1) * sq

    views = []
    imgs = []
    poses = [
        (0.0, 0.0, 0.00),
        (0.35, 0.1, 0.2),
        (-0.3, 0.25, -0.15),
        (0.1, -0.35, 0.3),
        (-0.2, -0.2, -0.3),
    ]
    for rx, ry, rz in poses:
        Rcb = np.asarray(se3.so3_exp(jnp.asarray([rx, ry, rz], jnp.float32)))
        # place board center in front of the camera
        center = np.array([board_w / 2, board_h / 2, 0.0], np.float32)
        tcb = -Rcb @ center + np.array([0.0, 0.0, 0.55], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcb
        T[:3, 3] = tcb
        img = _render_camera_view(gt, T, hw=(240, 320), square=sq)
        imgs.append(img)
        views.append(T)

    board = board_points((ROWS, COLS), square=sq)
    obs = []
    for i, img in enumerate(imgs):
        corners, found = detect_chessboard(img, (ROWS, COLS))
        assert found, f"view {i}: board not found"
        obs.append(corners)
    obs = np.stack(obs)  # (V, N, 2)

    result = calibrate_planar(
        jnp.asarray(board), jnp.asarray(obs), image_size=(320, 240), iters=30
    )
    assert result.success
    assert float(result.rms_px) < 0.5, float(result.rms_px)
    fx, fy = float(result.camera.fx), float(result.camera.fy)
    assert abs(fx - 300.0) / 300.0 < 0.02, fx
    assert abs(fy - 310.0) / 310.0 < 0.02, fy
    cx, cy = float(result.camera.cx), float(result.camera.cy)
    assert abs(cx - 160.0) < 4.0 and abs(cy - 120.0) < 4.0, (cx, cy)
