"""Intrinsic camera calibration from planar-target observations.

The capability of camodocal's calibration tooling (reference
src/utils/camodocal/: Chessboard.cc, CameraCalibration.cc,
CostFunctionFactory.cc — ~4 kLoC of C++/ceres), re-designed as a compact
JAX program: Zhang's method for the closed-form initialization
(homographies -> image of the absolute conic -> K, then per-view
extrinsics), followed by a batched Gauss-Newton refinement of
[fx, fy, cx, cy, k1, k2, p1, p2] + per-view (so(3), t) minimizing pixel
reprojection error over ALL views at once (vmap over views, one jacobian,
one normal-equation solve per iteration — the ceres loop becomes a
fixed-iteration fori_loop).

Target detection (the Chessboard.cc corner detector) is out of scope here:
inputs are point correspondences (board planar coords, observed pixels),
the same interface camodocal's optimizer consumes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.geometry import cameras, se3
from cerebro_tpu.geometry.cameras import CameraParams, make_pinhole


# ---------------------------------------------------------------------------
# Homographies (normalized DLT)
# ---------------------------------------------------------------------------


def estimate_homography(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(N,2)->(N,2) homography via normalized DLT. Returns (3,3) H with
    dst ~ H src."""

    def normalize(p):
        c = jnp.mean(p, axis=0)
        s = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(jnp.linalg.norm(p - c, axis=-1)), 1e-9)
        T = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        ) * jnp.array([s, s, 1.0])[:, None]
        T = T.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
        return (p - c) * s, T

    sn, Ts = normalize(src)
    dn, Td = normalize(dst)
    n = src.shape[0]
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    Hn = vecs[:, 0].reshape(3, 3)
    H = jnp.linalg.solve(Td, Hn @ Ts)
    return H / H[2, 2]


# ---------------------------------------------------------------------------
# Zhang closed-form intrinsics
# ---------------------------------------------------------------------------


def _v_ij(H, i, j):
    return jnp.stack(
        [
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ]
    )


def intrinsics_from_homographies(Hs: jax.Array) -> jax.Array:
    """(V,3,3) homographies -> (3,3) K (Zhang's B-matrix construction)."""
    rows = []
    for k in range(Hs.shape[0]):
        H = Hs[k]
        rows.append(_v_ij(H, 0, 1))
        rows.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    V = jnp.stack(rows)
    _, vecs = jnp.linalg.eigh(V.T @ V)
    b11, b12, b22, b13, b23, b33 = vecs[:, 0]

    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = jnp.sqrt(jnp.abs(lam / b11))
    fy = jnp.sqrt(jnp.abs(lam * b11 / (b11 * b22 - b12 * b12)))
    skew = -b12 * fx * fx * fy / lam
    cx = skew * cy / fx - b13 * fx * fx / lam
    return jnp.array([[fx, skew, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


def extrinsics_from_homography(K: jax.Array, H: jax.Array) -> jax.Array:
    """Per-view pose (4,4) c_T_board from K and the view homography."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * Kinv @ h1
    r2 = lam * Kinv @ h2
    r3 = jnp.cross(r1, r2)
    t = lam * Kinv @ h3
    R = jnp.stack([r1, r2, r3], axis=1)
    # project onto SO(3)
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    # board must be in front of the camera
    flip = jnp.sign(t[2])
    return se3.make_pose(R, t * flip)


# ---------------------------------------------------------------------------
# Joint nonlinear refinement
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CalibrationResult:
    camera: CameraParams
    view_poses: jax.Array  # (V,4,4) c_T_board per view
    rms_px: jax.Array  # () final reprojection RMS in pixels
    success: bool = True  # False on degenerate view sets (NaN/absurd focals)


def _project_all(theta: jax.Array, view_params: jax.Array, board: jax.Array):
    """theta = [fx, fy, cx, cy, k1, k2, p1, p2]; view_params (V,6) twists;
    board (N,2) planar points. Returns (V,N,2) pixel projections."""
    fx, fy, cx, cy, k1, k2, p1, p2 = theta
    board3 = jnp.concatenate([board, jnp.zeros((board.shape[0], 1))], axis=-1)

    def one(view):
        T = se3.se3_exp(view)
        P = board3 @ T[:3, :3].T + T[:3, 3]
        xy = P[:, :2] / P[:, 2:3]
        x, y = xy[:, 0], xy[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        u = fx * (x * radial + dx) + cx
        v = fy * (y * radial + dy) + cy
        return jnp.stack([u, v], axis=-1)

    return jax.vmap(one)(view_params)


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_calibration(
    K0: jax.Array,
    view_poses0: jax.Array,  # (V,4,4)
    board: jax.Array,  # (N,2)
    obs: jax.Array,  # (V,N,2) observed pixels
    iters: int = 20,
    damping: float = 1e-4,
):
    V = view_poses0.shape[0]
    theta0 = jnp.array([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], 0.0, 0.0, 0.0, 0.0])
    views0 = jax.vmap(se3.se3_log)(view_poses0)  # (V,6)

    def residual(flat):
        theta = flat[:8]
        views = flat[8:].reshape(V, 6)
        pred = _project_all(theta, views, board)
        return (pred - obs).reshape(-1)

    flat0 = jnp.concatenate([theta0, views0.reshape(-1)])

    def body(_, flat):
        r = residual(flat)
        J = jax.jacfwd(residual)(flat)
        H = J.T @ J + damping * jnp.eye(flat.shape[0])
        g = J.T @ r
        return flat - jnp.linalg.solve(H, g)

    flat = jax.lax.fori_loop(0, iters, body, flat0)
    r = residual(flat)
    rms = jnp.sqrt(jnp.mean(jnp.sum(r.reshape(-1, 2) ** 2, axis=-1)))
    theta = flat[:8]
    views = jax.vmap(se3.se3_exp)(flat[8:].reshape(V, 6))
    return theta, views, rms


# ---------------------------------------------------------------------------
# Multi-model refinement (VERDICT r3 #4): Mei / Kannala-Brandt / Scaramuzza
# ---------------------------------------------------------------------------
#
# camodocal calibrates intrinsics for its whole camera family, not just
# pinhole (ref src/utils/camodocal/src/camera_models/CostFunctionFactory.cc
# ~1208 LoC of per-model ceres functors; EquidistantCamera.cc:820,
# ScaramuzzaCamera.cc:833). Here one Levenberg-Marquardt loop serves every
# model: the parameter vector theta = [fx, fy, cx, cy, d0..d3, xi] maps
# directly onto geometry.cameras.CameraParams, so the residual reuses the
# exact same project() the rest of the framework runs — calibration and
# runtime geometry cannot drift apart.


def _theta_camera(model: str, theta: jax.Array) -> CameraParams:
    return CameraParams(
        fx=theta[0], fy=theta[1], cx=theta[2], cy=theta[3],
        dist=theta[4:8], xi=theta[8], model=model,
    )


def _project_views(model: str, theta: jax.Array, view_params: jax.Array,
                   board: jax.Array) -> jax.Array:
    cam = _theta_camera(model, theta)
    board3 = jnp.concatenate([board, jnp.zeros((board.shape[0], 1))], axis=-1)

    def one(view):
        T = se3.se3_exp(view)
        return cameras.project(cam, board3 @ T[:3, :3].T + T[:3, 3])

    return jax.vmap(one)(view_params)


@functools.partial(jax.jit, static_argnames=("model", "iters"))
def refine_calibration_model(
    model: str,
    theta0: jax.Array,  # (9,) [fx, fy, cx, cy, d0..d3, xi]
    view_poses0: jax.Array,  # (V,4,4)
    board: jax.Array,  # (N,2)
    obs: jax.Array,  # (V,N,2)
    iters: int = 40,
):
    """Joint LM over intrinsics + per-view poses for ANY camera model.
    Levenberg damping (accept/reject with adaptive lambda) because fisheye
    starts far from the pinhole bootstrap; parameters a model ignores
    (e.g. KB's xi slot) have zero Jacobian columns and are pinned by the
    damping term."""
    V = view_poses0.shape[0]
    views0 = jax.vmap(se3.se3_log)(view_poses0)

    def residual(flat):
        pred = _project_views(model, flat[:9], flat[9:].reshape(V, 6), board)
        return (pred - obs).reshape(-1)

    flat0 = jnp.concatenate([theta0, views0.reshape(-1)])

    def body(_, carry):
        flat, lam = carry
        r = residual(flat)
        cost = jnp.sum(r * r)
        J = jax.jacfwd(residual)(flat)
        H = J.T @ J
        g = J.T @ r
        step = jnp.linalg.solve(H + lam * jnp.diag(jnp.diag(H) + 1e-6), g)
        cand = flat - step
        rc = residual(cand)
        better = jnp.sum(rc * rc) < cost
        flat = jnp.where(better, cand, flat)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-9), lam * 4.0)
        return flat, lam

    flat, _ = jax.lax.fori_loop(0, iters, body, (flat0, jnp.float32(1e-3)))
    r = residual(flat)
    rms = jnp.sqrt(jnp.mean(jnp.sum(r.reshape(-1, 2) ** 2, axis=-1)))
    views = jax.vmap(se3.se3_exp)(flat[9:].reshape(V, 6))
    return flat[:9], views, rms


def _theta_init(model: str, cam: CameraParams) -> jax.Array:
    """Seed theta for the target model from a refined pinhole bootstrap.
    Near the optical axis every model reduces to a pinhole: Mei's
    effective focal is gamma/(1+xi) (seed xi=1 -> gamma=2f); KB's r(theta)
    ~ theta matches the pinhole exactly; Scaramuzza's a0 IS the paraxial
    focal (affine c=1, d=0)."""
    f = (cam.fx, cam.fy, cam.cx, cam.cy)
    z4 = (0.0, 0.0, 0.0, 0.0)
    if model == cameras.MEI:
        return jnp.asarray(
            [2 * f[0], 2 * f[1], f[2], f[3], *z4, 1.0], jnp.float32
        )
    if model == cameras.SCARAMUZZA:
        return jnp.asarray(
            [1.0, 1.0, f[2], f[3], f[0], 0.0, 0.0, 0.0, 0.0], jnp.float32
        )
    # KANNALA_BRANDT (and PINHOLE, for completeness)
    return jnp.asarray([*f, *z4, 0.0], jnp.float32)


def calibrate_planar(
    board: jax.Array,  # (N,2) planar target points (board frame)
    obs: jax.Array,  # (V,N,2) observed pixels per view
    image_size: Tuple[int, int] = (752, 480),
    iters: int = 20,
    model: str = cameras.PINHOLE,
) -> CalibrationResult:
    """Full pipeline: homographies -> Zhang init -> joint GN refinement.
    For non-pinhole models the pinhole solution bootstraps poses + focal
    scale, then the model-specific LM refinement takes over (camodocal's
    per-model calibration capability, CostFunctionFactory.cc)."""
    Hs = jax.vmap(lambda o: estimate_homography(board, o))(obs)
    K0 = intrinsics_from_homographies(Hs)
    poses0 = jax.vmap(lambda H: extrinsics_from_homography(K0, H))(Hs)
    theta, views, rms = refine_calibration(K0, poses0, board, obs, iters=iters)
    cam = make_pinhole(
        theta[0], theta[1], theta[2], theta[3],
        (theta[4], theta[5], theta[6], theta[7]),
        width=image_size[0], height=image_size[1],
    )

    if model != cameras.PINHOLE:
        theta9, views, rms = refine_calibration_model(
            model, _theta_init(model, cam), views, board, obs,
            iters=max(iters, 40),
        )
        cam = dataclasses.replace(
            _theta_camera(model, theta9),
            width=image_size[0], height=image_size[1],
        )
        theta = theta9

    # Degeneracy guard: Zhang needs >=3 views with DISTINCT orientations;
    # identical/coplanar-rotation view sets produce NaNs or absurd focals.
    import numpy as _np

    focals = (
        (float(theta[4]),)
        if model == cameras.SCARAMUZZA
        else (float(theta[0]), float(theta[1]))
    )
    ok = bool(
        _np.isfinite(float(rms))
        and _np.isfinite(_np.asarray(theta)).all()
        and all(1.0 < f < 1e5 for f in focals)
    )
    return CalibrationResult(camera=cam, view_poses=views, rms_px=rms, success=ok)
