"""SE(3) / SO(3) manipulation as pure, vmap-able JAX functions.

Replaces the reference's PoseManipUtils (src/utils/PoseManipUtils.{h,cpp}) —
SE(3) <-> quaternion / yaw-pitch-roll / 4x4 raw converters and helpers — but
as functional, differentiable primitives so the same code serves the RANSAC
solvers, the consistency checks, and the pose-graph optimizer (which needs
exp/log maps the reference delegated to ceres local parameterizations).

Conventions: poses are 4x4 row-major homogeneous matrices ``w_T_c`` (camera
-> world), quaternions are ``(w, x, y, z)``, Euler order is yaw-pitch-roll
(Z-Y-X intrinsic), matching the reference's
``PoseManipUtils::prettyprintMatrix4d`` ypr output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (w,x,y,z).

    Branch-free Shepperd-style selection (max-trace variant per component),
    safe under jit/vmap.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, degrees — matches reference's raw_to_eigenmat ypr use)
# ---------------------------------------------------------------------------


def ypr_to_rot(ypr: jax.Array) -> jax.Array:
    """(yaw, pitch, roll) in radians -> rotation matrix R = Rz(y)Ry(p)Rx(r)."""
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def rot_to_ypr(R: jax.Array) -> jax.Array:
    """Rotation matrix -> (yaw, pitch, roll) radians (ZYX)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) 4x4 poses
# ---------------------------------------------------------------------------


def make_pose(R: jax.Array, t: jax.Array) -> jax.Array:
    """(...,3,3) rotation + (...,3) translation -> (...,4,4) pose."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def pose_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (...,4,4) pose to (...,N,3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log — needed by the pose-graph GN (the reference leaves
# this to ceres' QuaternionLocalParameterization; we need it explicitly).
# ---------------------------------------------------------------------------


def hat(w: jax.Array) -> jax.Array:
    """(...,3) -> (...,3,3) cross-product (skew) matrix.

    Reference analog: PoseManipUtils vec_to_cross_matrix.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _sincos_coeffs(theta2: jax.Array):
    """Gradient-safe A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3
    computed from theta^2. Both branches of each `where` are finite AND have
    finite derivatives at theta2=0 (the naive norm-based formulation leaks
    NaN through jacfwd — found by the RANSAC GN refiner)."""
    small = theta2 < 1e-6
    t2_safe = jnp.where(small, 1.0, theta2)
    t_safe = jnp.sqrt(t2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t_safe) / t_safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t_safe)) / t2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (t_safe - jnp.sin(t_safe)) / (t2_safe * t_safe)
    )
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues, with Taylor fallback near zero (jit- and grad-safe)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    A, B, _ = _sincos_coeffs(theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle vector (...,3).

    Quaternion route: exact for every angle in [0, pi] — the (R - R^T)
    formulation is singular at pi (vee = 0), which real data hits whenever
    a detected calibration grid is 180-degree rotated vs the board."""
    q = rot_to_quat(R)
    qw, qv = q[..., 0], q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(n, qw)
    small = n < 1e-6
    n_safe = jnp.where(small, 1.0, n)
    # small angle: theta/n -> 2/qw * (1 - n^2/(3 qw^2)) -> 2
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-6), theta / n_safe)
    return scale[..., None] * qv


def se3_exp(xi: jax.Array) -> jax.Array:
    """(...,6) twist (v, w) -> (...,4,4) pose."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    _, B, C = _sincos_coeffs(theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B * W + C * W2
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_pose(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(...,4,4) pose -> (...,6) twist (v, w)."""
    w = so3_log(T[..., :3, :3])
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-6
    t2_safe = jnp.where(small, 1.0, theta2)
    A, B, _ = _sincos_coeffs(theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / t2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# Pose deltas / consistency metrics (used by ProcessedLoopCandidate-equivalent
# checks: ref src/ProcessedLoopCandidate.cpp:63-87 compares |ypr|_inf and
# |t|_inf of pairwise delta poses).
# ---------------------------------------------------------------------------


def pose_delta_metrics(A: jax.Array, B: jax.Array):
    """Return (max |ypr| in degrees, max |t| in metres) of delta = A^-1 B."""
    D = pose_inverse(A) @ B
    ypr_deg = jnp.rad2deg(rot_to_ypr(D[..., :3, :3]))
    t = D[..., :3, 3]
    return jnp.max(jnp.abs(ypr_deg), axis=-1), jnp.max(jnp.abs(t), axis=-1)


def yaw_translation_pose(yaw: jax.Array, t: jax.Array) -> jax.Array:
    """4-DOF pose (yaw about Z + translation) — the parameterization of the
    reference's ceres fallback solver (src/PNPCeresCostFunctions.h:76-174)
    and of the 4-DOF pose graph."""
    z = jnp.zeros_like(yaw)
    ypr = jnp.stack([yaw, z, z], axis=-1)
    return make_pose(ypr_to_rot(ypr), t)
