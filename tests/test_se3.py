import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import se3


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(se3.quat_to_rot(jnp.asarray(q, jnp.float32)))


def test_quat_rot_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    R = se3.quat_to_rot(jnp.asarray(q))
    q2 = se3.rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=2e-3)
    # R is orthonormal with det +1
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_ypr_roundtrip(rng):
    ypr = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
    R = se3.ypr_to_rot(jnp.asarray(ypr))
    ypr2 = se3.rot_to_ypr(R)
    np.testing.assert_allclose(np.asarray(ypr2), ypr, atol=1e-5)


def test_pose_inverse_compose(rng):
    R = random_rotations(rng, 16)
    t = rng.normal(size=(16, 3)).astype(np.float32)
    T = se3.make_pose(jnp.asarray(R, jnp.float32), jnp.asarray(t))
    I = np.asarray(se3.pose_compose(T, se3.pose_inverse(T)))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-1.0, 1.0, size=(32, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)
    # zero twist -> identity (Taylor branch)
    T0 = se3.se3_exp(jnp.zeros((6,)))
    np.testing.assert_allclose(np.asarray(T0), np.eye(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.se3_log(jnp.eye(4))), np.zeros(6), atol=1e-6)


def test_exp_log_jittable_and_vmappable(rng):
    xi = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 6)), jnp.float32)
    out = jax.jit(jax.vmap(se3.se3_exp))(xi)
    assert out.shape == (8, 4, 4)
    # gradients flow (needed by the pose-graph optimizer)
    g = jax.grad(lambda x: jnp.sum(se3.se3_exp(x)[:3, 3]))(xi[0])
    assert np.all(np.isfinite(np.asarray(g)))


def test_transform_points(rng):
    R = random_rotations(rng, 1)[0]
    t = np.array([1.0, 2.0, 3.0], np.float32)
    T = se3.make_pose(jnp.asarray(R, jnp.float32), jnp.asarray(t))
    pts = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    out = se3.transform_points(T, pts)
    expected = np.asarray(pts) @ R.T + t
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_pose_delta_metrics_identity():
    T = jnp.eye(4)
    ang, trans = se3.pose_delta_metrics(T, T)
    assert float(ang) < 1e-5 and float(trans) < 1e-6


def test_pose_delta_metrics_detects_offset(rng):
    A = jnp.eye(4)
    B = se3.yaw_translation_pose(jnp.deg2rad(10.0), jnp.array([0.5, 0.0, 0.0]))
    ang, trans = se3.pose_delta_metrics(A, B)
    np.testing.assert_allclose(float(ang), 10.0, atol=1e-3)
    np.testing.assert_allclose(float(trans), 0.5, atol=1e-5)


def test_so3_log_exact_pi_rotations():
    """180-degree flips: the (R - R^T) vee vector vanishes, so a naive log
    returns 0. Hit by calibration when a detected grid is flipped vs the
    board (found via test_chessboard NaNs)."""
    import numpy as np

    axes = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, -1, 2]], dtype=np.float32
    )
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    R = se3.so3_exp(jnp.asarray(axes * np.pi))
    w = np.asarray(se3.so3_log(R))
    # log must return pi * (+/- axis)
    ang = np.linalg.norm(w, axis=-1)
    assert np.allclose(ang, np.pi, atol=1e-5), ang
    R2 = np.asarray(se3.so3_exp(jnp.asarray(w)))
    assert np.allclose(R2, np.asarray(R), atol=1e-5)


def test_se3_log_tiny_rotation_float32():
    """theta ~ 2e-4: (1 - cos t) underflows in float32, which made the
    V-inverse coefficient inf (A/(2B) with B rounded to 0)."""
    import numpy as np

    xi = jnp.asarray([0.3, -0.2, 0.5, 1e-4, -2e-4, 1.5e-4], jnp.float32)
    T = se3.se3_exp(xi)
    back = np.asarray(se3.se3_log(T))
    assert np.isfinite(back).all()
    assert np.allclose(back, np.asarray(xi), atol=1e-5)
