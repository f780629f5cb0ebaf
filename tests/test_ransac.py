"""RANSAC PnP / ICP solvers on synthetic scenes with known ground truth,
mirroring the reference's unittest_theia.cpp playground but automated
(SURVEY.md §4: 'PnP/ICP vs closed-form on synthetic scenes')."""

import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import se3
from cerebro_tpu.ops import pnp, ransac, umeyama


def make_scene(rng, n=200, outlier_frac=0.3, noise=0.002):
    """3D points in frame A, ground-truth pose b_T_a, observations in B."""
    X = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(3, 12, n),
        ],
        axis=-1,
    ).astype(np.float32)
    ypr = np.deg2rad([14.0, -6.0, 3.0]).astype(np.float32)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray(ypr)))
    t = np.array([0.4, -0.2, 0.3], np.float32)
    T_gt = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))

    Xb = X @ R.T + t
    x = Xb[:, :2] / Xb[:, 2:3] + rng.normal(0, noise, (n, 2)).astype(np.float32)
    # corrupt a fraction with gross outliers
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    x[out_idx] += rng.uniform(0.2, 1.0, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return jnp.asarray(X), jnp.asarray(x), jnp.asarray(T_gt), out_idx


def pose_error(T, T_gt):
    ang, trans = se3.pose_delta_metrics(jnp.asarray(T_gt), jnp.asarray(T))
    return float(ang), float(trans)


def test_pnp_dlt_exact_on_clean_data(rng):
    X, x, T_gt, _ = make_scene(rng, n=64, outlier_frac=0.0, noise=0.0)
    T = pnp.pnp_dlt(X, x, jnp.ones(64))
    ang, trans = pose_error(T, T_gt)
    assert ang < 0.1 and trans < 0.01


def test_ransac_pnp_recovers_pose_with_outliers(rng):
    X, x, T_gt, out_idx = make_scene(rng, n=200, outlier_frac=0.3)
    res = ransac.ransac_pnp(jax.random.PRNGKey(0), X, x, jnp.ones(200, dtype=bool))
    assert bool(res.success)
    ang, trans = pose_error(res.T, T_gt)
    assert ang < 0.5 and trans < 0.05
    # outliers must be excluded from the inlier set
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 3
    assert float(res.confidence) >= 0.65


def test_ransac_pnp_fails_gracefully_on_garbage(rng):
    X = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32) + [0, 0, 5])
    x = jnp.asarray(rng.uniform(-1, 1, size=(50, 2)).astype(np.float32))
    res = ransac.ransac_pnp(jax.random.PRNGKey(0), X, x, jnp.ones(50, dtype=bool))
    assert not bool(res.success)
    assert np.all(np.isfinite(np.asarray(res.confidence)))


def test_ransac_pnp_too_few_points(rng):
    X, x, T_gt, _ = make_scene(rng, n=64, outlier_frac=0.0)
    valid = jnp.asarray(np.arange(64) < 10)  # below min_points=20
    res = ransac.ransac_pnp(jax.random.PRNGKey(0), X, x, valid)
    assert not bool(res.success)


def test_umeyama_exact(rng):
    P = rng.normal(size=(40, 3)).astype(np.float32)
    ypr = np.deg2rad([30.0, 10.0, -20.0]).astype(np.float32)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray(ypr)))
    t = np.array([1.0, -2.0, 0.5], np.float32)
    Q = P @ R.T + t
    T, scale = umeyama.umeyama_rigid(jnp.asarray(P), jnp.asarray(Q), jnp.ones(40))
    T_gt = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))
    np.testing.assert_allclose(np.asarray(T), T_gt, atol=1e-5)
    assert abs(float(scale) - 1.0) < 1e-4


def test_umeyama_weighted_ignores_masked(rng):
    P = rng.normal(size=(40, 3)).astype(np.float32)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray(np.deg2rad([5.0, 0.0, 0.0]))))
    t = np.array([0.1, 0.0, 0.0], np.float32)
    Q = P @ R.T + t
    Q[30:] += 100.0  # garbage in masked rows
    w = np.ones(40, np.float32)
    w[30:] = 0.0
    T, _ = umeyama.umeyama_rigid(jnp.asarray(P), jnp.asarray(Q), jnp.asarray(w))
    T_gt = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))
    np.testing.assert_allclose(np.asarray(T), T_gt, atol=1e-5)


def test_ransac_icp_with_outliers(rng):
    P = rng.normal(size=(150, 3)).astype(np.float32) * 3
    ypr = np.deg2rad([25.0, -8.0, 12.0]).astype(np.float32)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray(ypr)))
    t = np.array([0.5, 1.0, -0.3], np.float32)
    Q = (P @ R.T + t).astype(np.float32)
    Q += rng.normal(0, 0.005, Q.shape).astype(np.float32)
    out_idx = rng.choice(150, 40, replace=False)
    Q[out_idx] += rng.uniform(1, 5, (40, 3)).astype(np.float32)

    res = ransac.ransac_icp(
        jax.random.PRNGKey(1), jnp.asarray(P), jnp.asarray(Q), jnp.ones(150, dtype=bool)
    )
    assert bool(res.success)
    T_gt = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))
    ang, trans = pose_error(res.T, T_gt)
    assert ang < 0.5 and trans < 0.05
    assert np.asarray(res.inliers)[out_idx].sum() <= 2


def test_ransac_is_jit_stable_across_keys(rng):
    X, x, T_gt, _ = make_scene(rng, n=200, outlier_frac=0.25)
    for k in range(3):
        res = ransac.ransac_pnp(jax.random.PRNGKey(k), X, x, jnp.ones(200, dtype=bool))
        assert bool(res.success)
        ang, trans = pose_error(res.T, T_gt)
        assert ang < 0.5 and trans < 0.05
