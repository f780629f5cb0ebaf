"""Pose-graph GN on synthetic loopy trajectories: drift correction,
switchable outlier rejection, multi-world merge."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import PoseGraphConfig
from cerebro_tpu.posegraph import PoseGraph, initialize_worlds, optimize, relative_yaw_t
from cerebro_tpu.geometry import se3

CFG = PoseGraphConfig(max_gn_iters=15, cg_iters=80)


def circle_traj(n, radius=10.0):
    """Ground-truth square-ish loop trajectory in the plane, yaw tangent."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    xyz = np.stack([radius * np.cos(ang), radius * np.sin(ang), np.zeros(n)], -1)
    yaw = ang + np.pi / 2
    return np.concatenate([xyz, yaw[:, None]], -1).astype(np.float32)


def to_poses(x):
    return np.asarray(se3.yaw_translation_pose(jnp.asarray(x[:, 3]), jnp.asarray(x[:, :3])))


def odo_measurements(x_gt, rng, noise_t=0.02, noise_y=0.002, drift_y=0.004):
    """Noisy odometry with systematic yaw drift (VINS-like)."""
    T = to_poses(x_gt)
    n = len(x_gt)
    meas = []
    for i in range(n - 1):
        m = np.array(relative_yaw_t(jnp.asarray(T[i]), jnp.asarray(T[i + 1])))
        m[:3] += rng.normal(0, noise_t, 3)
        m[3] += rng.normal(0, noise_y) + drift_y
        meas.append(m)
    return np.asarray(meas, np.float32)


def integrate(meas, x0):
    """Dead-reckon the odometry chain (the drifted initialization)."""
    out = [np.asarray(x0, np.float32)]
    for m in meas:
        x = out[-1]
        c, s = np.cos(x[3]), np.sin(x[3])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        out.append(
            np.concatenate([x[:3] + R @ m[:3], [x[3] + m[3]]]).astype(np.float32)
        )
    return np.asarray(out)


def build_graph(x_init, odo, loops, loop_meas, n_pad=0):
    n = len(x_init)
    eo = len(odo)
    el = max(len(loops), 1)
    li = np.zeros(el, np.int32)
    lj = np.zeros(el, np.int32)
    lm = np.zeros((el, 4), np.float32)
    lv = np.zeros(el, bool)
    for k, (a, b) in enumerate(loops):
        li[k], lj[k] = a, b
        lm[k] = loop_meas[k]
        lv[k] = True
    return PoseGraph(
        xyzyaw=jnp.asarray(x_init),
        node_valid=jnp.ones(n, dtype=bool),
        odo_i=jnp.arange(eo, dtype=jnp.int32),
        odo_j=jnp.arange(1, eo + 1, dtype=jnp.int32),
        odo_meas=jnp.asarray(odo),
        odo_valid=jnp.ones(eo, dtype=bool),
        loop_i=jnp.asarray(li),
        loop_j=jnp.asarray(lj),
        loop_meas=jnp.asarray(lm),
        loop_valid=jnp.asarray(lv),
    )


def ate(x, x_gt):
    return float(np.sqrt(np.mean(np.sum((x[:, :3] - x_gt[:, :3]) ** 2, -1))))


def test_loop_closure_corrects_drift(rng):
    n = 60
    x_gt = circle_traj(n)
    odo = odo_measurements(x_gt, rng)
    x_init = integrate(odo, x_gt[0])
    drift_before = ate(x_init, x_gt)
    assert drift_before > 0.5  # drift is meaningful

    # loop edges: revisit closure between end and start region
    T = to_poses(x_gt)
    loops = [(n - 1, 0), (n - 2, 1), (n - 3, 2)]
    lm = [
        np.asarray(relative_yaw_t(jnp.asarray(T[a]), jnp.asarray(T[b])))
        for a, b in loops
    ]
    g = build_graph(x_init, odo, loops, lm)
    x_opt, switches, cost = optimize(g, CFG)
    x_opt = np.asarray(x_opt)
    after = ate(x_opt, x_gt)
    # Loop edges only touch the chain ends; biased odometry keeps some
    # mid-chain sag, but the closure must cut ATE at least in half and the
    # endpoints must land on the revisited frames.
    assert after < 0.5 * drift_before, f"ATE {drift_before:.3f} -> {after:.3f}"
    end_err = np.linalg.norm(x_opt[n - 1, :3] - x_gt[n - 1, :3])
    assert end_err < 0.15, f"closure endpoint off by {end_err:.3f} m"
    assert np.all(np.asarray(switches) > 0.7)  # good edges stay on


def test_switch_rejects_false_loop(rng):
    n = 60
    x_gt = circle_traj(n)
    odo = odo_measurements(x_gt, rng)
    x_init = integrate(odo, x_gt[0])

    T = to_poses(x_gt)
    good = [(n - 1, 0), (n - 2, 1)]
    lm = [np.asarray(relative_yaw_t(jnp.asarray(T[a]), jnp.asarray(T[b]))) for a, b in good]
    # false loop: claims frame 30 is at frame 5 with garbage transform
    bad = (30, 5)
    lm_bad = np.array([5.0, -3.0, 1.0, 2.0], np.float32)
    g = build_graph(x_init, odo, good + [bad], lm + [lm_bad])
    x_opt, switches, _ = optimize(g, CFG)
    sw = np.asarray(switches)
    assert np.all(sw[:2] > 0.6), f"good switches {sw}"
    assert sw[2] < 0.3, f"bad switch stayed on: {sw}"
    after = ate(np.asarray(x_opt), x_gt)
    assert after < 1.0


def test_multi_world_merge(rng):
    """Two worlds (kidnap in between): world 1 starts at an arbitrary wrong
    offset; a cross-world loop edge must pull it onto world 0's frame —
    the reference's multi-session merge (README.md:177-186)."""
    n0, n1 = 30, 30
    x_gt = circle_traj(n0 + n1)
    T = to_poses(x_gt)
    rngl = np.random.default_rng(1)

    odo_all = odo_measurements(x_gt, rngl, drift_y=0.0)
    # world 0: nodes 0..29 chained; world 1: nodes 30..59 chained; NO odo
    # edge between 29 and 30 (kidnap gap)
    odo_valid = np.ones(n0 + n1 - 1, bool)
    odo_valid[n0 - 1] = False

    # world 1 initialized in its own (offset) frame
    x_init = integrate(odo_all, x_gt[0])
    offset = np.array([7.0, -4.0, 0.5, 0.8], np.float32)
    x_init2 = x_init.copy()
    # re-integrate world 1 from the offset anchor
    x_init2[n0] = offset
    for i in range(n0, n0 + n1 - 1):
        m = odo_all[i]
        c, s = np.cos(x_init2[i][3]), np.sin(x_init2[i][3])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        x_init2[i + 1] = np.concatenate(
            [x_init2[i][:3] + R @ m[:3], [x_init2[i][3] + m[3]]]
        )

    # cross-world loops: nodes 40..42 (world 1) revisit 10..12 (world 0)
    loops = [(40, 10), (41, 11), (42, 12)]
    lm = [np.asarray(relative_yaw_t(jnp.asarray(T[a]), jnp.asarray(T[b]))) for a, b in loops]

    # re-anchor world 1 from the first cross-world edge (the reference
    # solver's kidnap-merge initialization), then optimize
    world_id = np.concatenate([np.zeros(n0, np.int32), np.ones(n1, np.int32)])
    x_anchored = initialize_worlds(
        x_init2, world_id,
        [a for a, _ in loops], [b for _, b in loops],
        np.asarray(lm), np.ones(len(loops), bool),
    )
    assert ate(x_anchored, x_gt) < 2.0  # re-anchoring alone nearly merges

    g = build_graph(x_anchored, odo_all, loops, lm)
    g = dataclasses.replace(g, odo_valid=jnp.asarray(odo_valid))
    x_opt, switches, _ = optimize(g, CFG)
    after = ate(np.asarray(x_opt), x_gt)
    assert after < 0.6, f"merged ATE {after}"
    assert np.all(np.asarray(switches) > 0.5)


def test_sharded_optimizer_matches_single_device(rng):
    """Edge-sharded GN on the 8-device mesh must match the single-device
    optimizer (same problem, same iterations)."""
    from cerebro_tpu.parallel import make_mesh
    from cerebro_tpu.posegraph.distributed import optimize_sharded, pad_graph

    n = 60
    x_gt = circle_traj(n)
    odo = odo_measurements(x_gt, rng)
    x_init = integrate(odo, x_gt[0])
    T = to_poses(x_gt)
    loops = [(n - 1, 0), (n - 2, 1), (n - 3, 2)]
    lm = [np.asarray(relative_yaw_t(jnp.asarray(T[a]), jnp.asarray(T[b]))) for a, b in loops]
    g = build_graph(x_init, odo, loops, lm)

    x_ref, sw_ref, cost_ref = optimize(g, CFG)

    mesh = make_mesh()
    gp = pad_graph(g, mesh.shape["db"])
    x_sh, sw_sh, cost_sh = optimize_sharded(gp, CFG, mesh)

    # truncated CG + different reduction orders drift slightly on this
    # ill-conditioned chain; require same solution basin + equal quality
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=0.15, rtol=0)
    np.testing.assert_allclose(
        np.asarray(sw_sh)[:3], np.asarray(sw_ref)[:3], atol=2e-2
    )
    np.testing.assert_allclose(float(cost_sh), float(cost_ref), rtol=0.1)
    # and it actually solved the problem
    assert ate(np.asarray(x_sh), x_gt) < 0.5 * ate(x_init, x_gt)


def test_6dof_loop_closure(rng):
    """Full-SE(3) mode: drift with pitch/roll content corrected by a
    closure (the 4-DOF mode cannot express out-of-plane rotation error)."""
    from cerebro_tpu.posegraph.optimizer import relative_se3

    n = 40
    # ground-truth twisting 3D trajectory
    xi_gt = np.zeros((n, 6), np.float32)
    for i in range(1, n):
        xi_gt[i] = xi_gt[i - 1] + np.array([0.3, 0.02, 0.05, 0.01, 0.015, 0.02], np.float32)
    T_gt = np.asarray(se3.se3_exp(jnp.asarray(xi_gt)))

    odo, noise = [], np.random.default_rng(0)
    for i in range(n - 1):
        m = np.array(relative_se3(jnp.asarray(T_gt[i]), jnp.asarray(T_gt[i + 1])))
        m += noise.normal(0, 0.004, 6)
        odo.append(m)
    odo = np.asarray(odo, np.float32)

    # integrate drifted initialization
    x_init = np.zeros((n, 6), np.float32)
    T = np.eye(4, dtype=np.float32)
    Ts = [T]
    for m in odo:
        T = T @ np.asarray(se3.se3_exp(jnp.asarray(m)))
        Ts.append(T.astype(np.float32))
    x_init = np.asarray(se3.se3_log(jnp.asarray(np.stack(Ts))))

    drift = float(np.linalg.norm(np.stack(Ts)[:, :3, 3] - T_gt[:, :3, 3], axis=-1).mean())

    loops = [(n - 1, 0), (n - 2, 1)]
    lm = [np.array(relative_se3(jnp.asarray(T_gt[a]), jnp.asarray(T_gt[b]))) for a, b in loops]
    g = PoseGraph(
        xyzyaw=jnp.asarray(x_init),
        node_valid=jnp.ones(n, dtype=bool),
        odo_i=jnp.arange(n - 1, dtype=jnp.int32),
        odo_j=jnp.arange(1, n, dtype=jnp.int32),
        odo_meas=jnp.asarray(odo),
        odo_valid=jnp.ones(n - 1, dtype=bool),
        loop_i=jnp.asarray([a for a, _ in loops], jnp.int32),
        loop_j=jnp.asarray([b for _, b in loops], jnp.int32),
        loop_meas=jnp.asarray(np.asarray(lm, np.float32)),
        loop_valid=jnp.ones(2, dtype=bool),
    )
    x_opt, switches, cost = optimize(g, PoseGraphConfig(dof=6, max_gn_iters=15, cg_iters=80))
    T_opt = np.asarray(se3.se3_exp(jnp.asarray(np.asarray(x_opt))))
    after = float(np.linalg.norm(T_opt[:, :3, 3] - T_gt[:, :3, 3], axis=-1).mean())
    assert after < 0.6 * drift, f"6-DOF: drift {drift:.3f} -> {after:.3f}"
    end_err = np.linalg.norm(T_opt[n - 1, :3, 3] - T_gt[n - 1, :3, 3])
    assert end_err < 0.1, f"closure endpoint {end_err:.3f}"
    assert np.all(np.asarray(switches) > 0.7)


def test_relative_yaw_t_np_matches_device():
    """The host-numpy twin used by live graph assembly must agree with the
    jax implementation (pipeline assembles edges host-side to avoid one
    relay round-trip per odometry edge)."""
    from cerebro_tpu.posegraph import relative_yaw_t_np

    rng = np.random.default_rng(3)
    T = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    for k in range(8):
        ypr = rng.uniform(-1.5, 1.5, 3)
        T[k, :3, :3] = np.asarray(se3.ypr_to_rot(jnp.asarray(ypr)))
        T[k, :3, 3] = rng.uniform(-5, 5, 3)
    got = relative_yaw_t_np(T[:-1], T[1:])
    want = np.asarray(relative_yaw_t(jnp.asarray(T[:-1]), jnp.asarray(T[1:])))
    np.testing.assert_allclose(got, want, atol=1e-5)
