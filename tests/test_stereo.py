"""Stereo pipeline on synthetic scenes with analytic disparity
(SURVEY.md §4: 'stereo depth vs analytic disparity')."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import cameras, se3, stereo


def textured(rng, h, w):
    img = rng.normal(size=(h, w)).astype(np.float32)
    for _ in range(2):
        img = 0.25 * (
            np.roll(img, 1, 0) + np.roll(img, -1, 0) + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        )
    return (img - img.min()) / (img.max() - img.min())


def test_block_match_constant_disparity(rng):
    """Right image = left shifted by a constant disparity -> block matcher
    must recover it."""
    h, w = 96, 256
    d_true = 12
    base = textured(rng, h, w + d_true)
    left = base[:, :-d_true]  # left(x)  = base(x)
    right = base[:, d_true:]  # right(x) = base(x + d) = left(x + d)
    disp, valid = stereo.block_match(
        jnp.asarray(left), jnp.asarray(right), num_disp=32, block=11
    )
    v = np.asarray(valid)
    assert v.sum() > 0.3 * v.size
    err = np.abs(np.asarray(disp)[v] - d_true)
    assert np.median(err) < 0.5
    assert np.percentile(err, 90) < 1.0


def test_block_match_two_planes(rng):
    """Two half-images at different disparities."""
    h, w = 96, 256
    d1, d2 = 6, 20
    base = textured(rng, h, w + 32)
    left = base[:, :w]  # left(x) = base(x)
    right = np.zeros_like(left)
    right[: h // 2] = base[: h // 2, d1 : d1 + w]  # right(x) = left(x + d1)
    right[h // 2 :] = base[h // 2 :, d2 : d2 + w]
    disp, valid = stereo.block_match(
        jnp.asarray(left), jnp.asarray(right), num_disp=32, block=11
    )
    v = np.asarray(valid)
    dd = np.asarray(disp)
    top = dd[: h // 2 - 8][v[: h // 2 - 8]]
    bot = dd[h // 2 + 8 :][v[h // 2 + 8 :]]
    assert abs(np.median(top) - d1) < 0.5
    assert abs(np.median(bot) - d2) < 0.5


def test_disparity_to_points_roundtrip():
    rig = stereo.RectifiedRig(
        R0=jnp.eye(3),
        R1=jnp.eye(3),
        fx=jnp.asarray(400.0),
        fy=jnp.asarray(400.0),
        cx=jnp.asarray(160.0),
        cy=jnp.asarray(120.0),
        baseline=jnp.asarray(0.11),  # EuRoC-ish
    )
    disp = jnp.full((240, 320), 11.0)
    valid = jnp.ones((240, 320), bool)
    pts, ok = stereo.disparity_to_points(disp, valid, rig)
    z = np.asarray(pts[..., 2])
    np.testing.assert_allclose(z, 400.0 * 0.11 / 11.0, rtol=1e-5)  # 4 m
    assert bool(np.all(np.asarray(ok)))
    # center pixel -> x,y near 0
    np.testing.assert_allclose(np.asarray(pts[120, 160, :2]), [0, 0], atol=0.02)


def test_depth_gate():
    rig = stereo.RectifiedRig(
        R0=jnp.eye(3), R1=jnp.eye(3),
        fx=jnp.asarray(400.0), fy=jnp.asarray(400.0),
        cx=jnp.asarray(160.0), cy=jnp.asarray(120.0),
        baseline=jnp.asarray(0.11),
    )
    disp = jnp.full((16, 16), 0.5)  # depth 88 m > 25 m gate
    pts, ok = stereo.disparity_to_points(disp, jnp.ones((16, 16), bool), rig)
    assert not bool(np.any(np.asarray(ok)))


def test_rectify_identity_rig(rng):
    """Two identical pinhole cams displaced along x: rectification should be
    near-identity rotations and preserve epipolar rows."""
    cam = cameras.make_pinhole(400.0, 400.0, 160.0, 120.0, width=320, height=240)
    c1_T_c0 = np.eye(4, dtype=np.float32)
    c1_T_c0[0, 3] = -0.11  # cam1 sees points shifted +x
    rig = stereo.stereo_rectify(cam, cam, jnp.asarray(c1_T_c0))
    np.testing.assert_allclose(np.asarray(rig.R0), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rig.R1), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(float(rig.baseline), 0.11, rtol=1e-6)


def test_rectify_map_and_remap_identity(rng):
    cam = cameras.make_pinhole(400.0, 400.0, 160.0, 120.0, width=320, height=240)
    rig = stereo.RectifiedRig(
        R0=jnp.eye(3), R1=jnp.eye(3),
        fx=jnp.asarray(400.0), fy=jnp.asarray(400.0),
        cx=jnp.asarray(160.0), cy=jnp.asarray(120.0),
        baseline=jnp.asarray(0.11),
    )
    m = stereo.rectify_map(cam, jnp.eye(3), rig, (240, 320))
    # identity camera, identity rotation -> map is the pixel grid itself
    uu, vv = np.meshgrid(np.arange(320), np.arange(240))
    np.testing.assert_allclose(np.asarray(m[..., 0]), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m[..., 1]), vv, atol=1e-3)
    img = jnp.asarray(textured(rng, 240, 320))
    out = stereo.remap_bilinear(img, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_rectified_rotated_rig_epipolar(rng):
    """cam1 slightly rotated about y: after rectification a 3D point must
    land on the same row in both rectified views."""
    cam = cameras.make_pinhole(400.0, 400.0, 160.0, 120.0, width=320, height=240)
    ang = np.deg2rad(3.0)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray([ang, 0.0, 0.0], jnp.float32)))
    c1_T_c0 = np.eye(4, dtype=np.float32)
    c1_T_c0[:3, :3] = R
    c1_T_c0[:3, 3] = R @ np.array([-0.11, 0.0, 0.0], np.float32)
    rig = stereo.stereo_rectify(cam, cam, jnp.asarray(c1_T_c0))

    pts = np.stack(
        [rng.uniform(-1, 1, 50), rng.uniform(-0.7, 0.7, 50), rng.uniform(3, 10, 50)],
        axis=-1,
    ).astype(np.float32)
    # rectified projections: rotate into rectified frames, pinhole-project
    p0 = pts @ np.asarray(rig.R0).T
    p1 = (pts @ np.asarray(c1_T_c0[:3, :3]).T + np.asarray(c1_T_c0[:3, 3])) @ np.asarray(rig.R1).T
    v0 = 400.0 * p0[:, 1] / p0[:, 2] + 120.0
    v1 = 400.0 * p1[:, 1] / p1[:, 2] + 120.0
    np.testing.assert_allclose(v0, v1, atol=0.05)  # same row = epipolar OK
    # disparity positive (left x > right x)
    u0 = 400.0 * p0[:, 0] / p0[:, 2] + 160.0
    u1 = 400.0 * p1[:, 0] / p1[:, 2] + 160.0
    assert np.all(u0 - u1 > 0)


def test_stereo_rectifier_epipolar_alignment(rng):
    """Raw distorted stereo pair -> StereoRectifier -> a 3D point must land
    on the same row in both rectified images (the property the whole
    verification stage depends on)."""
    cam0 = cameras.make_pinhole(
        400.0, 400.0, 160.0, 120.0, dist=(-0.25, 0.06, 0.001, -0.0005),
        width=320, height=240,
    )
    cam1 = cameras.make_pinhole(
        398.0, 401.0, 158.0, 122.0, dist=(-0.24, 0.055, -0.001, 0.0008),
        width=320, height=240,
    )
    ang = np.deg2rad(2.0)
    R = np.asarray(se3.ypr_to_rot(jnp.asarray([ang, 0.0, 0.0], jnp.float32)))
    c1_T_c0 = np.eye(4, dtype=np.float32)
    c1_T_c0[:3, :3] = R
    c1_T_c0[:3, 3] = R @ np.array([-0.11, 0.0, 0.0], np.float32)

    rect = stereo.StereoRectifier(cam0, cam1, c1_T_c0, out_hw=(240, 320))
    rig = rect.rig

    # project 3D points through BOTH raw cameras, map through the
    # rectification maps' inverse relationship: rectified pixel of a point
    # = pinhole projection after the rectifying rotation
    pts = np.stack(
        [rng.uniform(-0.6, 0.6, 40), rng.uniform(-0.4, 0.4, 40), rng.uniform(3, 8, 40)],
        axis=-1,
    ).astype(np.float32)
    p0 = pts @ np.asarray(rig.R0).T
    p1 = (pts @ np.asarray(c1_T_c0[:3, :3]).T + np.asarray(c1_T_c0[:3, 3])) @ np.asarray(rig.R1).T
    v0 = np.asarray(rig.fy) * p0[:, 1] / p0[:, 2] + np.asarray(rig.cy)
    v1 = np.asarray(rig.fy) * p1[:, 1] / p1[:, 2] + np.asarray(rig.cy)
    np.testing.assert_allclose(v0, v1, atol=0.05)

    # and the image content actually moves to the right place: rectify a
    # synthetic raw image that encodes its own raw pixel coordinates, then
    # check the rectified sample at a known rectified pixel equals the raw
    # coordinate the map predicts
    uu, vv = np.meshgrid(np.arange(320, dtype=np.float32), np.arange(240, dtype=np.float32))
    coded = uu + 1000.0 * vv  # unique value per raw pixel
    rectified, _ = rect.rectify(coded, coded)
    ys, xs = 120, 160
    exp_x, exp_y = rect.map0[ys, xs]
    # bilinear of the coded image at (exp_x, exp_y):
    expected = exp_x + 1000.0 * exp_y
    assert abs(rectified[ys, xs] - expected) < 1.0
