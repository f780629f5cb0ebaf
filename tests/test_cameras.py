import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerebro_tpu.geometry import cameras

# EuRoC cam0 intrinsics (pinhole + radtan), from the reference's
# config/vinsfusion/euroc camera yamls.
EUROC_PINHOLE = dict(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
)


def _random_cam_points(rng, n=256):
    # points in front of the camera, moderate field of view
    xy = rng.uniform(-0.5, 0.5, size=(n, 2))
    z = rng.uniform(0.5, 20.0, size=(n, 1))
    return np.concatenate([xy * z, z], axis=-1).astype(np.float32)


@pytest.mark.parametrize(
    "cam",
    [
        cameras.make_pinhole(**EUROC_PINHOLE),
        cameras.make_kannala_brandt(
            460.0, 460.0, 376.0, 240.0, k=(-0.01, 0.005, -0.002, 0.0005)
        ),
        cameras.make_mei(600.0, 600.0, 376.0, 240.0, xi=1.0, dist=(-0.1, 0.02, 0.0, 0.0)),
        cameras.make_scaramuzza(
            1.001, 376.0, 240.0, poly=(420.0, -0.0013, 1e-6, -2e-9), d_affine=0.002
        ),
    ],
    ids=["pinhole", "kannala_brandt", "mei", "scaramuzza"],
)
def test_project_lift_roundtrip(cam, rng):
    P = jnp.asarray(_random_cam_points(rng))
    uv = cameras.project(cam, P)
    rays = cameras.lift(cam, uv)
    # lifted ray must align with the original point direction
    Pn = np.asarray(P) / np.linalg.norm(np.asarray(P), axis=-1, keepdims=True)
    cos = np.sum(np.asarray(rays) * Pn, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_project_is_jittable_and_vmappable(rng):
    cam = cameras.make_pinhole(**EUROC_PINHOLE)
    P = jnp.asarray(_random_cam_points(rng, 128))
    out = jax.jit(lambda p: cameras.project(cam, p))(P)
    assert out.shape == (128, 2)
    batched = jax.vmap(lambda p: cameras.project(cam, p))(P.reshape(8, 16, 3))
    assert batched.shape == (8, 16, 2)


def test_zero_distortion_matches_ideal(rng):
    cam = cameras.make_pinhole(400.0, 400.0, 320.0, 240.0)
    P = jnp.asarray(_random_cam_points(rng, 64))
    uv = np.asarray(cameras.project(cam, P))
    Pn = np.asarray(P)
    expected_u = 400.0 * Pn[:, 0] / Pn[:, 2] + 320.0
    expected_v = 400.0 * Pn[:, 1] / Pn[:, 2] + 240.0
    np.testing.assert_allclose(uv[:, 0], expected_u, rtol=1e-5)
    np.testing.assert_allclose(uv[:, 1], expected_v, rtol=1e-5)


def test_normalized_coords(rng):
    cam = cameras.make_pinhole(**EUROC_PINHOLE)
    P = jnp.asarray(_random_cam_points(rng, 64))
    uv = cameras.project(cam, P)
    nc = np.asarray(cameras.normalized_coords(cam, uv))
    expected = np.asarray(P[:, :2] / P[:, 2:3])
    np.testing.assert_allclose(nc, expected, atol=1e-4)


def test_yaml_factory():
    cam = cameras.from_yaml_dict(
        {
            "model_type": "PINHOLE",
            "image_width": 752,
            "image_height": 480,
            "projection_parameters": {"fx": 458.654, "fy": 457.296, "cx": 367.215, "cy": 248.375},
            "distortion_parameters": {"k1": -0.28, "k2": 0.07, "p1": 0.0, "p2": 0.0},
        }
    )
    assert cam.model == cameras.PINHOLE
    assert cam.width == 752
    K = np.asarray(cameras.K_matrix(cam))
    assert K[0, 0] == pytest.approx(458.654)
    assert K[2, 2] == 1.0
