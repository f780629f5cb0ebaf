"""Steerable ring-Fourier matcher (ops/steerable.py +
features.match_image_pair_steerable): rotation as coefficient phase, scale
as alternate basis matmuls — the MXU-shaped form of the reference's ORB
pyramid + steered BRIEF + GMS rotation/scale sweeps
(src/utils/PointFeatureMatching.cpp:21, gms_matcher.h:9-46)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cerebro_tpu.ops import features, steerable
from test_features import textured_image, _scale_pair


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_steering_matches_rotated_content(rng):
    """rot_rho(patch) coefficients equal steer(c, -rho) — the phase law the
    whole rotation mechanism rests on."""
    from scipy import ndimage

    img = ndimage.gaussian_filter(
        rng.normal(size=(200, 200)).astype(np.float32), 2.0
    )
    rho = np.deg2rad(30.0)
    rot = ndimage.rotate(img, 30.0, reshape=False, order=3).astype(np.float32)
    xy = jnp.asarray([[100.0, 100.0]])
    ca = steerable.features_from_superpatches(
        steerable.extract_superpatches(jnp.asarray(img), xy), 2.0
    )
    cb = steerable.features_from_superpatches(
        steerable.extract_superpatches(jnp.asarray(rot), xy), 2.0
    )
    s = float(steerable.score_matrix(steerable.steer(ca, -rho), cb)[0, 0])
    assert s > 0.98, s
    # and the dominant orientations track the rotation exactly
    ta = float(steerable.dominant_orientation(ca)[0])
    tb = float(steerable.dominant_orientation(cb)[0])
    assert abs((tb - ta) - rho) < np.deg2rad(1.0)
    # canonical normalization aligns both
    can = steerable.steer(ca, ta)
    cbn = steerable.steer(cb, tb)
    assert float(steerable.score_matrix(can, cbn)[0, 0]) > 0.98


def test_steerable_identity_dense(rng):
    img = jnp.asarray(textured_image(rng))
    m = features.match_image_pair_steerable(img, img, max_kp=512)
    assert int(m.count()) > 250


def test_steerable_survives_scale_change(rng):
    for zoom, floor in ((1.5, 60), (2.0, 45)):
        r = np.random.default_rng(0)
        a, b, a_to_b = _scale_pair(r, zoom=zoom)
        m = features.match_image_pair_steerable(
            jnp.asarray(a), jnp.asarray(b), max_kp=512
        )
        v = np.asarray(m.valid)
        assert v.sum() > 0, zoom
        err = np.linalg.norm(
            a_to_b(np.asarray(m.xy_a)[v]) - np.asarray(m.xy_b)[v], axis=1
        )
        assert int((err < 4).sum()) > floor, (zoom, int((err < 4).sum()))


def test_steerable_survives_45deg_roll(rng):
    from scipy import ndimage

    r = np.random.default_rng(1)
    base = textured_image(r, 340, 340)
    a = base[50:290, 50:290]
    rot = ndimage.rotate(base, 45.0, reshape=False, order=1)
    b = rot[50:290, 50:290].astype(np.float32)
    m = features.match_image_pair_steerable(
        jnp.asarray(a), jnp.asarray(b), max_kp=512
    )
    th = np.deg2rad(45.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    ctr = np.array([170.0, 170.0])
    v = np.asarray(m.valid)
    assert v.sum() > 0
    q = (np.asarray(m.xy_a)[v] + 50 - ctr) @ R + ctr - 50
    err = np.linalg.norm(q - np.asarray(m.xy_b)[v], axis=1)
    assert int((err < 5).sum()) > 60, int((err < 5).sum())
