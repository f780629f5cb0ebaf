"""Feature pipeline on synthetic textured images with known warps."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.ops import features


def textured_image(rng, h=240, w=320):
    """Blobby random texture with corners (smoothed noise + checkers)."""
    img = rng.normal(size=(h, w)).astype(np.float32)
    # cheap smoothing for blob structure
    for _ in range(2):
        img = 0.25 * (
            np.roll(img, 1, 0) + np.roll(img, -1, 0) + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        )
    yy, xx = np.mgrid[0:h, 0:w]
    img += 0.5 * ((xx // 16 + yy // 16) % 2)
    return (img - img.min()) / (img.max() - img.min())


def test_harris_finds_checker_corners(rng):
    img = np.zeros((128, 128), np.float32)
    img[::, :] = ((np.mgrid[0:128, 0:128][0] // 32 + np.mgrid[0:128, 0:128][1] // 32) % 2).astype(
        np.float32
    )
    kps = features.harris_corners(jnp.asarray(img), max_kp=64, border=8)
    found = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert len(found) >= 4
    # every found corner is near a multiple-of-32 grid crossing
    mod = np.abs((found + 16) % 32 - 16)
    assert np.all(mod <= 3)


def test_match_identical_images(rng):
    img = jnp.asarray(textured_image(rng))
    m = features.match_image_pair(img, img, max_kp=512)
    n = int(m.count())
    assert n > 150  # enough matches to pass the attempt gate
    valid = np.asarray(m.valid)
    np.testing.assert_allclose(
        np.asarray(m.xy_a)[valid], np.asarray(m.xy_b)[valid], atol=0.5
    )


def test_match_translated_image(rng):
    base = textured_image(rng, 256, 336)
    shift = 12
    a = base[:, :-shift]
    b = base[:, shift:]
    m = features.match_image_pair(jnp.asarray(a), jnp.asarray(b), max_kp=512)
    valid = np.asarray(m.valid)
    assert valid.sum() > 100
    dx = np.asarray(m.xy_b)[valid, 0] - np.asarray(m.xy_a)[valid, 0]
    dy = np.asarray(m.xy_b)[valid, 1] - np.asarray(m.xy_a)[valid, 1]
    # displacement should be uniformly (-shift, 0)
    assert np.median(np.abs(dx + shift)) < 1.0
    assert np.median(np.abs(dy)) < 1.0
    # GMS should have removed gross outliers: 90th pct also tight
    assert np.percentile(np.abs(dx + shift), 90) < 2.0


def test_unrelated_images_yield_few_matches(rng):
    a = textured_image(rng)
    b = textured_image(np.random.default_rng(123))
    m = features.match_image_pair(jnp.asarray(a), jnp.asarray(b), max_kp=512)
    # far below the >=150 attempt gate of the verification stage
    assert int(m.count()) < 150


def test_oriented_matching_survives_rotation(rng):
    """45-degree in-plane rotation: plain patches produce zero correct
    matches; oriented (ORB-steered) patches keep a large correct set (the
    reference's ORB rotation invariance). Correctness measured against the
    known rotation, pre-GMS (GMS needs density, not orientation)."""
    from scipy import ndimage  # rotation reference

    deg = 45.0
    img = textured_image(rng, 280, 280)
    rot = ndimage.rotate(img, deg, reshape=False, order=1, mode="nearest").astype(
        np.float32
    )
    a = jnp.asarray(img[40:240, 40:240])
    b = jnp.asarray(rot[40:240, 40:240])
    ka = features.harris_corners(a, max_kp=512)
    kb = features.harris_corners(b, max_kp=512)
    sa = features._box_filter(a, 5) / 25.0
    sb = features._box_filter(b, 5) / 25.0

    def correct_matches(oriented):
        da = features.patch_descriptors(sa, ka, oriented=oriented)
        db = features.patch_descriptors(sb, kb, oriented=oriented)
        m = features.mutual_nn_match(da, db, ka, kb)
        v = np.asarray(m.valid)
        if v.sum() == 0:
            return 0
        pa = np.asarray(m.xy_a)[v] + 40.0
        pb = np.asarray(m.xy_b)[v] + 40.0
        th = np.deg2rad(-deg)
        c = np.array([139.5, 139.5])
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        err = np.linalg.norm((pa - c) @ R.T + c - pb, axis=1)
        return int((err < 3).sum())

    good_plain = correct_matches(False)
    good_orient = correct_matches(True)
    assert good_plain < 10, good_plain  # plain genuinely collapses
    assert good_orient > 40, good_orient  # steered patches survive


def test_oriented_matching_identity_unchanged(rng):
    """On identical images oriented mode still matches plentifully."""
    img = jnp.asarray(textured_image(rng))
    m = features.match_image_pair(img, img, max_kp=512, oriented=True)
    assert int(m.count()) > 150


# fractional half-octave banks; octave pairs from the 3-level detection
# pyramid cover the powers of 2 (together = the GMS 5-scale sweep's range)
SCALE_BANKS = (0.5, 0.70710678, 1.0, 1.41421356)


def _scale_pair(rng, zoom: float):
    """Revisit at `zoom`x the approach distance: frame a is the close view,
    frame b sees the same scene at 1/zoom scale. Returns (a, b, map a->b)."""
    from scipy import ndimage

    size = 360
    base = textured_image(rng, size, size)
    crop = 60
    a = base[crop : size - crop, crop : size - crop]  # 240x240 close view
    s = 1.0 / zoom
    b = ndimage.zoom(base, s, order=1).astype(np.float32)
    b = b[: a.shape[0], : a.shape[1]]  # keep shapes equal (scene fits)

    def a_to_b(xy):
        return (xy + crop) * s

    return a, b, a_to_b


def _correct_count(a, b, a_to_b, scales, tol=4.0):
    m = features.match_image_pair(
        jnp.asarray(a), jnp.asarray(b), max_kp=512, oriented=True, scales=scales
    )
    v = np.asarray(m.valid)
    if v.sum() == 0:
        return 0
    err = np.linalg.norm(a_to_b(np.asarray(m.xy_a)[v]) - np.asarray(m.xy_b)[v], axis=1)
    return int((err < tol).sum())


def test_scale_banks_survive_scale_change(rng):
    """Revisit at 1.5x approach distance (the case VERDICT r2 flagged: the
    reference's ORB pyramid + GMS 5-scale sweep passes it,
    src/utils/PointFeatureMatching.cpp:21, gms_matcher.h:9-46). Single-scale
    matching collapses; the 5-bank scale sweep keeps a verifiable set."""
    a, b, a_to_b = _scale_pair(rng, zoom=1.5)
    single = _correct_count(a, b, a_to_b, scales=(1.0,))
    banked = _correct_count(a, b, a_to_b, scales=SCALE_BANKS)
    assert single < 60, single  # single-scale genuinely degrades
    assert banked > 100, banked  # scale banks recover a dense match set
    assert banked > 2 * max(single, 1), (single, banked)


def test_scale_banks_survive_2x(rng):
    """Same at a 2x distance change — the far end of the reference's sweep."""
    a, b, a_to_b = _scale_pair(rng, zoom=2.0)
    single = _correct_count(a, b, a_to_b, scales=(1.0,))
    banked = _correct_count(a, b, a_to_b, scales=SCALE_BANKS)
    assert banked > 60, banked
    assert banked > 2 * max(single, 1), (single, banked)


def test_scale_banks_identity_unchanged(rng):
    """Scale banks must not degrade the same-scale case."""
    img = jnp.asarray(textured_image(rng))
    m = features.match_image_pair(
        img, img, max_kp=512, oriented=True, scales=SCALE_BANKS
    )
    assert int(m.count()) > 150
