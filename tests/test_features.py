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
