"""Multi-scene real-photo descriptor benchmark (VERDICT r2 #6).

The r2 evidence for the ported flagship weights was three crops of ONE
photograph. This builds a 9-scene fixture set from license-free images
bundled with installed packages (no network):

  * sklearn.datasets sample images: china.jpg (2 non-overlapping halves),
    flower.jpg (1 scene — its halves are visually the same material and
    score 0.86 against each other, an honest hard negative if split);
  * matplotlib sample_data: grace_hopper.jpg (3 non-overlapping regions),
    jacksboro_fault_dem.npz rendered as grayscale terrain (2 halves),
    s1045.ima.gz MRI slice (1 scene);

with TWO views per scene (~10% viewpoint shift + brightness +14), and
asserts the ported descriptor's same-scene vs cross-scene cosine-similarity
distributions separate — the property the whole loop detector rests on
(ref README.md:151: the model maps same-place images near each other).

Measured distributions (this fixture set, ported mobilenet_conv7_allpairloss):
same-scene min 0.538 / mean 0.736; cross-scene p95 0.462 / mean 0.125 /
max 0.598 (worst confusions: china x flower — two vegetation photos — and
the two adjacent DEM halves). Thresholds below leave margin.
"""

import gzip
import os

import numpy as np
import pytest

import jax.numpy as jnp

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "descriptor_ported"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ARTIFACT), reason="no ported artifact"
)


def _gray3(img):
    return np.stack([img] * 3, -1) if img.ndim == 2 else img


def _scenes():
    import cv2
    import matplotlib
    import sklearn.datasets as skd

    mpl = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data"
    )
    imgs = skd.load_sample_images()
    china = imgs.images[0].astype(np.uint8)
    flower = imgs.images[1].astype(np.uint8)
    gh = cv2.imread(os.path.join(mpl, "grace_hopper.jpg"))[:, :, ::-1]
    dem = np.load(os.path.join(mpl, "jacksboro_fault_dem.npz"))["elevation"]
    dem8 = ((dem - dem.min()) / (np.ptp(dem) + 1e-9) * 255).astype(np.uint8)
    with gzip.open(os.path.join(mpl, "s1045.ima.gz")) as f:
        mri = np.frombuffer(f.read(), np.uint16).reshape(256, 256)
    mri8 = (mri / mri.max() * 255).astype(np.uint8)
    return {
        "china_left": china[:, :320],
        "china_right": china[:, 320:],
        "flower": flower,
        "hopper_face": gh[60:340, 100:480],
        "hopper_books": gh[0:220, 0:512],
        "hopper_lower": gh[340:600, 0:512],
        "dem_west": _gray3(dem8[:, :200]),
        "dem_east": _gray3(dem8[:, 203:]),
        "mri": _gray3(mri8),
    }


def _views(region):
    """Two overlapping views: ~10% viewpoint shift + brightness change."""
    import cv2

    H, W = region.shape[:2]
    ch, cw = int(H * 0.85), int(W * 0.85)
    a = region[:ch, :cw]
    dy, dx = int(H * 0.10), int(W * 0.10)
    b = np.clip(
        region[dy : dy + ch, dx : dx + cw].astype(np.int16) + 14, 0, 255
    ).astype(np.uint8)
    rs = lambda im: cv2.resize(im, (320, 240), interpolation=cv2.INTER_AREA)
    return rs(a), rs(b)


def test_multiscene_same_vs_cross_separation():
    from cerebro_tpu.models.mobilenet import load_ported_params, ported_forward

    params, meta = load_ported_params(ARTIFACT)
    sc = _scenes()
    names = list(sc)
    assert len(names) >= 8
    batch = []
    for n in names:
        batch.extend(_views(sc[n]))
    d = np.asarray(
        ported_forward(
            params, jnp.asarray(np.stack(batch).astype(np.uint8)),
            dtype=jnp.float32,
        )
    )
    S = d @ d.T
    n = len(names)
    same = np.array([S[2 * i, 2 * i + 1] for i in range(n)])
    cross = np.array(
        [
            S[r, c]
            for i in range(n)
            for j in range(i + 1, n)
            for (r, c) in (
                (2 * i, 2 * j),
                (2 * i, 2 * j + 1),
                (2 * i + 1, 2 * j),
                (2 * i + 1, 2 * j + 1),
            )
        ]
    )
    # distribution separation: every same-scene pair above the cross p95,
    # plus absolute floors/ceilings with margin over the measured values
    assert same.min() > np.percentile(cross, 95), (same.min(), cross)
    assert same.min() > 0.45, same
    assert cross.max() < 0.70, cross.max()
    assert same.mean() - cross.mean() > 0.45, (same.mean(), cross.mean())
