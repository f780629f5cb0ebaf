"""Golden-descriptor stability: saved maps must stay loadable and
matchable across code changes (SURVEY.md §4: golden fixtures).

The gist descriptor is deterministic; if its output drifts, every saved
teach-and-repeat map silently stops matching. This test pins the output on
fixed inputs; regenerate the fixture ONLY with a deliberate map-format
bump (see io/state.py format_version).
"""

import os

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.models.gist import gist_descriptors

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_gist.npz")


def fixed_images():
    rng = np.random.default_rng(20260817)
    return rng.integers(0, 255, size=(4, 240, 320, 1), dtype=np.uint8)


def test_gist_descriptors_match_golden():
    imgs = fixed_images()
    d = np.asarray(gist_descriptors(jnp.asarray(imgs), dim=256))
    if not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, descriptors=d)
    golden = np.load(FIXTURE)["descriptors"]
    # tolerance: backend-dependent float accumulation only
    np.testing.assert_allclose(d, golden, atol=1e-4)
    # cross-similarity structure pinned as well
    s = d @ golden.T
    np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-4)
