"""Pallas fused block matcher vs the XLA reference implementation
(interpret mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import stereo
from cerebro_tpu.ops.stereo_pallas import block_match_pallas

from test_stereo import textured


def test_pallas_matches_xla_constant_disparity(rng):
    h, w, d_true = 96, 256, 12
    base = textured(rng, h, w + d_true)
    left = jnp.asarray(base[:, :-d_true])
    right = jnp.asarray(base[:, d_true:])

    disp_p, valid_p = block_match_pallas(left, right, num_disp=32, block=11)
    disp_x, valid_x = stereo.block_match(left, right, num_disp=32, block=11)

    vp = np.asarray(valid_p)
    vx = np.asarray(valid_x)
    assert vp.sum() > 0.3 * vp.size
    # recovered disparity is correct where both agree valid
    both = vp & vx
    err = np.abs(np.asarray(disp_p)[both] - d_true)
    assert np.median(err) < 0.5
    # pallas and XLA disparities agree closely on jointly-valid pixels
    dd = np.abs(np.asarray(disp_p)[both] - np.asarray(disp_x)[both])
    assert np.percentile(dd, 95) <= 1.0, f"p95 disagreement {np.percentile(dd, 95)}"
    # validity masks mostly coincide (border/cumsum padding differs slightly)
    agree = (vp == vx).mean()
    assert agree > 0.9, f"validity agreement {agree:.3f}"


def test_pallas_two_planes(rng):
    h, w = 96, 256
    d1, d2 = 6, 20
    base = textured(rng, h, w + 32)
    left = base[:, :w]
    right = np.zeros_like(left)
    right[: h // 2] = base[: h // 2, d1 : d1 + w]
    right[h // 2 :] = base[h // 2 :, d2 : d2 + w]
    disp, valid = block_match_pallas(
        jnp.asarray(left), jnp.asarray(right), num_disp=32, block=11
    )
    v = np.asarray(valid)
    dd = np.asarray(disp)
    top = dd[: h // 2 - 8][v[: h // 2 - 8]]
    bot = dd[h // 2 + 8 :][v[h // 2 + 8 :]]
    assert abs(np.median(top) - d1) < 0.5
    assert abs(np.median(bot) - d2) < 0.5


def test_block_match_vmap_matches_loop(rng):
    """vmap(block_match_pallas) dispatches to the batch-grid kernel (a
    vmapped ANY-space pallas call cannot lower on TPU) and must equal the
    per-example results."""
    import jax

    def synth_pair(r, d_true):
        base = textured(r, 96, 256 + d_true)
        return jnp.asarray(base[:, :-d_true]), jnp.asarray(base[:, d_true:])

    pairs = [synth_pair(np.random.default_rng(s), 8 + 2 * s) for s in (0, 1, 2)]
    L = jnp.stack([p[0] for p in pairs])
    R = jnp.stack([p[1] for p in pairs])
    vd, vv = jax.vmap(
        lambda l, r: block_match_pallas(l, r, num_disp=32, block=11)
    )(L, R)
    for k in range(3):
        d, v = block_match_pallas(L[k], R[k], num_disp=32, block=11)
        np.testing.assert_allclose(np.asarray(vd[k]), np.asarray(d), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(vv[k]), np.asarray(v))
