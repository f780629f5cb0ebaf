"""Steerable ring-Fourier patch descriptors: rotation/scale banks as matmuls.

The banked matcher in ops/features.py pays ~10 ms PER BANK on the chip for
per-keypoint bilinear gathers (measured, scripts/profile_verify_parts.py) —
14 banks make the scale-robust matcher 276 ms/pair. This module removes the
gathers from the banks entirely:

  * ONE contiguous superpatch extraction per keypoint (vmapped
    dynamic_slice — rows are contiguous, the TPU's fast path), per pyramid
    level;
  * descriptors = superpatch @ B, where B projects onto Gaussian annuli x
    angular harmonics e^{i m phi} (a steerable basis). One MXU matmul.
  * ROTATION acts on the coefficients as a per-harmonic phase:
    rot_rho(patch) -> c_{r,m} e^{-i m rho}. Orientation normalization and
    the +-15 deg offset banks of the GMS rotation sweep become elementwise
    complex multiplies — zero extra image sampling.
  * SCALE banks are alternate basis matrices B_f with dilated ring radii —
    extra matmuls on the SAME superpatch, not extra gathers.

Coefficients are stored as interleaved real/imag pairs; m=0 ring means are
dropped (patch-mean invariance) and the vector is L2-normalized (contrast
invariance), mirroring the normalized-patch descriptor's invariances.

Reference anchor: this plays the role of ORB's steered BRIEF + the GMS
rotation/scale sweeps (src/utils/PointFeatureMatching.cpp:21,
src/utils/GMSMatcher/gms_matcher.h:9-46) in MXU-shaped form.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

# superpatch half-extent in level pixels: must cover the outermost ring at
# the largest fractional spacing (7.2 * 2 * 1.5 = 21.6 < 24)
HALF = 24
S = 2 * HALF  # 48


@functools.lru_cache(maxsize=None)
def ring_basis(
    spacing: float,
    n_rad: int = 8,
    n_ang: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag basis matrices (S*S, n_rad*n_ang) for sampling spacing
    ``spacing`` (the role patch-grid spacing plays in the gather matcher:
    descriptor support = 16 samples * spacing). Host-side numpy: traced
    code treats them as constants."""
    o = np.arange(S, dtype=np.float64) - (S - 1) / 2.0
    gy, gx = np.meshgrid(o, o, indexing="ij")
    rad = np.hypot(gx, gy)
    phi = np.arctan2(gy, gx)
    # ring radii in pixels: r_j = spacing * linspace(1.2, 7.2, n_rad),
    # widths half the ring gap — the radial layout of the 16x16 grid's
    # support at this spacing
    rj = spacing * np.linspace(1.2, 7.2, n_rad)
    sigma = spacing * (7.2 - 1.2) / (n_rad - 1) / 2.0
    re = np.zeros((S * S, n_rad * n_ang), np.float64)
    im = np.zeros((S * S, n_rad * n_ang), np.float64)
    k = 0
    for j in range(n_rad):
        g = np.exp(-((rad - rj[j]) ** 2) / (2.0 * sigma**2))
        for m in range(n_ang):
            br = (g * np.cos(m * phi)).reshape(-1)
            bi = (g * np.sin(-m * phi)).reshape(-1)
            if m == 0:
                # zero-mean the m=0 rings: patch-mean invariance
                br = br - br.mean()
            n = np.sqrt((br**2 + bi**2).sum())
            re[:, k] = br / n
            im[:, k] = bi / n
            k += 1
    return re.astype(np.float32), im.astype(np.float32)


def extract_superpatches(img: jax.Array, xy: jax.Array) -> jax.Array:
    """(K, S, S) contiguous patches centered on integer coords (clamped at
    borders by dynamic_slice semantics)."""
    H, W = img.shape
    if H < S or W < S:  # tiny coarse pyramid levels: zero-pad to the patch
        img = jnp.pad(img, ((0, max(S - H, 0)), (0, max(S - W, 0))))
    yx0 = jnp.stack(
        [xy[:, 1].astype(jnp.int32) - HALF, xy[:, 0].astype(jnp.int32) - HALF],
        axis=-1,
    )

    def one(c):
        return jax.lax.dynamic_slice(img, (c[0], c[1]), (S, S))

    return jax.vmap(one)(yx0)


def features_from_superpatches(
    patches: jax.Array,  # (K, S, S)
    spacing: float,
    n_rad: int = 8,
    n_ang: int = 8,
) -> jax.Array:
    """(K, n_rad, n_ang, 2) normalized steerable coefficients."""
    re, im = ring_basis(spacing, n_rad, n_ang)
    flat = patches.reshape(patches.shape[0], S * S)
    cr = jnp.dot(flat, jnp.asarray(re), preferred_element_type=jnp.float32)
    ci = jnp.dot(flat, jnp.asarray(im), preferred_element_type=jnp.float32)
    c = jnp.stack([cr, ci], axis=-1).reshape(-1, n_rad, n_ang, 2)
    n = jnp.sqrt(jnp.sum(c * c, axis=(1, 2, 3), keepdims=True))
    return c / jnp.maximum(n, 1e-6)


def dominant_orientation(c: jax.Array) -> jax.Array:
    """(K,) patch orientation from the m=1 harmonics (the intensity-
    centroid analog): arg of the radially aggregated m=1 coefficient."""
    z = jnp.sum(c[:, :, 1, :], axis=1)  # (K, 2)
    return jnp.arctan2(z[:, 1], z[:, 0])


def steer(c: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotate the PATCH CONTENT by ``theta`` in coefficient space:
    c_{r,m} -> c_{r,m} e^{-i m theta}. theta scalar or (K,)."""
    m = jnp.arange(c.shape[2], dtype=jnp.float32)
    ang = -m[None, :] * jnp.reshape(theta, (-1, 1))  # (K, M)
    cos = jnp.cos(ang)[:, None, :, None]
    sin = jnp.sin(ang)[:, None, :, None]
    cr, ci = c[..., 0:1], c[..., 1:2]
    return jnp.concatenate(
        [cr * cos - ci * sin, cr * sin + ci * cos], axis=-1
    )


def score_matrix(ca: jax.Array, cb: jax.Array) -> jax.Array:
    """(Ka, Kb) Re<ca, cb> — cosine similarity of normalized coefficient
    vectors (one MXU matmul over the flattened real representation)."""
    a = ca.reshape(ca.shape[0], -1)
    b = cb.reshape(cb.shape[0], -1)
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)
