"""Weighted Umeyama 3D-3D rigid alignment (closed form, vmap-able).

Behavioral equivalent of the reference's
``AlignPointCloudsUmeyama(WithRansac)`` (src/DlsPnpWithRansac.h:117-166 and
theia's implementation it wraps): find R, t minimizing
sum_i w_i || q_i - (R p_i + t) ||^2. We compute the weighted closed form
(Kabsch/Umeyama without scale — the reference's ransac variant checks scale
sanity ``min(s,1/s)>0.9`` then uses rigid; we solve rigid directly and
report the residual scale for the same sanity gate).

Masked points carry weight 0, so fixed-shape batches of variable-size
correspondence sets vmap cleanly (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.geometry import se3


def umeyama_rigid(
    src: jax.Array,  # (N, 3) points in frame A
    dst: jax.Array,  # (N, 3) points in frame B
    w: jax.Array,  # (N,) nonneg weights (0 = masked out)
) -> Tuple[jax.Array, jax.Array]:
    """Return (b_T_a (4,4), scale_estimate ()). dst ~= R @ src + t."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum
    mu_s = jnp.sum(wn[:, None] * src, axis=0)
    mu_d = jnp.sum(wn[:, None] * dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    # covariance (3,3): sum_i w_i dc_i sc_i^T
    H = jnp.einsum("n,ni,nj->ij", wn, dc, sc)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    # proper-rotation correction: flip the smallest singular direction if
    # det(UV^T) < 0
    diag = jnp.stack([jnp.ones(()), jnp.ones(()), d])
    D = jnp.diag(diag)
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    # residual scale estimate (for the reference's sanity check)
    var_s = jnp.maximum(jnp.sum(wn * jnp.sum(sc * sc, axis=-1)), 1e-12)
    scale = jnp.sum(S * diag) / var_s
    return se3.make_pose(R, t), scale


def alignment_error(T: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    """Per-point Euclidean residual ||dst - T*src|| — the RANSAC inlier
    metric for 3D-3D (ref error thresh 0.1 m, src/DlsPnpWithRansac.cpp:88)."""
    pred = src @ T[..., :3, :3].swapaxes(-1, -2) + T[..., None, :3, 3]
    return jnp.linalg.norm(dst - pred, axis=-1)
