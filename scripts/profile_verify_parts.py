#!/usr/bin/env python
"""Micro-profile of verify-stage internals on the current backend.

Used to direct kernel optimization (speed-of-light audit): times each
sub-op of the verification path in isolation with compile excluded.
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def t(fn, *args, n=10, label=""):
    import jax

    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.geometry import stereo
    from cerebro_tpu.ops import features

    rng = np.random.default_rng(0)
    world = sw.CircuitWorld.create(seed=0)
    ren = sw.Renderer(world)
    rig = ren.rig()
    la, ra = ren.stereo(0.0, 0.0)
    lb, _ = ren.stereo(0.1, 0.05)
    ja, jra, jb = (jnp.asarray(x, jnp.float32) for x in (la, ra, lb))

    # --- stereo ---
    from cerebro_tpu.ops.stereo_pallas import block_match_pallas

    t(jax.jit(lambda l, r: block_match_pallas(l, r, num_disp=64, block=21)),
      ja, jra, label="stereo pallas block_match")
    t(jax.jit(lambda l, r: stereo.block_match(l, r, num_disp=64, block=21)),
      ja, jra, label="stereo XLA block_match")

    # --- matching sub-ops (K=1024) ---
    K = 1024
    ka = features.harris_corners(ja, max_kp=K)
    sa = features._box_filter(ja, 5) / 25.0
    theta = features.keypoint_orientations(sa, ka.xy)
    t(jax.jit(lambda img: features.harris_corners(img, max_kp=K)), ja,
      label="harris_corners")
    t(jax.jit(lambda img: features.patch_descriptors(img, ka, oriented=False)),
      sa, label="patch_descriptors plain (int grid)")
    t(jax.jit(lambda img: features.patch_descriptors(
        img, ka, oriented=True, theta=theta)), sa,
      label="patch_descriptors oriented (bilinear gather)")
    t(jax.jit(lambda img: features.keypoint_orientations(img, ka.xy)), sa,
      label="keypoint_orientations")
    da = features.patch_descriptors(sa, ka, oriented=True, theta=theta)
    db = jnp.stack([da] * 12)
    t(jax.jit(lambda a, b: jnp.max(
        jnp.einsum("ad,obd->oab", a, b, preferred_element_type=jnp.float32), 0)),
      da, db, label="12-bank einsum + max")

    # --- ransac sub-ops (H=128 hypotheses) ---
    H = 128
    M = jnp.asarray(rng.standard_normal((H, 12, 12)).astype(np.float32))
    M = jnp.einsum("hij,hkj->hik", M, M)  # PSD batch
    t(jax.jit(jax.vmap(jnp.linalg.eigh)), M, label="vmap eigh 12x12 x128")
    R3 = jnp.asarray(rng.standard_normal((H, 3, 3)).astype(np.float32))
    t(jax.jit(jax.vmap(jnp.linalg.svd)), R3, label="vmap svd 3x3 x128")

    from cerebro_tpu.ops import pnp, ransac

    X = jnp.asarray(rng.standard_normal((K, 3)).astype(np.float32)
                    + np.array([0, 0, 5], np.float32))
    x2 = X[:, :2] / X[:, 2:3]
    valid = jnp.ones((K,), bool)
    key = jax.random.PRNGKey(0)
    t(jax.jit(lambda k: ransac._sample_indices(k, K, valid, H, 4)), key,
      label="gumbel top-k sampling")
    idx = ransac._sample_indices(key, K, valid, H, 4)
    sample_w = jnp.ones((H, 4), jnp.float32)
    t(jax.jit(lambda i: jax.vmap(pnp.pnp_dlt)(X[i], x2[i], sample_w)), idx,
      label="vmap pnp_dlt x128 (eigh+svd inside)")
    Ts = jax.vmap(pnp.pnp_dlt)(X[idx], x2[idx], sample_w)
    t(jax.jit(lambda T: jax.vmap(lambda TT: pnp.reprojection_error(TT, X, x2))(T)),
      Ts, label="vmap reprojection errors 128xN")
    T0 = Ts[0]
    t(jax.jit(lambda T: pnp.pnp_refine_gn(T, X, x2, valid.astype(jnp.float32))),
      T0, label="pnp_refine_gn (5 iters, jacfwd)")


if __name__ == "__main__":
    main()
