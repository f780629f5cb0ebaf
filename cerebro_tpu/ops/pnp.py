"""Perspective-n-Point solvers as fixed-shape, vmap-able kernels.

The reference wraps theia's DLS-PnP in RANSAC (``DlsPnpWithRansac``,
src/DlsPnpWithRansac.h:42-100) and falls back to a 4-DOF ceres solve
(src/DlsPnpWithRansac.cpp:253-398). TPU-native design: a weighted DLT
(direct linear transform) minimal/least-squares solver — one 12x12
symmetric eigendecomposition per hypothesis, batched with vmap so hundreds
of RANSAC hypotheses solve as one kernel — followed by a fixed-iteration
Gauss-Newton polish on inlier sets (the ceres-equivalent, but batched and
branch-free).

All functions take a weight vector; masked correspondences get weight 0, so
variable-size match sets ride fixed-shape arrays (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.geometry import se3


def _build_dlt_rows(X: jax.Array, x: jax.Array) -> jax.Array:
    """DLT rows for P = [R|t]: for each 3D point X and normalized image
    point x=(u,v): two rows of A @ vec(P) = 0."""
    n = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=-1)  # (N,4)
    z = jnp.zeros_like(Xh)
    u = x[:, 0:1]
    v = x[:, 1:2]
    r1 = jnp.concatenate([Xh, z, -u * Xh], axis=-1)  # (N,12)
    r2 = jnp.concatenate([z, Xh, -v * Xh], axis=-1)
    return jnp.stack([r1, r2], axis=1).reshape(2 * n, 12)


def _spd_inverse(A: jax.Array, n: int) -> jax.Array:
    """(n, n) SPD inverse via Gauss-Jordan without pivoting (SPD needs
    none) — pure VPU mul-adds that batch perfectly under vmap, unlike the
    LAPACK-style eigh/solve custom calls (measured ~2 ms for 128 batched
    12x12 eigh on a v5e; this is noise)."""
    Inv = jnp.eye(n, dtype=A.dtype)

    def body(carry, ek):
        A, Inv = carry
        pivot = jnp.einsum("i,ij,j->", ek, A, ek)
        arow = jnp.einsum("i,ij->j", ek, A) / pivot
        irow = jnp.einsum("i,ij->j", ek, Inv) / pivot
        col = jnp.einsum("ij,j->i", A, ek)
        A = A - col[:, None] * arow[None, :] + ek[:, None] * arow[None, :]
        Inv = Inv - col[:, None] * irow[None, :] + ek[:, None] * irow[None, :]
        return (A, Inv), None

    (A, Inv), _ = jax.lax.scan(body, (A, Inv), jnp.eye(n, dtype=A.dtype))
    return Inv


def _smallest_eigvec_iter(M: jax.Array, n: int = 12, iters: int = 6) -> jax.Array:
    """Near-null eigenvector of SPD M by inverse iteration with an explicit
    SPD inverse. The DLT normal matrix has lambda_min ~ 0 against a real
    spectrum, so convergence (lambda_min/lambda_2)^iters is immediate."""
    eps = 1e-7 * jnp.trace(M) / n + 1e-20
    Ainv = _spd_inverse(M + eps * jnp.eye(n, dtype=M.dtype), n)

    def body(v, _):
        w = Ainv @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-20), None

    v0 = jnp.ones((n,), M.dtype) / jnp.sqrt(float(n))
    v, _ = jax.lax.scan(body, v0, None, length=iters)
    return v


def _inv3(X: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = X[0, 0], X[0, 1], X[0, 2]
    d, e, f = X[1, 0], X[1, 1], X[1, 2]
    g, h, i = X[2, 0], X[2, 1], X[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.array([[A, B, C], [D, E, F], [G, H, I]], X.dtype)
    return adj / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)


def _polar_rotation(Rraw: jax.Array, iters: int = 8):
    """Orthogonal polar factor of a 3x3 by Newton iteration
    X <- (X + X^{-T})/2 — closed-form 3x3 inverses only, no svd custom
    call. Returns (R, scale) with scale = mean singular value. A
    reflection input (det < 0) converges to an orthogonal matrix with
    det -1; callers treat those hypotheses as degenerate (RANSAC scores
    them out)."""
    nf = jnp.sqrt(jnp.sum(Rraw * Rraw) / 3.0)
    X = Rraw / jnp.maximum(nf, 1e-20)

    def body(X, _):
        return 0.5 * (X + _inv3(X).T), None

    R, _ = jax.lax.scan(body, X, None, length=iters)
    scale = jnp.trace(R.T @ Rraw) / 3.0
    return R, scale


def pnp_dlt(
    X: jax.Array,  # (N, 3) 3D points in frame A
    x: jax.Array,  # (N, 2) normalized image coords in frame B
    w: jax.Array,  # (N,) weights, 0 = masked
    exact: bool = True,
) -> jax.Array:
    """Weighted DLT PnP: returns b_T_a (4,4) with x ~ project(R X + t).

    Hartley-normalize both point sets (without it, the weak depth-relief
    direction of A^T A sits at the float32 noise floor and eigh returns a
    polluted null vector — real failure observed on low-relief scenes),
    solve min ||W A p|| s.t. ||p||=1 via the smallest eigenvector of
    A^T W A (12x12 — eigh batches beautifully under vmap), un-normalize,
    then project the 3x3 block onto SO(3) and fix scale/sign by cheirality
    (weighted mean depth positive).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum

    # --- Hartley normalization ---
    c3 = jnp.sum(wn[:, None] * X, axis=0)  # 3D centroid
    d3 = jnp.sum(wn * jnp.linalg.norm(X - c3, axis=-1))
    s3 = jnp.sqrt(3.0) / jnp.maximum(d3, 1e-9)
    Xn = (X - c3) * s3

    c2 = jnp.sum(wn[:, None] * x, axis=0)
    d2 = jnp.sum(wn * jnp.linalg.norm(x - c2, axis=-1))
    s2 = jnp.sqrt(2.0) / jnp.maximum(d2, 1e-9)
    xn = (x - c2) * s2

    A = _build_dlt_rows(Xn, xn)  # (2N, 12)
    ww = jnp.repeat(w, 2)
    M = (A * ww[:, None]).T @ A  # (12, 12)
    if exact:
        _, vecs = jnp.linalg.eigh(M)
        p = vecs[:, 0]  # smallest eigenvalue
    else:
        # RANSAC hypothesis path: inverse iteration beats the batched
        # LAPACK-style eigh custom call under vmap
        p = _smallest_eigvec_iter(M)
    Pn = p.reshape(3, 4)

    # un-normalize: x_hat = s2 (x - c2), X_hat = s3 (X - c3)
    # => P = T2^{-1} Pn T3 with T2 = [[s2,0,-s2 c2],[0,s2,..],[0,0,1]]
    z = jnp.zeros(())
    o = jnp.ones(())
    inv_s2 = 1.0 / s2
    T2inv = jnp.stack(
        [
            jnp.stack([inv_s2, z, c2[0]]),
            jnp.stack([z, inv_s2, c2[1]]),
            jnp.stack([z, z, o]),
        ]
    )
    T3 = jnp.eye(4).at[:3, :3].multiply(s3).at[:3, 3].set(-s3 * c3)
    P = T2inv @ Pn @ T3
    Rraw, t_raw = P[:, :3], P[:, 3]

    # scale + sign: mean cheirality over weighted points
    depths = (X @ Rraw.T + t_raw)[:, 2]
    sign = jnp.sign(jnp.sum(w * depths) + 1e-12)
    Rraw = Rraw * sign
    t_raw = t_raw * sign

    # Project to SO(3): R = U V^T, scale = mean(S)
    if exact:
        U, S, Vt = jnp.linalg.svd(Rraw)
        d = jnp.sign(jnp.linalg.det(U @ Vt))
        diag = jnp.stack([jnp.ones(()), jnp.ones(()), d])
        R = U @ jnp.diag(diag) @ Vt
        scale = jnp.sum(S * diag) / 3.0
    else:
        R, scale = _polar_rotation(Rraw)
        # a reflection (det<0) is a degenerate hypothesis: poison the pose
        # so RANSAC's finite/inlier guards drop it
        bad = jnp.linalg.det(R) < 0.0
        R = jnp.where(bad, jnp.full_like(R, jnp.nan), R)
    t = t_raw / jnp.maximum(scale, 1e-12)
    return se3.make_pose(R, t)


def reprojection_error(
    T: jax.Array,  # (4,4) b_T_a
    X: jax.Array,  # (N,3) points in A
    x: jax.Array,  # (N,2) normalized coords in B
) -> jax.Array:
    """Per-point L1 reprojection error in normalized coords — the
    reference's RANSAC error metric (thresh 0.03,
    src/DlsPnpWithRansac.h:79-87 reprojection L1 + :206-212)."""
    Pc = X @ T[:3, :3].T + T[:3, 3]
    z = jnp.where(jnp.abs(Pc[:, 2]) < 1e-6, 1e-6, Pc[:, 2])
    proj = Pc[:, :2] / z[:, None]
    err = jnp.sum(jnp.abs(proj - x), axis=-1)
    # points behind the camera can never be inliers
    return jnp.where(Pc[:, 2] > 0, err, 1e6)


def pnp_refine_gn(
    T0: jax.Array,  # (4,4) initial pose
    X: jax.Array,
    x: jax.Array,
    w: jax.Array,
    iters: int = 5,
    damping: float = 1e-6,
) -> jax.Array:
    """Fixed-iteration damped Gauss-Newton polish on se(3), weighted —
    the batched replacement for the reference's ceres refinement
    (src/DlsPnpWithRansac.cpp:253-340). Huber-free: weights already encode
    inlier selection."""

    def residual(xi, T_base):
        T = se3.se3_exp(xi) @ T_base
        Pc = X @ T[:3, :3].T + T[:3, 3]
        z = jnp.where(jnp.abs(Pc[:, 2]) < 1e-6, 1e-6, Pc[:, 2])
        proj = Pc[:, :2] / z[:, None]
        return ((proj - x) * w[:, None]).reshape(-1)

    def body(_, T):
        xi0 = jnp.zeros(6, T.dtype)
        J = jax.jacfwd(residual)(xi0, T)  # (2N, 6)
        r = residual(xi0, T)
        H = J.T @ J + damping * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        dx = -jnp.linalg.solve(H, g)
        return se3.se3_exp(dx) @ T

    return jax.lax.fori_loop(0, iters, body, T0)
