"""Chessboard corner detection — the calibration front-end.

Capability parity with camodocal's Chessboard.cc (reference
src/utils/camodocal/src/chessboard/Chessboard.cc, ~2 kLoC of OpenCV
region-growing C++): given an image and the inner-corner pattern size,
return the subpixel corner grid in row-major order, ready for
``calibration.calibrate_planar``.

TPU-first design: the per-pixel work (smoothing, corner response, NMS,
subpixel refinement) is one jitted program of static-shape convolutions
and top-k — no region growing, no data-dependent loops. A chessboard
corner is a *saddle* of intensity: on a small ring around it the image
alternates dark/light twice per revolution. Projecting ring samples onto
the 2nd angular harmonic measures exactly that; the 1st harmonic measures
a straight edge. The response

    R = min_over_radii ( |2nd harmonic| - |1st harmonic| )

is high only at X-junctions, at any corner orientation (the harmonic
magnitude is rotation-invariant). Grid ordering is cheap host-side
geometry: fit a homography from the unit grid to the 4 extremal
candidates, greedily match predictions to candidates, refit, iterate.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry.calibration import estimate_homography

# Ring radii (px). Two scales: a corner must look like a saddle on both.
RING_RADII = (3, 5)
N_RING = 16


def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _blur(img: jax.Array, sigma: float = 1.2) -> jax.Array:
    """Separable Gaussian blur via depthwise conv (static shapes)."""
    r = int(3 * sigma + 0.5)
    k = jnp.asarray(_gaussian_kernel(sigma, r))
    x = img[None, :, :, None]  # NHWC
    kx = k.reshape(1, -1, 1, 1)
    ky = k.reshape(-1, 1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn)
    return x[0, :, :, 0]


def corner_response(img: jax.Array) -> jax.Array:
    """(H, W) float image -> (H, W) chessboard-corner response."""
    g = _blur(img.astype(jnp.float32))
    resp = None
    for radius in RING_RADII:
        ang = 2.0 * np.pi * np.arange(N_RING) / N_RING
        dy = np.round(radius * np.sin(ang)).astype(int)
        dx = np.round(radius * np.cos(ang)).astype(int)
        a1 = jnp.zeros_like(g)
        b1 = jnp.zeros_like(g)
        a2 = jnp.zeros_like(g)
        b2 = jnp.zeros_like(g)
        mean = jnp.zeros_like(g)
        for i in range(N_RING):
            s = jnp.roll(g, (-dy[i], -dx[i]), axis=(0, 1))
            mean = mean + s
            a1 = a1 + s * np.cos(ang[i])
            b1 = b1 + s * np.sin(ang[i])
            a2 = a2 + s * np.cos(2 * ang[i])
            b2 = b2 + s * np.sin(2 * ang[i])
        saddle = jnp.sqrt(a2 * a2 + b2 * b2)
        edge = jnp.sqrt(a1 * a1 + b1 * b1)
        r = saddle - edge
        resp = r if resp is None else jnp.minimum(resp, r)
    return resp


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius"))
def find_corner_candidates(
    img: jax.Array, max_corners: int, nms_radius: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Detect up to max_corners saddle points.

    Returns (uv (max_corners, 2) float subpixel, score (max_corners,));
    slots past the real detections carry score <= 0.
    """
    H, W = img.shape
    resp = corner_response(img)

    # exclude image border (ring + blur support)
    m = max(RING_RADII) + 4
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    border = (row < m) | (row >= H - m) | (col < m) | (col >= W - m)
    resp = jnp.where(border, -jnp.inf, resp)

    # NMS: keep strict local maxima of a (2r+1)^2 window
    k = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    is_peak = (resp >= pooled) & jnp.isfinite(resp)
    flat = jnp.where(is_peak, resp, -jnp.inf).reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    py = idx // W
    px = idx % W

    # subpixel: quadratic fit of the response surface around each peak
    def refine(y, x, ok):
        nb = jax.lax.dynamic_slice(resp, (y - 1, x - 1), (3, 3))
        gx = 0.5 * (nb[1, 2] - nb[1, 0])
        gy = 0.5 * (nb[2, 1] - nb[0, 1])
        hxx = nb[1, 2] - 2.0 * nb[1, 1] + nb[1, 0]
        hyy = nb[2, 1] - 2.0 * nb[1, 1] + nb[0, 1]
        hxy = 0.25 * (nb[2, 2] - nb[2, 0] - nb[0, 2] + nb[0, 0])
        det = hxx * hyy - hxy * hxy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        ox = -(hyy * gx - hxy * gy) / det
        oy = -(hxx * gy - hxy * gx) / det
        ox = jnp.clip(ox, -1.0, 1.0)
        oy = jnp.clip(oy, -1.0, 1.0)
        ox = jnp.where(ok, ox, 0.0)
        oy = jnp.where(ok, oy, 0.0)
        return jnp.stack([x + ox, y + oy])

    ok = jnp.isfinite(score)
    safe_y = jnp.clip(py, 1, H - 2)
    safe_x = jnp.clip(px, 1, W - 2)
    uv = jax.vmap(refine)(safe_y, safe_x, ok)
    score = jnp.where(ok, score, 0.0)
    return uv, score


# ---------------------------------------------------------------------------
# Grid ordering (host side — tiny geometry, data-dependent control flow)
# ---------------------------------------------------------------------------


def _apply_h(Hm: np.ndarray, pts: np.ndarray) -> np.ndarray:
    p = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ Hm.T
    return p[:, :2] / p[:, 2:3]


def _greedy_match(pred: np.ndarray, cand: np.ndarray) -> Tuple[np.ndarray, float]:
    """Uniquely match each predicted grid node to a candidate (greedy global
    min-distance). Returns (candidate index per node, total cost)."""
    n, m = len(pred), len(cand)
    d = np.linalg.norm(pred[:, None, :] - cand[None, :, :], axis=-1)
    assign = np.full(n, -1, dtype=int)
    used = np.zeros(m, dtype=bool)
    cost = 0.0
    dd = d.copy()
    for _ in range(n):
        i, j = np.unravel_index(np.argmin(dd), dd.shape)
        assign[i] = j
        cost += d[i, j]
        dd[i, :] = np.inf
        dd[:, j] = np.inf
        used[j] = True
    return assign, cost


def order_grid(
    cand_uv: np.ndarray,  # (M, 2) candidate corners (M >= rows*cols)
    pattern_size: Tuple[int, int],  # (rows, cols) inner corners
) -> Tuple[np.ndarray, bool]:
    """Order candidates into a (rows*cols, 2) row-major grid via iterative
    homography fitting. Returns (ordered corners, success)."""
    rows, cols = pattern_size
    n = rows * cols
    if len(cand_uv) < n:
        return np.zeros((n, 2), np.float32), False

    unit = np.stack(
        np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64)),
        axis=-1,
    ).reshape(-1, 2)  # (n, 2) as (x=col, y=row), row-major

    # 4 extremal candidates (±x ± y) as the grid's outer corners
    s, dif = cand_uv.sum(axis=1), cand_uv[:, 0] - cand_uv[:, 1]
    quad = np.array(
        [
            cand_uv[np.argmin(s)],  # top-left-ish
            cand_uv[np.argmax(dif)],  # top-right-ish
            cand_uv[np.argmax(s)],  # bottom-right-ish
            cand_uv[np.argmin(dif)],  # bottom-left-ish
        ]
    )
    unit_quad = np.array(
        [[0.0, 0.0], [cols - 1.0, 0.0], [cols - 1.0, rows - 1.0], [0.0, rows - 1.0]]
    )

    best = None
    for rot in range(4):
        q = np.roll(quad, -rot, axis=0)
        Hm = np.asarray(
            estimate_homography(jnp.asarray(unit_quad), jnp.asarray(q)),
            dtype=np.float64,
        )
        if not np.isfinite(Hm).all():
            continue
        assign, cost = None, np.inf
        for _ in range(3):
            pred = _apply_h(Hm, unit)
            assign, cost = _greedy_match(pred, cand_uv)
            Hm2 = np.asarray(
                estimate_homography(jnp.asarray(unit), jnp.asarray(cand_uv[assign])),
                dtype=np.float64,
            )
            if not np.isfinite(Hm2).all():
                break
            Hm = Hm2
        if assign is not None and cost < (best[1] if best else np.inf):
            best = (assign, cost, Hm)

    if best is None:
        return np.zeros((n, 2), np.float32), False
    assign, cost, Hm = best

    # validity: residual per node must be small vs the grid pitch
    pred = _apply_h(Hm, unit)
    res = np.linalg.norm(pred - cand_uv[assign], axis=-1)
    pitch = np.median(
        np.linalg.norm(np.diff(pred.reshape(rows, cols, 2), axis=1), axis=-1)
    )
    ok = bool(len(set(assign.tolist())) == n and (res < 0.3 * pitch).all())
    return cand_uv[assign].astype(np.float32), ok


def detect_chessboard(
    img: np.ndarray, pattern_size: Tuple[int, int], candidate_slack: int = 8
) -> Tuple[np.ndarray, bool]:
    """Image -> ordered subpixel inner-corner grid.

    Returns (corners (rows*cols, 2) float32 row-major, found). The device
    does detection + refinement in one jitted program; ordering is host
    geometry.
    """
    rows, cols = pattern_size
    n = rows * cols
    uv, score = find_corner_candidates(jnp.asarray(img, jnp.float32), n + candidate_slack)
    uv, score = np.asarray(uv), np.asarray(score)
    # keep candidates within an order of magnitude of the strongest
    keep = score > 0.25 * score.max() if score.max() > 0 else score > 0
    cand = uv[keep]
    return order_grid(cand, pattern_size)


def board_points(pattern_size: Tuple[int, int], square: float = 1.0) -> np.ndarray:
    """Planar board coordinates matching detect_chessboard's row-major
    ordering (x=col*square, y=row*square) — feed to calibrate_planar."""
    rows, cols = pattern_size
    g = np.stack(
        np.meshgrid(np.arange(cols, dtype=np.float32), np.arange(rows, dtype=np.float32)),
        axis=-1,
    ).reshape(-1, 2)
    return g * square
