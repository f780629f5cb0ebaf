"""Learned keypoint detector + descriptor (the SuperPoint-class model).

The reference vendors MagicLeap's SuperPoint as an exploratory alternative
to ORB+GMS matching (scripts/unittest/demo_superpoint.py,
rtry_superpoint.py — PyTorch, never wired into the node). Here the same
capability is a first-class TPU model: a small shared conv encoder with a
cell-softmax detector head (8x8 cells + dustbin, SuperPoint's decoding
scheme) and a coarse descriptor head sampled bilinearly at keypoints.

TPU-first: every stage is a static-shape jitted program — convs in bf16 on
the MXU, cell softmax -> full-res heatmap via reshape (no interpolation),
max-pool NMS + top-k selection, one gather for descriptor sampling. The
detector plugs into the existing matching stack (`ops.features.Matches`,
mutual-NN + GMS) as a drop-in alternative to Harris + patch projection.

Training is self-supervised on synthetic geometry (the "Synthetic Shapes"
stage of the SuperPoint recipe): random polygons/checkers/lines with known
corner locations supervise the detector; random homography pairs with an
InfoNCE loss over corresponding cells supervise the descriptor. See
``synthetic_corner_batch`` and ``train_step`` below; no external data.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.ops.features import Keypoints

CELL = 8  # detector cell size (SuperPoint's /8 grid)


class _Block(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=jnp.float32)(x)
        return nn.relu(x)


class KeypointNet(nn.Module):
    """Shared encoder (/8) + detector head (65ch) + descriptor head (D)."""

    desc_dim: int = 128
    width: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """img (B, H, W, 1) in [-1, 1] -> (logits (B, H/8, W/8, 65),
        desc (B, H/8, W/8, D) L2-normalized)."""
        w = self.width
        x = _Block(w, dtype=self.dtype)(img)
        x = _Block(w, stride=2, dtype=self.dtype)(x)      # /2
        x = _Block(2 * w, dtype=self.dtype)(x)
        x = _Block(2 * w, stride=2, dtype=self.dtype)(x)  # /4
        x = _Block(4 * w, dtype=self.dtype)(x)
        x = _Block(4 * w, stride=2, dtype=self.dtype)(x)  # /8
        x = _Block(4 * w, dtype=self.dtype)(x)

        logits = nn.Conv(CELL * CELL + 1, (1, 1), dtype=self.dtype)(x)
        d = nn.Conv(self.desc_dim, (1, 1), dtype=self.dtype)(x)
        d = d.astype(jnp.float32)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return logits.astype(jnp.float32), d


def create_keypoint_model(desc_dim: int = 128, width: int = 32, seed: int = 0):
    net = KeypointNet(desc_dim=desc_dim, width=width)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 1), jnp.float32)
    )
    return net, params


def heatmap_from_logits(logits: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 65) cell logits -> (B, Hc*8, Wc*8) probability heatmap.
    Softmax over the 65 bins, drop the dustbin, unpack 64 -> 8x8 pixels."""
    p = jax.nn.softmax(logits, axis=-1)[..., :-1]  # (B, Hc, Wc, 64)
    B, Hc, Wc, _ = p.shape
    p = p.reshape(B, Hc, Wc, CELL, CELL)
    p = jnp.transpose(p, (0, 1, 3, 2, 4))  # (B, Hc, 8, Wc, 8)
    return p.reshape(B, Hc * CELL, Wc * CELL)


@functools.partial(jax.jit, static_argnames=("net", "max_kp", "nms_radius", "border"))
def detect_keypoints(
    net: KeypointNet,
    params,
    img: jax.Array,  # (H, W) float32 grayscale in [0, 1]
    max_kp: int = 512,
    nms_radius: int = 4,
    border: int = 16,
    min_prob: float = 0.015,
) -> Tuple[Keypoints, jax.Array]:
    """One image -> (Keypoints, descriptors (max_kp, D)).

    Full-res heatmap -> max-pool NMS -> top-k; descriptors sampled
    bilinearly from the coarse map at keypoint locations.
    """
    H, W = img.shape
    x = (img * 2.0 - 1.0)[None, :, :, None]
    logits, dmap = net.apply(params, x)
    heat = heatmap_from_logits(logits)[0]  # (H', W') where H' = Hc*8 <= H
    heat = heat[:H, :W]

    size = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )
    is_max = heat >= pooled
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inside = (row >= border) & (row < H - border) & (col >= border) & (col < W - border)
    masked = jnp.where(is_max & inside, heat, -jnp.inf)
    score, idx = jax.lax.top_k(masked.reshape(-1), max_kp)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = score > min_prob
    kps = Keypoints(xy=jnp.stack([xs, ys], axis=-1), score=score, valid=valid)

    desc = _sample_desc(dmap[0], kps.xy)
    return kps, desc


def _sample_desc(dmap: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear sample (Hc, Wc, D) coarse map at pixel coords (K, 2)."""
    Hc, Wc, _ = dmap.shape
    # cell-center convention: pixel p lies in cell p/8; centers at +0.5
    cx = jnp.clip(xy[:, 0] / CELL - 0.5, 0.0, Wc - 1.0)
    cy = jnp.clip(xy[:, 1] / CELL - 0.5, 0.0, Hc - 1.0)
    x0 = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, Wc - 1)
    y1 = jnp.minimum(y0 + 1, Hc - 1)
    fx = (cx - x0)[:, None]
    fy = (cy - y0)[:, None]
    d = (
        dmap[y0, x0] * (1 - fx) * (1 - fy)
        + dmap[y0, x1] * fx * (1 - fy)
        + dmap[y1, x0] * (1 - fx) * fy
        + dmap[y1, x1] * fx * fy
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


# ---------------------------------------------------------------------------
# Matching integration: drop-in alternative to ops.features.match_image_pair
# ---------------------------------------------------------------------------


def match_image_pair_learned(
    net: KeypointNet,
    params,
    img_a: jax.Array,  # (H, W) float32 in [0, 1]
    img_b: jax.Array,
    max_kp: int = 512,
    gms_factor: float | None = None,
    min_score: float = 0.6,
):
    """Learned corners + learned descriptors -> mutual NN (-> optional GMS).
    Same `Matches` contract as ops.features.match_image_pair.

    GMS is off by default: grid motion statistics needs the dense
    thousands-of-ORB-matches regime to accumulate cell support; learned
    descriptors are discriminative enough that mutual-NN + the downstream
    RANSAC verification (ops/ransac.py) is the right filter, matching how
    the reference's SuperPoint experiment pairs its point tracker with pose
    RANSAC rather than GMS (scripts/unittest/rtry_superpoint.py)."""
    from cerebro_tpu.ops.features import gms_filter, mutual_nn_match

    ka, da = detect_keypoints(net, params, img_a, max_kp=max_kp)
    kb, db = detect_keypoints(net, params, img_b, max_kp=max_kp)
    m = mutual_nn_match(da, db, ka, kb, min_score=min_score)
    if gms_factor is not None:
        m = gms_filter(m, img_a.shape, factor=gms_factor)
    return m


# ---------------------------------------------------------------------------
# Self-supervised training: synthetic shapes + homography pairs
# ---------------------------------------------------------------------------


def synthetic_corner_batch(rng: np.random.Generator, batch: int, hw: int = 64):
    """Random quads/checkers/line-crossings with exact corner labels.

    Returns (images (B, hw, hw, 1) float32 [0,1],
             cell labels (B, hw/8, hw/8) int32 in [0, 64] — 64 = dustbin).
    """
    B = batch
    imgs = np.full((B, hw, hw), 0.0, np.float32)
    Hc = hw // CELL
    labels = np.full((B, Hc, Hc), CELL * CELL, np.int32)  # dustbin

    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    for b in range(B):
        bg = rng.uniform(0.1, 0.4)
        imgs[b] = bg
        corners = []
        kind = rng.integers(0, 3)
        if kind == 0:  # random convex quad
            c = rng.uniform(hw * 0.3, hw * 0.7, size=2)
            ang = np.sort(rng.uniform(0, 2 * np.pi, size=4))
            rad = rng.uniform(hw * 0.12, hw * 0.32, size=4)
            pts = np.stack([c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], -1)
            fg = rng.uniform(0.6, 0.95)
            # rasterize via half-plane intersection
            inside = np.ones((hw, hw), bool)
            for i in range(4):
                p, q = pts[i], pts[(i + 1) % 4]
                nx, ny = q[1] - p[1], -(q[0] - p[0])
                inside &= (xx - p[0]) * nx + (yy - p[1]) * ny <= 0
            imgs[b] = np.where(inside, fg, imgs[b])
            corners = [tuple(p) for p in pts]
        elif kind == 1:  # checker patch (X-junctions)
            sq = int(rng.integers(8, 14))
            ox, oy = rng.uniform(2, hw - 3 * sq - 2, size=2)
            dark, light = rng.uniform(0.05, 0.25), rng.uniform(0.7, 0.95)
            cell_i = np.floor((xx - ox) / sq) + np.floor((yy - oy) / sq)
            reg = (xx >= ox) & (xx < ox + 3 * sq) & (yy >= oy) & (yy < oy + 3 * sq)
            imgs[b] = np.where(reg, np.where(cell_i % 2 == 0, light, dark), imgs[b])
            for i in range(1, 3):
                for j in range(1, 3):
                    corners.append((ox + i * sq, oy + j * sq))
        else:  # L / T line crossings
            fg = rng.uniform(0.6, 0.95)
            px, py = rng.uniform(hw * 0.25, hw * 0.75, size=2)
            w = rng.integers(2, 5)
            horiz = (np.abs(yy - py) < w) & (xx >= px)
            vert = (np.abs(xx - px) < w) & (yy >= py)
            imgs[b] = np.where(horiz | vert, fg, imgs[b])
            corners = [(px, py)]

        for (cx, cy) in corners:
            xi, yi = int(round(cx)), int(round(cy))
            if 2 <= xi < hw - 2 and 2 <= yi < hw - 2:
                labels[b, yi // CELL, xi // CELL] = (yi % CELL) * CELL + (xi % CELL)

        imgs[b] += rng.normal(0, 0.02, (hw, hw))
    return imgs[..., None].clip(0, 1), labels


def _detector_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Cell-wise cross-entropy vs (B, Hc, Wc) labels in [0, 64]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    # corners are rare: upweight non-dustbin cells
    w = jnp.where(labels == CELL * CELL, 1.0, 20.0)
    return -jnp.sum(w * ll) / jnp.sum(w)


def _descriptor_loss(da: jax.Array, db: jax.Array, temp: float = 0.1) -> jax.Array:
    """InfoNCE over corresponding cells of an identity-aligned pair.
    da, db: (B, Hc, Wc, D) from two augmented views of the same image."""
    B, Hc, Wc, D = da.shape
    a = da.reshape(B, Hc * Wc, D)
    b = db.reshape(B, Hc * Wc, D)
    s = jnp.einsum("bnd,bmd->bnm", a, b) / temp
    labels = jnp.arange(Hc * Wc)
    logp = jax.nn.log_softmax(s, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[None, :, None], axis=-1))


@functools.partial(jax.jit, static_argnames=("net", "lr"))
def train_step(net: KeypointNet, params, opt_state, imgs, labels, lr: float = 1e-3):
    """One Adam step on detector CE + descriptor InfoNCE (brightness/noise
    augmented twin views)."""
    import optax

    tx = optax.adam(lr)

    def loss_fn(p):
        logits, da = net.apply(p, imgs * 2.0 - 1.0)
        aug = jnp.clip(imgs * 1.1 + 0.05, 0, 1)
        logits2, db = net.apply(p, aug * 2.0 - 1.0)
        det = _detector_loss(logits, labels) + _detector_loss(logits2, labels)
        desc = _descriptor_loss(da, db)
        return det + 0.3 * desc, (det, desc)

    (loss, (det, desc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, det, desc


def make_optimizer_state(params, lr: float = 1e-3):
    import optax

    return optax.adam(lr).init(params)
