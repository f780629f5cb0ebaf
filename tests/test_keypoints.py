"""Learned keypoint detector/descriptor (SuperPoint-class model).

Trains the tiny net briefly on synthetic shapes and requires (a) corner
recall well above chance on held-out synthetic images, (b) learned
matching on a shifted image pair to produce geometrically-consistent
matches through the standard Matches/GMS stack.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cerebro_tpu.models.keypoints import (
    create_keypoint_model,
    detect_keypoints,
    heatmap_from_logits,
    make_optimizer_state,
    match_image_pair_learned,
    synthetic_corner_batch,
    train_step,
)


def test_shapes_and_contract():
    net, params = create_keypoint_model(desc_dim=64, width=16)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 64)), jnp.float32)
    kps, desc = detect_keypoints(net, params, img, max_kp=128)
    assert kps.xy.shape == (128, 2)
    assert desc.shape == (128, 64)
    n = np.linalg.norm(np.asarray(desc), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-4)
    logits, _ = net.apply(params, jnp.zeros((2, 64, 64, 1), jnp.float32))
    heat = heatmap_from_logits(logits)
    assert heat.shape == (2, 64, 64)
    s = np.asarray(heat).reshape(2, -1).sum(-1)
    assert (s <= 64.0 + 1e-3).all()  # each cell's mass <= 1


def _train(net, params, steps=60, seed=0):
    rng = np.random.default_rng(seed)
    opt = make_optimizer_state(params)
    loss0 = None
    for i in range(steps):
        imgs, labels = synthetic_corner_batch(rng, 16)
        params, opt, loss, det, desc = train_step(
            net, params, opt, jnp.asarray(imgs), jnp.asarray(labels)
        )
        if loss0 is None:
            loss0 = float(loss)
    return params, loss0, float(loss)


def test_training_learns_corners():
    net, params = create_keypoint_model(desc_dim=64, width=16, seed=1)
    params, loss0, loss1 = _train(net, params, steps=80)
    assert loss1 < 0.6 * loss0, (loss0, loss1)

    # held-out: checker image with known X-junction corners
    rng = np.random.default_rng(123)
    hits = 0
    total = 0
    for _ in range(6):
        imgs, labels = synthetic_corner_batch(rng, 1)
        img = jnp.asarray(imgs[0, :, :, 0])
        gt_cells = np.argwhere(labels[0] != 64)
        if len(gt_cells) == 0:
            continue
        kps, _ = detect_keypoints(net, params, img, max_kp=32, border=2, min_prob=0.01)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        for (cy, cx) in gt_cells:
            lab = labels[0, cy, cx]
            gx = cx * 8 + (lab % 8)
            gy = cy * 8 + (lab // 8)
            total += 1
            if len(xy) and np.min(np.linalg.norm(xy - [gx, gy], axis=-1)) <= 3.0:
                hits += 1
    assert total >= 5
    assert hits / total >= 0.6, (hits, total)


def test_learned_matching_cell_aligned_shift():
    """End-to-end contract of the learned matcher: a shift by one full cell
    (8, 8) keeps the conv feature maps EXACTLY equivariant (SAME-padding
    borders aside), so detected keypoints must move by the shift and their
    sampled descriptors must match near-perfectly through mutual-NN —
    independent of how well the tiny test-trained model generalizes."""
    net, params = create_keypoint_model(desc_dim=64, width=16, seed=2)
    params, _, _ = _train(net, params, steps=60, seed=3)

    # a scene of appearance-distinct quads (identical repeated corners, e.g.
    # checker X-junctions, would make mutual-NN genuinely ambiguous)
    rng = np.random.default_rng(9)
    base = np.full((96, 96), 0.15, np.float32)
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    centers = [(28, 28), (66, 30), (30, 66), (64, 64)]
    for qi, (cx0, cy0) in enumerate(centers):
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=4))
        rad = rng.uniform(8, 13, size=4)
        pts = np.stack([cx0 + rad * np.cos(ang), cy0 + rad * np.sin(ang)], -1)
        inside = np.ones((96, 96), bool)
        for i in range(4):
            p, q = pts[i], pts[(i + 1) % 4]
            nx, ny = q[1] - p[1], -(q[0] - p[0])
            inside &= (xx - p[0]) * nx + (yy - p[1]) * ny <= 0
        base = np.where(inside, 0.45 + 0.13 * qi, base)
    base += rng.normal(0, 0.01, base.shape).astype(np.float32)
    base = base.clip(0, 1)
    dx, dy = 8, 8  # one detector cell: exact conv equivariance
    shifted = np.roll(np.roll(base, dy, axis=0), dx, axis=1)

    m = match_image_pair_learned(
        net, params, jnp.asarray(base), jnp.asarray(shifted), max_kp=96, min_score=0.5
    )
    valid = np.asarray(m.valid)
    assert valid.sum() >= 4, valid.sum()
    d = np.asarray(m.xy_b)[valid] - np.asarray(m.xy_a)[valid]
    inliers = np.linalg.norm(d - [dx, dy], axis=-1) <= 1.0
    # near-perfect under exact equivariance (roll wraparound can clip a few)
    assert inliers.sum() >= 4, d
    assert inliers.mean() >= 0.7, d
