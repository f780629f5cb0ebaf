#!/usr/bin/env python
"""Pretrain the NetVLAD descriptor on synthetic rendered places.

The reference ships weights trained out-of-repo (cartwheel_train,
ref README.md:155). This script produces an in-repo artifact: renders many
distinct places from the synthetic fractal world with per-place viewpoint
jitter, trains the descriptor net with the all-pairs margin loss, validates
place-recognition separation, and saves an orbax checkpoint usable via
``CerebroPipeline(params=...)`` / ``run_synthetic.py``.

  python scripts/pretrain_synthetic.py --out artifacts/descriptor_synth \
      [--cpu] [--steps 300] [--places 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/descriptor_synth")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--places", type=int, default=32)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--batch-places", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from cerebro_tpu.config import DescriptorConfig
    from cerebro_tpu.geometry import stereo  # se3 not needed: poses built in numpy
    from cerebro_tpu.models.descriptor import create_descriptor_model
    from cerebro_tpu.models.backbones import normalize_image
    from cerebro_tpu.train import create_train_state, train_step

    # --- render the place dataset (same world generator as run_synthetic) ---
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from run_synthetic import fractal_texture

    H, W, FX = 240, 320, 300.0
    CX, CY = W / 2, H / 2
    Z_NEAR, Z_FAR, X_SPLIT = 4.0, 7.0, 0.0
    rng = np.random.default_rng(3)
    tex = fractal_texture(rng, n=4096)

    def np_bilinear(img, x, y):
        x = np.clip(x, 0.0, img.shape[1] - 1.0)
        y = np.clip(y, 0.0, img.shape[0] - 1.0)
        x0 = np.floor(x).astype(np.int32)
        y0 = np.floor(y).astype(np.int32)
        x1 = np.minimum(x0 + 1, img.shape[1] - 1)
        y1 = np.minimum(y0 + 1, img.shape[0] - 1)
        wx, wy = x - x0, y - y0
        return (
            img[y0, x0] * (1 - wx) * (1 - wy)
            + img[y0, x1] * wx * (1 - wy)
            + img[y1, x0] * (1 - wx) * wy
            + img[y1, x1] * wx * wy
        )

    def render(w_T_c):
        # pure-numpy render: shipping every frame through the TPU relay
        # (67 MB texture upload per remap) is ~100x slower than host CPU
        R, tv = w_T_c[:3, :3], w_T_c[:3, 3]
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        rays = np.stack([(u - CX) / FX, (v - CY) / FX, np.ones_like(u)], -1)
        dirs = rays @ R.T
        s_near = (Z_NEAR - tv[2]) / dirs[..., 2]
        p_near = tv[None, None] + s_near[..., None] * dirs
        s = np.where(p_near[..., 0] < X_SPLIT, s_near, (Z_FAR - tv[2]) / dirs[..., 2])
        p = tv[None, None] + s[..., None] * dirs
        tx = p[..., 0] * 150.0 + tex.shape[1] / 2
        ty = p[..., 1] * 150.0 + tex.shape[0] / 2
        img = np_bilinear(tex, tx, ty)
        return np.clip(img * 255, 0, 255).astype(np.uint8)

    print(f"rendering {args.places} places x {args.views} views...", flush=True)
    imgs, labels = [], []
    for p in range(args.places):
        base_x = rng.uniform(-10, 10)
        base_y = rng.uniform(-3, 3)
        base_yaw = rng.uniform(-0.3, 0.3)
        for _ in range(args.views):
            # pure-numpy pose (a jnp op here would round-trip the relay)
            yaw = base_yaw + rng.uniform(-0.05, 0.05)
            c, sn = np.cos(yaw), np.sin(yaw)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]], np.float32)
            T[:3, 3] = [
                base_x + rng.uniform(-0.15, 0.15),
                base_y + rng.uniform(-0.15, 0.15),
                rng.uniform(-0.1, 0.1),
            ]
            imgs.append(render(T)[..., None])
            labels.append(p)
    imgs = np.stack(imgs)
    labels = np.asarray(labels, np.int32)

    # --- train ---
    cfg = DescriptorConfig(image_hw=(H, W), trunk_dim=64, num_clusters=4)
    net, params = create_descriptor_model(cfg, seed=0)
    state, tx = create_train_state(params, lr=5e-4)

    bp = args.batch_places
    for step in range(args.steps):
        pl_idx = rng.choice(args.places, bp, replace=False)
        sel = np.concatenate([np.nonzero(labels == p)[0] for p in pl_idx])
        x = jnp.asarray(imgs[sel])
        y = jnp.asarray(labels[sel])
        state, loss = train_step(net, tx, state, x, y)
        if step % 25 == 0:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)

    # --- validate separation ---
    def descs(p):
        out = []
        for i in range(0, len(imgs), 32):
            out.append(np.asarray(net.apply(p, normalize_image(jnp.asarray(imgs[i : i + 32])))))
        return np.concatenate(out)

    d = descs(state.params)
    s = d @ d.T
    same = (labels[:, None] == labels[None, :]) & ~np.eye(len(labels), dtype=bool)
    pos = s[same].mean()
    neg = s[~(labels[:, None] == labels[None, :])].mean()
    print(f"separation: same-place {pos:.3f} vs cross-place {neg:.3f} (margin {pos-neg:.3f})")

    os.makedirs(os.path.abspath(args.out), exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(os.path.join(args.out, "params")), state.params, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(
            {
                "config": {"image_hw": [H, W], "trunk_dim": 64, "num_clusters": 4},
                "steps": args.steps,
                "places": args.places,
                "same_place_sim": float(pos),
                "cross_place_sim": float(neg),
            },
            f, indent=2,
        )
    print(f"saved to {args.out}", flush=True)


if __name__ == "__main__":
    main()
