#!/usr/bin/env python
"""Retrieval A/B of the WPCA descriptor projection on the photo world
(VERDICT r4 #7): fit the closed-form projection on a deployment-domain
bank, compare the same/different-place margin of raw vs projected
descriptors on held-out probes, and record the compression factor.

Reference pipeline being matched: ReljaNetVLAD = VGG16 + NetVLAD64 +
WPCA -> 4096 (/root/reference/scripts/whole_image_desc_compute_server.py:
62-165). Emits one JSON line; --out writes WPCA_AB.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--bank", type=int, default=192)
    ap.add_argument("--probes", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cerebro_tpu import photoworld as pw
    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.models.mobilenet import load_ported_params, ported_forward
    from cerebro_tpu.models.wpca import apply_wpca, fit_wpca

    params, meta = load_ported_params(
        os.path.join(os.path.dirname(__file__), "..", "artifacts", "descriptor_ported")
    )
    world = pw.PhotoWorld.create(seed=0)
    ren = sw.Renderer(world)
    R = pw.PHOTO_RADIUS_M
    scale = meta.get("input_scale", "raw")

    def describe(pts):
        imgs = np.stack(
            [np.repeat(ren.render(x, y)[..., None], 3, -1) for x, y in pts]
        ).astype(np.float32)
        out = []
        for i in range(0, len(imgs), 16):
            chunk = imgs[i : i + 16]
            pad = 16 - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            d = np.asarray(
                ported_forward(params, jnp.asarray(chunk), input_scale=scale)
            )
            out.append(d[: 16 - pad if pad else 16])
        return np.concatenate(out)

    rng = np.random.default_rng(1)
    ths = rng.uniform(0, 2 * np.pi, args.bank)
    rrs = rng.uniform(R - 2, R + 2, args.bank)
    bank = describe(list(zip(rrs * np.cos(ths), rrs * np.sin(ths))))
    wp = fit_wpca(bank, out_dim=args.dim)

    pth = rng.uniform(0, 2 * np.pi, args.probes)
    anchors = describe([(R * np.cos(t), R * np.sin(t)) for t in pth])
    revisit = describe([(R * np.cos(t) - 0.05, R * np.sin(t) + 0.3) for t in pth])
    antipode = describe([(-R * np.cos(t), -R * np.sin(t)) for t in pth])

    def stats(a, r, n):
        same = np.sum(a * r, -1)
        diff = np.sum(a * n, -1)
        return {
            "same_mean": round(float(same.mean()), 3),
            "same_p05": round(float(np.percentile(same, 5)), 3),
            "diff_mean": round(float(diff.mean()), 3),
            "diff_p95": round(float(np.percentile(diff, 95)), 3),
            "margin": round(float(same.mean() - diff.mean()), 3),
        }

    raw = stats(anchors, revisit, antipode)
    aw, rw, nw = (np.asarray(apply_wpca(wp, x)) for x in (anchors, revisit, antipode))
    proj = stats(aw, rw, nw)

    report = {
        "device": jax.devices()[0].platform,
        "world": "photo",
        "descriptor": "ported (mobilenet_conv7_allpairloss, D=8192)",
        "bank_size": args.bank,
        "probes": args.probes,
        "raw_dim": int(bank.shape[1]),
        "wpca_dim": int(wp.out_dim),
        "compression_x": round(bank.shape[1] / wp.out_dim, 1),
        "raw": raw,
        "wpca": proj,
        "pass": bool(
            proj["margin"] > raw["margin"] and proj["same_mean"] > 0.7
        ),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not report["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
