#!/usr/bin/env python
"""Method D (HypothesisManager) parameter sweep (VERDICT r3 #5).

r3's Method D sat far off the precision/recall frontier (recall 0.067 at
precision 0.78 vs Method C's 0.987/0.84) and was the only method with no
tuning evidence. This sweeps the promote-support / digest-cadence / TTL
grid over the SAME descriptor stream (cached from one run, replayed per
combo — descriptors are deterministic given the stream) on the photo
world, reporting each combo's candidate precision/recall. The reference
marks HypothesisManager "still under development" (src/Cerebro.h:134-137)
and hard-codes TTL 20 / decay 4 / promote-on-support heuristics
(src/HypothesisManager.{h,cpp}); this sweep is the tuning pass the
reference never ran.

Writes SWEEP_METHOD_D.json and prints the frontier.
"""

import argparse
import dataclasses
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ""))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--laps", type=float, default=3.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--world", default="photo", choices=["noise", "photo"])
    ap.add_argument("--descriptor", default="ported")
    ap.add_argument("--out", default="SWEEP_METHOD_D.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench_e2e import make_config, make_world, prerender, stream

    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.runtime import CerebroPipeline

    world, seq_factory = make_world(args.world)
    seq = seq_factory(n_frames=args.frames, laps=args.laps)
    ren, frames = prerender(world, seq, args.frames)
    base_cfg = make_config(args.descriptor, args.frames)

    # one real run to cache the descriptor stream
    base = CerebroPipeline(base_cfg, rig=ren.rig(), body_T_cam=sw.body_T_cam())
    stream(base, seq, frames, args.frames)
    B = base_cfg.runtime.descriptor_batch
    rows = np.asarray(base.db.vectors)[: len(base.db_gid_to_store)]
    cache = []
    k = 0
    while k < len(rows):
        chunk = rows[k : k + B]
        k += B
        cache.extend(list(chunk))
        cache.extend([chunk[-1] * 0] * (B - len(chunk)))

    gt_revisit = sw.revisit_ground_truth(seq)
    gt_frames = set(np.nonzero(gt_revisit)[0])
    n_opp = max(int(gt_revisit.sum()), 1)
    xy = seq.xy

    def evaluate(cfg):
        import jax.numpy as jnp

        replay = iter(cache)

        def describe_cached(imgs, _it=replay):
            return jnp.asarray(
                np.stack([next(_it) for _ in range(imgs.shape[0])])
            )

        pipe = CerebroPipeline(
            cfg, describe_fn=describe_cached, describe_dim=rows.shape[-1]
        )
        stream(pipe, seq, frames, args.frames)
        cands = [(c.idx_curr, c.idx_prev) for c in pipe.candidates]
        correct = [
            cp for cp in cands if np.linalg.norm(xy[cp[0]] - xy[cp[1]]) < 1.5
        ]
        prec = len(correct) / max(len(cands), 1)
        rec = len({c for c, _ in correct} & gt_frames) / n_opp
        return {
            "n_candidates": len(cands),
            "precision": round(prec, 4),
            "recall": round(rec, 4),
        }

    grid = {
        "hypothesis_promote": [2, 3, 5, 8],
        "hypothesis_digest_every": [1, 3, 6],
        "hypothesis_ttl": [20, 40],
        "hypothesis_decay": [2, 4],
    }
    results = []
    for combo in itertools.product(*grid.values()):
        params = dict(zip(grid.keys(), combo))
        cfg = dataclasses.replace(
            base_cfg,
            loop=dataclasses.replace(base_cfg.loop, method="D", **params),
        )
        r = {**params, **evaluate(cfg)}
        results.append(r)
        print(json.dumps(r), flush=True)

    # frontier: best recall subject to precision >= 0.8
    ok = [r for r in results if r["precision"] >= 0.8]
    best = max(ok, key=lambda r: r["recall"]) if ok else None
    report = {
        "world": args.world,
        "frames": args.frames,
        "descriptor": args.descriptor,
        "feed": "all top-k hits per query (ref faiss 5-NN feed, "
                "src/Cerebro.cpp:731-885)",
        "grid": grid,
        "results": results,
        "best_at_precision_0.8": best,
        "r3_baseline": {"recall": 0.067, "precision": 0.78,
                        "note": "top-1 feed, untuned defaults, noise world"},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
