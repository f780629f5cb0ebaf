#!/usr/bin/env python
"""Per-stage device benchmarks (VERDICT r1 #6).

Measures, with the same discipline as bench.py (distinct inputs chained
through a lax.scan so the runtime cannot memoize or overlap-hide work, a
correctness gate per stage, and host materialization closing the timing):

  * describe     — descriptor net forward (the reference's GPU server hot
                   loop, model.predict at tens of ms/frame): keyframes/s,
                   with the ported reference weights.
  * verify       — verify_pair_batch (stereo depth x2 + matching + 3-way
                   RANSAC, the reference's 1 Hz consumer thread): pairs/s.
  * retrieval    — similarity search + detection at streaming (batch 8)
                   and mapping (batch 512) query batches: pairs/s.

Writes BENCH_STAGES.json and prints one JSON line per stage.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_describe(reps: int = 10, batch: int = 32):
    import jax
    import jax.numpy as jnp

    from cerebro_tpu import photoworld as pw
    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.models.mobilenet import load_ported_params, ported_forward

    params, meta = load_ported_params(
        os.path.join(os.path.dirname(__file__), "artifacts", "descriptor_ported")
    )
    # photo-mosaic world: the gate measures the descriptor's REAL margin
    # (the r3 noise-world gate read 0.969 vs 0.90 — VERDICT r3 Missing #1)
    world = pw.PhotoWorld.create(seed=0)
    ren = sw.Renderer(world)
    R = pw.PHOTO_RADIUS_M
    rng = np.random.default_rng(0)
    xs = rng.uniform(-R, R, size=reps * batch)
    ys = rng.uniform(-R, R, size=reps * batch)
    imgs = np.stack(
        [np.repeat(ren.render(x, y)[..., None], 3, -1) for x, y in zip(xs, ys)]
    ).astype(np.float32)
    imgs = jnp.asarray(imgs.reshape(reps, batch, *imgs.shape[1:]))

    # correctness gate: determinism + same-place >> different-place.
    # Statistical, not single-point: 16 spots on the annulus, each probed
    # against a 0.3 m-offset revisit (same place) and its antipode
    # (different place) — a single pair's similarity sits wherever the
    # mosaic happens to rhyme (a lone probe read 0.503 and flapped a
    # <0.5 gate; means are stable).
    d0 = ported_forward(params, imgs[0])
    d1 = ported_forward(params, imgs[0])
    assert float(jnp.max(jnp.abs(d0 - d1))) == 0.0, "describe nondeterminism"
    ths = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    def _r(x, y):
        return np.repeat(ren.render(x, y)[..., None], 3, -1).astype(np.float32)
    anchors = np.stack([_r(R * np.cos(t), R * np.sin(t)) for t in ths])
    revisit = np.stack(
        [_r(R * np.cos(t) - 0.05, R * np.sin(t) + 0.3) for t in ths])
    antipode = np.stack(
        [_r(-R * np.cos(t), -R * np.sin(t)) for t in ths])
    da = np.asarray(ported_forward(params, jnp.asarray(anchors)))
    dr = np.asarray(ported_forward(params, jnp.asarray(revisit)))
    dn = np.asarray(ported_forward(params, jnp.asarray(antipode)))
    same = float(np.mean(np.sum(da * dr, -1)))
    diff = float(np.mean(np.sum(da * dn, -1)))
    assert same > 0.7 and diff < 0.5 and same > diff + 0.3, (same, diff)

    @jax.jit
    def run(imgs):
        def body(carry, batch_imgs):
            d = ported_forward(params, batch_imgs + carry)
            return jnp.float32(jnp.max(d) * 1e-6), None

        c, _ = jax.lax.scan(body, jnp.float32(0), imgs)
        return c

    out = run(imgs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(imgs)
    _ = float(out)
    dt = time.perf_counter() - t0
    return {
        "keyframes_per_s": round(reps * batch / dt, 1),
        "ms_per_frame": round(dt / (reps * batch) * 1e3, 3),
        "batch": batch,
        "image_hw": [sw.IMG_H, sw.IMG_W],
        "descriptor": "ported (mobilenet_conv7_allpairloss, D=8192)",
        "world": "photo (real-photograph mosaic, cerebro_tpu.photoworld)",
        "gate": {"same_place_sim": round(same, 3), "different_sim": round(diff, 3)},
    }


def bench_verify(reps: int = 3, batches=(4, 8, 16, 32)):
    """verify_pair_batch throughput vs device batch, pushed until pairs/s
    saturates (VERDICT r2 #5). Compile time is reported separately per
    batch size — steady-state pairs/s excludes it (a long-running engine
    compiles once)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cerebro_tpu import photoworld as pw
    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.config import VerifyConfig
    from cerebro_tpu.verify.geometric import verify_pair_batch

    world = pw.PhotoWorld.create(seed=0)
    ren = sw.Renderer(world)
    rig = ren.rig()
    cfg = dataclasses.replace(
        VerifyConfig(), max_features=1024, ransac_hypotheses=128,
        gms_factor=4.0, min_matches_accept=200,
    )
    rng = np.random.default_rng(0)
    max_b = max(batches)
    # pairs: same place with a small offset (verifiable) at random spots
    # on the photo circuit's annulus (real-photo texture)
    pool = []
    for r in range(reps):
        las, ras, lbs, rbs = [], [], [], []
        for k in range(max_b):
            th = rng.uniform(0, 2 * np.pi)
            rr = rng.uniform(pw.PHOTO_RADIUS_M - 2, pw.PHOTO_RADIUS_M + 2)
            x, y = rr * np.cos(th), rr * np.sin(th)
            la, ra = ren.stereo(x, y)
            lb, rb = ren.stereo(x + 0.1, y + 0.05)
            las.append(la); ras.append(ra); lbs.append(lb); rbs.append(rb)
        pool.append(tuple(jnp.asarray(np.stack(v), jnp.float32) for v in (las, ras, lbs, rbs)))

    # two tiers (VerifyConfig.cascade): the steerable matcher serves every
    # pair first; only match-count failures escalate to the full
    # gather-bank matcher
    fast_cfg = cfg  # default matcher is "steerable"
    cfg = dataclasses.replace(cfg, matcher="gather")

    def run_sweep(vcfg, bs):
        sweep, gate = [], None
        for batch in bs:
            # one key PER PAIR per rep (verify_pair_batch vmaps over keys)
            keys = jax.random.split(jax.random.PRNGKey(batch), (reps, batch))
            pb = [tuple(x[:batch] for x in p) for p in pool]
            t0 = time.perf_counter()
            res = verify_pair_batch(vcfg, keys[0], *pb[0], rig)
            jax.block_until_ready(res.accepted)
            compile_s = time.perf_counter() - t0
            if gate is None:
                # gate: same-place pairs must verify with small translation
                # Per-tier gate: POSE correctness on consistent pairs.
                # Acceptance itself is cascade-level (checked after both
                # tiers run): the >200-match accept gate intentionally
                # passes only strong pairs (ref >800 of 5000 ORB,
                # src/ProcessedLoopCandidate.cpp:112), so a single tier
                # on 0.1 m-offset annulus pairs accepts a minority.
                acc = np.asarray(res.accepted)
                cons = np.asarray(res.consistent)
                t_norm = np.linalg.norm(np.asarray(res.T_b_a)[:, :3, 3], axis=1)
                assert cons.any(), "verify gate: no pair consistent"
                assert (t_norm[cons] < 0.5).all(), t_norm
                gate = {
                    "accept_rate": round(float(acc.mean()), 3),
                    "consistent_rate": round(float(cons.mean()), 3),
                    "accepted": acc,
                    "t_norm": t_norm,
                }
            t0 = time.perf_counter()
            last = None
            for r in range(reps):
                last = verify_pair_batch(vcfg, keys[r], *pb[r], rig)
            _ = np.asarray(last.accepted)
            dt = time.perf_counter() - t0
            sweep.append(
                {
                    "batch": batch,
                    "pairs_per_s": round(reps * batch / dt, 2),
                    "ms_per_pair": round(dt / (reps * batch) * 1e3, 1),
                    "compile_s_first_call": round(compile_s, 1),
                }
            )
        return sweep, gate

    sweep, gate1 = run_sweep(fast_cfg, batches)
    esc_sweep, gate2 = run_sweep(cfg, (max(batches),))
    best = max(sweep, key=lambda r: r["pairs_per_s"])
    # cascade gate: a pair is accepted if EITHER tier accepts it (the
    # engine escalates tier-1 failures to the gather-bank tier); per-tier
    # pose correctness was asserted above, here the cascade must accept a
    # real fraction of these deliberately-hard 0.1 m-offset pairs
    a1, a2 = gate1.pop("accepted"), gate2.pop("accepted")
    n = min(len(a1), len(a2))  # tiers gate at their first batch size
    acc = a1[:n] | a2[:n]
    gate1.pop("t_norm")
    gate2.pop("t_norm")
    assert acc.mean() >= 0.25, f"cascade accept rate {acc.mean():.2f}"
    gate = {
        "tier1": gate1,
        "tier2": gate2,
        "cascade_accept_rate": round(float(acc.mean()), 3),
    }
    return {
        "tier": "steerable matcher (cascade pass 1, serves every pair)",
        "sweep": sweep,
        "best_batch": best["batch"],
        "pairs_per_s": best["pairs_per_s"],
        "ms_per_pair": best["ms_per_pair"],
        "escalation_tier": {
            "note": "full gather-bank matcher (cascade pass 2, "
                    "match-count failures only)",
            **esc_sweep[0],
        },
        "gate": gate,
    }


def bench_retrieval(n_rows: int = 29184, dim: int = 4096, reps: int = 30):
    import jax
    import jax.numpy as jnp

    from cerebro_tpu.ops import similarity as sim

    rng = np.random.default_rng(0)
    db = jnp.asarray(
        rng.standard_normal((n_rows, dim)).astype(np.float32), jnp.bfloat16
    )
    gids = jnp.arange(n_rows, dtype=jnp.int32)
    out = {}
    for tag, Q in (("streaming_batch8", 8), ("mapping_batch512", 512)):
        qs = jnp.asarray(
            rng.standard_normal((reps, Q, dim)).astype(np.float32), jnp.bfloat16
        )
        lims = jnp.full((Q,), n_rows, jnp.int32)

        @jax.jit
        def run(qs):
            def body(carry, q):
                mx, ar = sim.max_and_argmax(q + carry * 1e-6, db, lims, gids)
                return jnp.max(mx), None

            c, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return c

        o = run(qs)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = run(qs)
        _ = float(o)
        dt = time.perf_counter() - t0
        out[tag] = {
            "pairs_per_s": round(reps * Q * n_rows / dt, 1),
            "ms_per_dispatch": round(dt / reps * 1e3, 3),
            "tflops": round(2 * reps * Q * n_rows * dim / dt / 1e12, 1),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="BENCH_STAGES.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    report = {"device": jax.devices()[0].platform}
    report["describe"] = bench_describe(reps=3 if args.quick else 10)
    report["retrieval"] = bench_retrieval(
        n_rows=4096 if args.quick else 29184, reps=5 if args.quick else 30
    )
    report["verify"] = bench_verify(
        reps=2 if args.quick else 3,
        batches=(2, 4) if args.quick else (4, 8, 16, 32),
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in report.items():
        if k != "device":
            print(json.dumps({k: v}))


if __name__ == "__main__":
    main()
