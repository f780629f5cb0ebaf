#!/usr/bin/env python
"""Scaling benchmark: keyframes/s for the sharded retrieval path at
1..N devices (BASELINE.md scaling measurement points).

On real multi-chip hardware this measures ICI scaling of the sharded
similarity search; with --virtual N it validates the SPMD program on N
virtual CPU devices (functional check, not a perf number).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0, help="force N CPU devices")
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=29184)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cerebro_tpu.config import LoopConfig
    from cerebro_tpu.db import descriptors as ddb
    from cerebro_tpu.loop import detector
    from cerebro_tpu.parallel import detect_batch_sharded, make_mesh, shard_db

    n_dev_total = jax.device_count()
    cfg = LoopConfig(db_capacity=args.rows)
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    q = jnp.asarray(vecs[: args.batch])
    gidx = jnp.arange(args.rows, args.rows + args.batch, dtype=jnp.int32)
    qvalid = jnp.ones((args.batch,), bool)

    results = []
    n = 1
    while n <= n_dev_total:
        if args.rows % n == 0:  # rows must shard evenly over the mesh
            mesh = make_mesh(n)
            db = shard_db(ddb.from_rows(jnp.asarray(vecs, jnp.bfloat16)), mesh)
            state = detector.init_state()
            c, s = detect_batch_sharded(cfg, db, state, q, gidx, qvalid, mesh)
            jax.block_until_ready(c.score)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                c, state = detect_batch_sharded(cfg, db, state, q, gidx, qvalid, mesh)
            jax.block_until_ready(c.score)
            dt = time.perf_counter() - t0
            kfs = args.reps * args.batch / dt
            results.append({"devices": n, "keyframes_per_s": round(kfs, 1)})
        n *= 2

    base = results[0]["keyframes_per_s"]
    for r in results:
        r["scaling_efficiency"] = round(
            r["keyframes_per_s"] / (base * r["devices"]), 3
        )
    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
