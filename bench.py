"""Headline benchmark: loop-candidate retrieval throughput per chip.

Measures the engine's hot loop — batched descriptor similarity search +
temporal-consistency detection against a full-capacity descriptor DB
(29 056 rows x 4096 dims, the reference's 29 000-column capacity,
src/Cerebro.cpp:946) — and compares it against the CPU baseline the
reference actually runs: sequential Eigen GEMVs of 3 query descriptors
against the history matrix per tick (src/Cerebro.cpp:1019-1032), here
reproduced with float32 numpy/BLAS on the host CPU.

Metric: descriptor-comparison pairs/s/chip ( = queries/s x DB rows ).
Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def cpu_baseline_pairs_per_s(n_rows: int, dim: int, reps: int = 20) -> float:
    """The reference's search: 3 sequential GEMVs per tick vs the history
    matrix (Eigen on desktop CPU ~ numpy BLAS here)."""
    M = np.random.default_rng(0).standard_normal((n_rows, dim)).astype(np.float32)
    vs = [np.random.default_rng(i).standard_normal(dim).astype(np.float32) for i in range(3)]
    # warmup
    for v in vs:
        _ = M @ v
    t0 = time.perf_counter()
    for _ in range(reps):
        for v in vs:
            _ = M @ v
    dt = time.perf_counter() - t0
    queries = 3 * reps
    return queries * n_rows / dt


def tpu_pairs_per_s(n_rows: int, dim: int, batch: int, reps: int, force_cpu: bool) -> float:
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cerebro_tpu.config import LoopConfig
    from cerebro_tpu.db import descriptors as ddb
    from cerebro_tpu.loop import detector

    cfg = LoopConfig(db_capacity=n_rows)
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n_rows, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    db = ddb.DescriptorDB(
        vectors=jnp.asarray(vecs, jnp.bfloat16),
        count=jnp.asarray(n_rows, jnp.int32),
    )
    q = rng.standard_normal((batch, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)
    gidx = jnp.arange(n_rows, n_rows + batch, dtype=jnp.int32)
    qvalid = jnp.ones((batch,), bool)
    state = detector.init_state()

    # warmup + compile
    cands, st = detector.detect_batch(cfg, db, state, q, gidx, qvalid)
    jax.block_until_ready((cands.score, st.prev_max))

    t0 = time.perf_counter()
    for _ in range(reps):
        cands, state = detector.detect_batch(cfg, db, state, q, gidx, qvalid)
    jax.block_until_ready((cands.score, state.prev_max))
    dt = time.perf_counter() - t0
    return reps * batch * n_rows / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small DB, few reps")
    ap.add_argument("--cpu", action="store_true", help="run the jax side on CPU")
    args = ap.parse_args()

    dim = 4096
    n_rows = 4096 if args.quick else 29184  # full = reference 29k capacity, tile-rounded
    reps = 10 if args.quick else 100
    batch = 8

    baseline = cpu_baseline_pairs_per_s(n_rows, dim, reps=5 if args.quick else 20)
    value = tpu_pairs_per_s(n_rows, dim, batch, reps, force_cpu=args.cpu)

    print(
        json.dumps(
            {
                "metric": "loop_candidate_pairs_per_s_per_chip",
                "value": round(value, 1),
                "unit": "pairs/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
