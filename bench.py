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
    db = ddb.from_rows(jnp.asarray(vecs, jnp.bfloat16))
    # A pool of DISTINCT query batches: with identical inputs every rep the
    # detector state saturates after one step and the runtime can legally
    # memoize/replay the whole program — measured 4.1e9 pairs/s, which would
    # imply 4.2 TB/s HBM reads on a ~0.8 TB/s part. Cycling fresh queries
    # forces every dispatch to really execute.
    pool = []
    for r in range(reps):
        q = rng.standard_normal((batch, dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pool.append(jnp.asarray(q))
    gidx = jnp.arange(n_rows, n_rows + batch, dtype=jnp.int32)
    qvalid = jnp.ones((batch,), bool)
    state = detector.init_state()

    # warmup + compile
    cands, st = detector.detect_batch(cfg, db, state, pool[0], gidx, qvalid)
    jax.block_until_ready((cands.score, st.prev_max))

    # correctness gate: the kernel being timed must actually scan the full
    # DB — plant exact matches at awkward rows (tile edges, last row) and
    # require the search to find them before any number is reported
    from cerebro_tpu.ops import similarity

    plant = [0, 511, 512, n_rows // 2, n_rows - 1][: min(5, batch)]
    probe = np.array(jnp.asarray([db.vectors[r] for r in plant], jnp.float32))
    qprobe = jnp.asarray(
        np.concatenate([probe, np.zeros((batch - len(plant), dim), np.float32)])
    )
    # gate BOTH implementations: the routed default (XLA at these sizes)
    # and the forced Pallas kernel (the pod-scale-shard path)
    paths = [True] if force_cpu else [True, "force"]
    for up in paths:
        _, ar = similarity.max_and_argmax(
            qprobe, db.vectors, jnp.full((batch,), n_rows, jnp.int32),
            use_pallas=up,
        )
        found = np.asarray(ar)[: len(plant)].tolist()
        if found != plant:
            raise RuntimeError(
                f"kernel correctness check failed (use_pallas={up}): {found} != {plant}"
            )

    # Throughput: run all reps INSIDE one jitted lax.scan (the detector
    # state chains step to step, so no work can be elided or reordered),
    # then MATERIALIZE the result on the host. Two measurement artifacts of
    # this environment's remote-TPU relay are excluded by construction:
    # block_until_ready can return before execution finishes (measured
    # >1 PFLOP/s "throughput" on a ~0.2 PFLOP/s part) — a host fetch
    # cannot; and per-dispatch relay latency (~20 ms/call measured) would
    # otherwise dominate a ms-scale kernel — one dispatch has none.
    import jax

    pool_stacked = jnp.stack(pool)

    @jax.jit
    def run_all(state, pool_stacked):
        def body(st, q):
            cands, st = detector.detect_batch(cfg, db, st, q, gidx, qvalid)
            return st, cands.score[0]
        st, scores = jax.lax.scan(body, state, pool_stacked)
        return scores

    sc = run_all(state, pool_stacked)  # warmup/compile
    jax.block_until_ready(sc)
    t0 = time.perf_counter()
    sc = run_all(state, pool_stacked)
    _ = np.asarray(sc)
    dt = time.perf_counter() - t0

    pairs_per_s = reps * batch * n_rows / dt
    # Sanity guard against a measurement artifact (e.g. runtime replaying
    # identical dispatches): implied DB read bandwidth should stay within
    # an order of magnitude of HBM. Kernel correctness itself is verified
    # separately (planted-argmax check below runs every bench invocation).
    implied_bw = reps * n_rows * dim * 2 / dt
    if implied_bw > 8.0e12:
        raise RuntimeError(
            f"implausible implied bandwidth {implied_bw/1e9:.0f} GB/s — "
            "measurement artifact; fix the bench"
        )
    return pairs_per_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small DB, few reps")
    ap.add_argument("--cpu", action="store_true", help="run the jax side on CPU")
    args = ap.parse_args()

    dim = 4096
    n_rows = 4096 if args.quick else 29184  # full = reference 29k capacity, tile-rounded
    reps = 10 if args.quick else 20
    # Mapping-mode query batch: the engine batches keyframes; 512 queries
    # per dispatch saturates the MXU (streaming latency stays sub-ms at
    # batch 8 — see tests; this benchmark measures per-chip throughput).
    batch = 64 if args.quick else 512

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
