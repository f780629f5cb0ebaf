"""Worker process for the multi-host distributed test.

Launched N times by test_multihost.py with a shared coordinator address.
Each process owns a slice of virtual CPU devices; together they form one
global mesh, exactly like hosts in a TPU pod slice (SURVEY.md §5.8). The
worker builds the globally-sharded descriptor DB with
``jax.make_array_from_callback`` (each process materializes only its
addressable shards), runs the distributed search kernels, and verifies
them against a host-side numpy reference that every process can compute
independently.

Exit code 0 = every check passed on this process.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--save-db", default=None, help="save a sharded DB here and exit")
    ap.add_argument("--load-db", default=None, help="restore a sharded DB from here and exit")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cerebro_tpu.parallel.multihost import global_mesh, host_info, init_multihost

    init_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    info = host_info()
    assert info["process_count"] == args.num_processes, info
    assert info["global_devices"] == args.num_processes * args.devices_per_process, info

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cerebro_tpu.parallel.sharded_search import sharded_max_and_argmax, sharded_topk

    mesh = global_mesh()
    n_dev = info["global_devices"]

    if args.save_db or args.load_db:
        # Sharded-DB checkpoint across a PROCESS-COUNT change: one job saves
        # with its mesh, a differently-sized job restores with its own —
        # orbax/TensorStore reshards on load (SURVEY §5.4 multi-host parity).
        import numpy as np
        import jax.numpy as jnp
        import orbax.checkpoint as ocp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cerebro_tpu.db import descriptors as ddb
        from cerebro_tpu.parallel.sharded_search import shard_db, sharded_topk

        dim, n_rows = 64, 256
        rng = np.random.default_rng(21)
        host = rng.standard_normal((n_rows, dim)).astype(np.float32)
        host /= np.linalg.norm(host, axis=-1, keepdims=True)
        db = shard_db(ddb.from_rows(jnp.asarray(host)), mesh)
        tree = {
            "vectors": db.vectors,
            "global_ids": db.global_ids,
            "count": db.count,
            "total": db.total,
        }
        ckpt = ocp.StandardCheckpointer()
        if args.save_db:
            ckpt.save(args.save_db, tree, force=True)
            ckpt.wait_until_finished()
            print(f"process {args.process_id}: db saved", flush=True)
            return 0
        # load path: restore INTO this (different) topology
        sh = NamedSharding(mesh, P("db", None))
        sh1 = NamedSharding(mesh, P("db"))
        rep = NamedSharding(mesh, P())
        target = {
            "vectors": jax.ShapeDtypeStruct((n_rows, dim), jnp.float32, sharding=sh),
            "global_ids": jax.ShapeDtypeStruct((n_rows,), jnp.int32, sharding=sh1),
            "count": jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
            "total": jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        }
        restored = ckpt.restore(args.load_db, target)
        assert int(restored["total"]) == n_rows
        # every process checks its addressable shards against the host copy
        for s in restored["vectors"].addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), host[s.index], rtol=0, atol=0
            )
        # and the restored DB searches correctly on the NEW topology
        q = jax.device_put(jnp.asarray(host[100:104]), rep)
        lim = jax.device_put(jnp.full((4,), n_rows, jnp.int32), rep)
        tv, ti = sharded_topk(
            q, restored["vectors"], lim, restored["global_ids"], mesh, k=1
        )
        assert np.array_equal(np.asarray(ti)[:, 0], np.arange(100, 104)), ti
        print(f"process {args.process_id}: db restored + searched ok", flush=True)
        return 0

    # Deterministic global DB — every process derives the same host copy,
    # but only its addressable shards are materialized on device.
    dim, rows_per_dev, q_n, k = 128, 64, 8, 5
    n_rows = n_dev * rows_per_dev
    rng = np.random.default_rng(7)
    host_db = rng.standard_normal((n_rows, dim)).astype(np.float32)
    host_db /= np.linalg.norm(host_db, axis=-1, keepdims=True)

    db_sharding = NamedSharding(mesh, P("db", None))
    db_vectors = jax.make_array_from_callback(
        host_db.shape, db_sharding, lambda idx: host_db[idx]
    )

    host_q = rng.standard_normal((q_n, dim)).astype(np.float32)
    host_q /= np.linalg.norm(host_q, axis=-1, keepdims=True)
    # Staggered limits exercise shards with empty windows on some hosts.
    host_lim = np.linspace(1, n_rows, q_n).astype(np.int32)

    rep = NamedSharding(mesh, P())
    queries = jax.device_put(jnp.asarray(host_q), rep)
    limits = jax.device_put(jnp.asarray(host_lim), rep)

    gids = jax.device_put(
        jnp.arange(n_rows, dtype=jnp.int32), NamedSharding(mesh, P("db"))
    )
    mx, ar = sharded_max_and_argmax(
        queries, db_vectors, limits, gids, mesh, use_pallas=False
    )
    mx, ar = np.asarray(mx), np.asarray(ar)

    # The device kernel runs the matmul in bf16 (MXU form); allow bf16-level
    # score error and judge indices by their true (f32) score, not identity.
    TOL = 5e-3
    scores = host_q @ host_db.T  # (Q, N)
    for qi in range(q_n):
        scores[qi, host_lim[qi] :] = -np.inf
    ref_mx = scores.max(axis=1)
    assert np.allclose(mx, ref_mx, atol=TOL), (mx, ref_mx)
    for qi in range(q_n):
        assert ar[qi] < host_lim[qi], (qi, ar[qi])
        assert scores[qi, ar[qi]] >= ref_mx[qi] - TOL, qi

    tv, ti = sharded_topk(queries, db_vectors, limits, gids, mesh, k=k)
    tv, ti = np.asarray(tv), np.asarray(ti)
    ref_tv = -np.sort(-scores, axis=1)[:, :k]
    for qi in range(q_n):
        v = int(min(k, host_lim[qi]))  # entries past the limit are -inf filler
        assert np.allclose(tv[qi, :v], ref_tv[qi, :v], atol=TOL), qi
        # every returned row must genuinely score at least the v-th best
        assert (scores[qi, ti[qi, :v]] >= ref_tv[qi, v - 1] - TOL).all(), qi

    # Distributed pose-graph GN across processes: edge axis sharded globally.
    from cerebro_tpu.config import PoseGraphConfig
    from cerebro_tpu.posegraph import PoseGraph, optimize_sharded, pad_graph

    n_nodes = 12
    x0 = rng.standard_normal((n_nodes, 4)).astype(np.float32) * 0.1
    graph = pad_graph(
        PoseGraph(
            xyzyaw=jnp.asarray(x0),
            node_valid=jnp.ones(n_nodes, dtype=bool),
            odo_i=jnp.arange(n_nodes - 1, dtype=jnp.int32),
            odo_j=jnp.arange(1, n_nodes, dtype=jnp.int32),
            odo_meas=jnp.asarray(
                rng.standard_normal((n_nodes - 1, 4)).astype(np.float32) * 0.05
            ),
            odo_valid=jnp.ones(n_nodes - 1, dtype=bool),
            loop_i=jnp.asarray([n_nodes - 1], jnp.int32),
            loop_j=jnp.asarray([0], jnp.int32),
            loop_meas=jnp.zeros((1, 4)),
            loop_valid=jnp.ones(1, dtype=bool),
        ),
        n_dev,
    )
    x_opt, _, cost = optimize_sharded(
        graph, PoseGraphConfig(max_gn_iters=3, cg_iters=20), mesh
    )
    cost = float(np.asarray(cost))
    assert np.isfinite(cost), cost
    assert np.isfinite(np.asarray(x_opt)).all()

    print(f"process {args.process_id}: all multihost checks passed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
