"""Pose-graph Gauss-Newton sharded over the device mesh.

The distributed version of posegraph/optimizer.py: node states (and switch
variables) are replicated; the residual (edge) axis is sharded — each
device evaluates its local edges' residuals and Jacobian products, and the
only cross-device traffic is the psum of J^T r and J^T J v inside the CG
matvec (O(N) per CG iteration, rides ICI). This is the structure of a
distributed normal-equation solve: the Schur-free analog of splitting a
bundle-adjustment RCS across workers.

Exactness: with the same edges and iteration counts the result equals the
single-device optimizer bit-for-bit up to reduction order (tested on the
virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cerebro_tpu.config import PoseGraphConfig
from cerebro_tpu.posegraph.optimizer import PoseGraph, _edge_residual


def _pad_to(arr: jax.Array, n: int, fill=0):
    pad = n - arr.shape[0]
    if pad == 0:
        return arr
    pad_block = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad_block], axis=0)


def pad_graph(graph: PoseGraph, n_dev: int) -> PoseGraph:
    """Pad edge arrays to multiples of n_dev (invalid padding edges)."""

    def up(n):
        return ((n + n_dev - 1) // n_dev) * n_dev

    eo = up(graph.odo_i.shape[0])
    el = up(graph.loop_i.shape[0])
    return PoseGraph(
        xyzyaw=graph.xyzyaw,
        node_valid=graph.node_valid,
        odo_i=_pad_to(graph.odo_i, eo),
        odo_j=_pad_to(graph.odo_j, eo),
        odo_meas=_pad_to(graph.odo_meas, eo),
        odo_valid=_pad_to(graph.odo_valid, eo, fill=False),
        loop_i=_pad_to(graph.loop_i, el),
        loop_j=_pad_to(graph.loop_j, el),
        loop_meas=_pad_to(graph.loop_meas, el),
        loop_valid=_pad_to(graph.loop_valid, el, fill=False),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def optimize_sharded(
    graph: PoseGraph,
    cfg: PoseGraphConfig,
    mesh: Mesh,
    axis: str = "db",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Edge-sharded GN. Graph edge arrays must be padded to multiples of the
    mesh size (use ``pad_graph``). Returns (xyzyaw, switches, cost)."""
    n_dev = mesh.shape[axis]
    assert graph.odo_i.shape[0] % n_dev == 0
    assert graph.loop_i.shape[0] % n_dev == 0
    el_total = graph.loop_i.shape[0]

    def solve(x0, oi, oj, om, ov, li, lj, lm, lv, loop_slot):
        # loop_slot: global switch-vector indices of the local loop edges
        def res_local(params):
            x = params["x"]
            s = jax.nn.sigmoid(params["s_logit"])[loop_slot[:, 0]]  # local switches
            r_odo = _edge_residual(x, oi, oj, om) * ov[:, None]
            r_loop = _edge_residual(x, li, lj, lm) * (s * lv)[:, None]
            r_switch = (1.0 - s) * cfg.switch_prior_weight * lv
            # gauge on every shard, scaled so the psum'd normal equations
            # match the single-device formulation exactly
            r_gauge = 10.0 / jnp.sqrt(float(n_dev)) * (x[0] - x0)
            return jnp.concatenate([r_odo.reshape(-1), r_loop.reshape(-1), r_switch, r_gauge])

        params0 = {
            "x": graph.xyzyaw,
            "s_logit": jnp.full((el_total,), 2.0),
        }

        def gn_step(_, params):
            r, vjp_fn = jax.vjp(res_local, params)

            def matvec(v):
                _, jv = jax.jvp(res_local, (params,), (v,))
                jtv = vjp_fn(jv)[0]
                jtv = jax.tree.map(lambda a: jax.lax.psum(a, axis), jtv)
                return jax.tree.map(lambda a, b: a + cfg.damping * b, jtv, v)

            g = jax.tree.map(lambda a: jax.lax.psum(a, axis), vjp_fn(r)[0])
            dx, _ = jax.scipy.sparse.linalg.cg(
                matvec, jax.tree.map(jnp.negative, g), maxiter=cfg.cg_iters
            )
            return jax.tree.map(lambda p, d: p + d, params, dx)

        params = jax.lax.fori_loop(0, cfg.max_gn_iters, gn_step, params0)
        r = res_local(params)
        cost = 0.5 * jax.lax.psum(jnp.sum(r * r), axis)
        return params["x"], jax.nn.sigmoid(params["s_logit"]), cost

    # global slot index for each loop edge (so every shard addresses its own
    # entries of the replicated switch vector)
    loop_slot = jnp.arange(el_total, dtype=jnp.int32).reshape(el_total, 1)

    return jax.shard_map(
        solve,
        mesh=mesh,
        in_specs=(
            P(),  # x0 anchor (replicated)
            P(axis), P(axis), P(axis), P(axis),  # odo edges sharded
            P(axis), P(axis), P(axis), P(axis),  # loop edges sharded
            P(axis),  # loop slot ids sharded alongside
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(
        graph.xyzyaw[0],
        graph.odo_i, graph.odo_j, graph.odo_meas, graph.odo_valid,
        graph.loop_i, graph.loop_j, graph.loop_meas, graph.loop_valid,
        loop_slot,
    )
