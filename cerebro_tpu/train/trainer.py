"""Data-parallel descriptor training step.

One jitted SPMD step: batch sharded over the mesh axis, parameters
replicated, gradients all-reduced by XLA (the sharding constraint makes the
psum implicit). This replaces the reference's out-of-repo GPU training
(mpkuse/cartwheel_train, ref README.md:155) with an in-framework TPU path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cerebro_tpu.models.backbones import normalize_image
from cerebro_tpu.models.descriptor import DescriptorNet
from cerebro_tpu.train.loss import allpair_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: dict
    opt_state: tuple
    step: jax.Array


def create_train_state(params, lr: float = 1e-3) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adam(lr)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


@functools.partial(jax.jit, static_argnames=("net", "tx", "mesh", "axis"))
def train_step(
    net: DescriptorNet,
    tx: optax.GradientTransformation,
    state: TrainState,
    images_u8: jax.Array,  # (B, H, W, C) uint8, B divisible by mesh size
    labels: jax.Array,  # (B,) int32 place ids
    mesh: Optional[Mesh] = None,
    axis: str = "db",
) -> Tuple[TrainState, jax.Array]:
    """One DP step. With ``mesh`` given, inputs are constrained to be
    batch-sharded and params replicated; XLA inserts the gradient psum."""
    if mesh is not None:
        images_u8 = jax.lax.with_sharding_constraint(
            images_u8, NamedSharding(mesh, P(axis, None, None, None))
        )
        labels = jax.lax.with_sharding_constraint(labels, NamedSharding(mesh, P(axis)))

    def loss_fn(params):
        desc = net.apply(params, normalize_image(images_u8))
        # NOTE: the all-pairs loss needs the full batch's similarity matrix;
        # descriptors are small (B, D), so gathering them is cheap relative
        # to the conv trunk. XLA sees the replicated-output requirement and
        # inserts the all-gather itself.
        return allpair_loss(desc, labels)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(params=new_params, opt_state=new_opt, step=state.step + 1), loss
