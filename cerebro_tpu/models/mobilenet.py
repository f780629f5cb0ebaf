"""Ported MobileNetV1 + NetVLAD descriptor (the reference's flagship model).

This runs the reference's actual trained weights
(`scripts/keras.models/mobilenet_conv7_allpairloss.keras`, selected by
`launch/euroc_vinsfusion.launch:57`, loaded by
`scripts/whole_image_desc_compute_server.py:536-577`) as a TPU-native JAX
program. The architecture is the Keras MobileNetV1 (alpha=1) trunk cut at
``conv_pw_7_relu`` followed by a NetVLAD layer with K=16 clusters over 512
channels -> 8192-dim L2-normalized descriptor (scripts/predict_utils.py:11-79).

Design notes (TPU-first, not a port of the Keras graph):

* **BatchNorm is folded away at weight-port time** (scripts/port_keras_weights.py)
  — inference is conv+bias+relu6 only, so the whole trunk is a chain of
  MXU-friendly convolutions with no running-stat bookkeeping.
* **Asymmetric padding** is preserved exactly: Keras' ``ZeroPadding2D((0,1),(0,1))``
  + valid stride-2 conv becomes an explicit ``[(0,1),(0,1)]`` padding on the
  XLA conv — this is what makes the ported activations bit-comparable.
* **The NetVLAD aggregation keeps the reference's sign convention**: the Keras
  layer computes residuals as ``x + C`` (predict_utils.py:47 ``v = K.expand_dims
  (x,-1) + self.C``), i.e. the trained ``cluster_centers`` tensor stores
  *negated* centers. We aggregate ``V = aᵀf + (Σa)·C`` accordingly.
* Everything is shape-static and fully convolutional: any (H, W) works, and
  the NetVLAD head global-pools, so EuRoC 752x480 gray and the training-time
  240x320 RGB share one program per shape.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (block index, pointwise out-channels, depthwise stride) for the V1 trunk cut
# at conv_pw_7_relu — mirrors the Keras model_config of the flagship .keras.
V1_BLOCKS: Tuple[Tuple[int, int, int], ...] = (
    (1, 64, 1),
    (2, 128, 2),
    (3, 128, 1),
    (4, 256, 2),
    (5, 256, 1),
    (6, 512, 2),
    (7, 512, 1),
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _conv(x, kernel, bias, *, stride=1, padding="SAME", groups=1, dtype=jnp.bfloat16):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y + bias


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def v1_blocks_in(params: Dict[str, jax.Array]) -> Tuple[Tuple[int, int], ...]:
    """(block index, depthwise stride) for the V1 blocks a checkpoint
    actually contains — the reference ships cuts at different depths
    (flagship conv_pw_7, June2019 conv_pw_6_relu variant). Strides follow
    the canonical Keras MobileNetV1 schedule (s2 at dw 2/4/6/12)."""
    idx = sorted(
        int(k[len("conv_dw_"):].split("/")[0])
        for k in params
        if k.startswith("conv_dw_") and k.endswith("/kernel")
    )
    return tuple((i, 2 if i in (2, 4, 6, 12) else 1) for i in idx)


def mobilenet_v1_trunk(params: Dict[str, jax.Array], x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """BN-folded MobileNetV1 trunk: (B,H,W,3) in [-1,1] -> coarse features.

    Keras stride-2 layers use ZeroPadding2D((0,1),(0,1)) + valid conv; we pass
    that padding straight to XLA. The block set comes from the checkpoint
    (see v1_blocks_in) so one program serves every bundled V1 cut.
    """
    asym = [(0, 1), (0, 1)]
    x = _relu6(_conv(x, params["conv1/kernel"], params["conv1/bias"], stride=2, padding=asym, dtype=dtype))
    for i, stride in v1_blocks_in(params):
        dw_k = params[f"conv_dw_{i}/kernel"]
        pad = asym if stride == 2 else "SAME"
        c = dw_k.shape[-1]
        x = _relu6(
            _conv(x, dw_k, params[f"conv_dw_{i}/bias"], stride=stride, padding=pad, groups=c, dtype=dtype)
        )
        x = _relu6(
            _conv(x, params[f"conv_pw_{i}/kernel"], params[f"conv_pw_{i}/bias"], dtype=dtype)
        )
    return x


def netvlad_keras_head(params: Dict[str, jax.Array], feats: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Reference-semantics NetVLAD: (B,h,w,D) -> (B, K*D) unit descriptors.

    Matches scripts/predict_utils.py:36-71 including the ``x + C`` residual
    sign (centers here are (K, D) = keras ``cluster_centers`` transposed).
    """
    B, h, w, D = feats.shape
    f = feats.reshape(B, h * w, D)
    logits = (
        jnp.einsum(
            "bnd,dk->bnk",
            f.astype(dtype),
            params["vlad/assign_w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + params["vlad/assign_b"]
    )
    a = jax.nn.softmax(logits, axis=-1)  # (B, N, K) f32
    af = jnp.einsum(
        "bnk,bnd->bkd",
        a.astype(dtype),
        f.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    a_sum = jnp.sum(a, axis=1)  # (B, K)
    V = af + a_sum[..., None] * params["vlad/centers"][None]  # x + C convention
    V = V / (jnp.linalg.norm(V, axis=-1, keepdims=True) + 1e-12)
    v = V.reshape(B, V.shape[1] * V.shape[2])
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


def _adapt_channels(x: jax.Array, c_model: int) -> jax.Array:
    """Adapt stream channels to the trained model's input channels.

    The reference server instead *asserts* the match and ships per-channel
    model variants (whole_image_desc_compute_server.py:614-619; 240x320x{1,3}
    June2019 models). We lift gray->RGB by replication / RGB->gray by mean so
    one artifact serves both stream types."""
    c_in = x.shape[-1]
    if c_in == c_model:
        return x
    if c_in == 1:
        return jnp.repeat(x, c_model, axis=-1)
    return jnp.mean(x, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("dtype", "input_scale"))
def ported_forward(
    params: Dict[str, jax.Array],
    images_u8: jax.Array,
    dtype=jnp.bfloat16,
    input_scale: str = "raw",
) -> jax.Array:
    """uint8 (B,H,W,C) -> (B, 8192) unit descriptors; one fused XLA program.

    ``input_scale`` is a property of the trained checkpoint, encoded in the
    reference's model names: the flagship ``mobilenet_conv7_allpairloss``
    consumes RAW [0,255] pixels (its conv1_bn running stats are sized for
    that — mean ~1.5e3, var ~3e6), while the June2019 models are named
    ``centeredinput-m1to1-…`` and take the server's (im-128)*2/255
    normalization (whole_image_desc_compute_server.py:629). Feeding the
    flagship centered input collapses every descriptor to ~0.9999 mutual
    similarity; raw input reproduces place-recognition behavior
    (same-place sim >0.84, different-place <0.3).
    """
    x = images_u8.astype(jnp.float32)
    if input_scale == "m1to1":
        x = (x - 128.0) * (2.0 / 255.0)
    elif input_scale != "raw":
        raise ValueError(f"unknown input_scale {input_scale!r}")
    x = _adapt_channels(x, params["conv1/kernel"].shape[2])
    feats = mobilenet_v1_trunk(params, x, dtype=dtype)
    return netvlad_keras_head(params, feats, dtype=dtype)


DEFAULT_ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", "..", "artifacts", "descriptor_ported"
)


def load_ported_params(directory: str = DEFAULT_ARTIFACT):
    """Load a ported-weights artifact (scripts/port_keras_weights.py output).

    Returns (params dict of jnp arrays, meta dict). meta["descriptor_dim"]
    gives the output dimension (8192 for the flagship model).
    """
    with np.load(os.path.join(directory, "params.npz")) as z:
        params = {k: jnp.asarray(v) for k, v in z.items()}
    with open(os.path.join(directory, "meta.json")) as fh:
        meta = json.load(fh)
    return params, meta
