"""Whitening PCA (WPCA) descriptor post-projection.

The reference's alternate descriptor pipeline — ReljaNetVLAD — follows
VGG16 + NetVLAD64 with a learned WPCA layer projecting the 32k-dim VLAD
vector to 4096 dims before L2 normalization
(/root/reference/scripts/whole_image_desc_compute_server.py:62-165, the
``white`` conv layer). Whitening is the standard retrieval-quality lever
the raw VLAD vector lacks: it rotates out the globally-correlated
directions (dominated by burstiness/background statistics) and
equalizes variance, so the dot product measures place-specific content.

Here the projection is CLOSED-FORM, fitted on a descriptor bank from the
deployment domain (the reference ships frozen WPCA weights trained
offline; fitting on the target world is the same operation without the
training loop):

    fit:    mean mu, eigvecs U, eigvals L of the bank covariance
            P = U[:, :k] @ diag(1/sqrt(L[:k] + eps))
    apply:  y = L2( (x - mu) @ P )

Fit runs host-side in numpy (a one-time N x D SVD via the N x N gram
trick — the bank is small); apply is one jitted matmul on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WPCAParams:
    mean: jax.Array  # (D,)
    proj: jax.Array  # (D, K) whitened principal directions

    @property
    def out_dim(self) -> int:
        return self.proj.shape[1]


def fit_wpca(
    bank: np.ndarray,
    out_dim: int,
    power: float = 0.0,
    shrinkage: float = 0.1,
    eps: float = 1e-9,
) -> WPCAParams:
    """Fit a (whitening) PCA projection on a (N, D) descriptor bank
    (host-side, once).

    Uses the gram trick (eigendecomposition of the N x N inner-product
    matrix) so fitting 8192-dim descriptors from a few hundred images
    never forms a D x D covariance. out_dim is capped at N - 1 (the rank
    of the centered bank).

    ``power`` controls variance equalization: eigendirection i is scaled
    by 1 / (lambda_i + shrinkage*lambda_0)^power. The reference's WPCA
    weights were TRAINED offline on web-scale data; fitted closed-form on
    a small deployment bank, full whitening (power=0.5) amplifies
    noise-rank directions and SHRINKS the place margin (measured on the
    photo world: raw margin 0.74 -> 0.53 whitened, -> 1.21 with power=0).
    The default is therefore centered PCA projection + renormalization —
    the component of WPCA that actually carries the retrieval gain at
    this bank size; raise power (with a large bank) for true whitening."""
    bank = np.asarray(bank, np.float64)
    n, d = bank.shape
    k = min(out_dim, n - 1, d)
    mu = bank.mean(axis=0)
    x = bank - mu
    # gram trick: x = U S Vt; x @ x.T = U S^2 U.T (N x N)
    g = x @ x.T
    lam, u = np.linalg.eigh(g)  # ascending
    lam, u = lam[::-1][:k], u[:, ::-1][:, :k]
    lam = np.maximum(lam, 0.0)
    s = np.sqrt(lam + eps)
    cov_eig = lam / max(n - 1, 1)  # covariance eigenvalues
    scale = 1.0 / np.power(cov_eig + shrinkage * cov_eig[0] + eps, power)
    # right singular vectors V = x.T @ u / s; fold the variance scaling in
    proj = (x.T @ u) / s[None, :] * scale[None, :]
    return WPCAParams(
        mean=jnp.asarray(mu, jnp.float32), proj=jnp.asarray(proj, jnp.float32)
    )


@jax.jit
def apply_wpca(params: WPCAParams, descs: jax.Array) -> jax.Array:
    """(B, D) descriptors -> (B, K) whitened unit descriptors (one MXU
    matmul; chains after any describe_fn)."""
    y = (descs.astype(jnp.float32) - params.mean) @ params.proj
    return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)


def save_wpca(params: WPCAParams, path: str) -> None:
    np.savez(path, mean=np.asarray(params.mean), proj=np.asarray(params.proj))


def load_wpca(path: str) -> WPCAParams:
    z = np.load(path)
    return WPCAParams(
        mean=jnp.asarray(z["mean"], jnp.float32),
        proj=jnp.asarray(z["proj"], jnp.float32),
    )


def whitened_describe_fn(describe_fn, params: WPCAParams):
    """Wrap a describe_fn so the engine emits WPCA-projected descriptors
    (the ReljaNetVLAD pipeline shape: backbone -> VLAD -> WPCA -> L2)."""

    @functools.wraps(describe_fn)
    def fn(imgs):
        return apply_wpca(params, describe_fn(imgs))

    return fn
