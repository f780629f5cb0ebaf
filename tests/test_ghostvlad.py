"""GhostVLAD exercised end-to-end (VERDICT r3 Weak #7): the ghost-cluster
head is trained in-framework on a clutter-heavy place task and shown to do
its one job — absorb uninformative features — rather than merely being
constructible (ref scripts/predict_utils.py:83-155: ghost clusters join
the soft-assignment softmax and are dropped before normalization, so
clutter mass lands on them instead of polluting the real clusters)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cerebro_tpu.config import DescriptorConfig
from cerebro_tpu.models.descriptor import create_descriptor_model
from cerebro_tpu.models.backbones import normalize_image
from cerebro_tpu.train import create_train_state, train_step

HW = (64, 64)
P_PLACES = 6


def _make_dataset(rng, n_views=6):
    """Each place is a distinct low-frequency pattern; every view adds a
    band of pure per-view noise (clutter carrying NO place information)
    over the bottom 40% plus viewpoint jitter."""
    H, W = HW
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs, labels = [], []
    for p in range(P_PLACES):
        fx, fy = rng.uniform(0.05, 0.3, 2)
        ph = rng.uniform(0, 6.28, 2)
        base = 127 + 110 * np.sin(fx * xs + ph[0]) * np.cos(fy * ys + ph[1])
        for _ in range(n_views):
            dy, dx = rng.integers(-4, 5, 2)
            v = np.roll(np.roll(base, dy, 0), dx, 1).copy()
            v[int(0.6 * H):] = rng.integers(0, 255, (H - int(0.6 * H), W))
            imgs.append(np.clip(v, 0, 255).astype(np.uint8)[..., None])
            labels.append(p)
    return np.stack(imgs), np.asarray(labels, np.int32)


def _train(cfg, imgs, labels, steps=120, seed=0):
    net, params = create_descriptor_model(cfg, seed=seed)
    state, tx = create_train_state(params, lr=2e-3)
    rng = np.random.default_rng(seed)
    losses = []
    for s in range(steps):
        pick = rng.choice(len(imgs), size=16, replace=False)
        state, loss = train_step(
            net, tx, state, jnp.asarray(imgs[pick]), jnp.asarray(labels[pick])
        )
        losses.append(float(loss))
    return net, state.params, losses


def _separation(net, params, imgs, labels):
    d = np.asarray(net.apply(params, normalize_image(jnp.asarray(imgs))))
    S = d @ d.T
    same = labels[:, None] == labels[None, :]
    iu = np.triu(np.ones_like(S, bool), 1)
    return float(S[same & iu].mean() - S[~same & iu].mean())


@pytest.fixture(scope="module")
def dataset():
    return _make_dataset(np.random.default_rng(11))


def test_ghostvlad_trains_and_separates(dataset):
    imgs, labels = dataset
    cfg = DescriptorConfig(
        image_hw=HW, num_clusters=8, num_ghost=2, trunk_dim=64
    )
    net, params, losses = _train(cfg, imgs, labels)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    sep = _separation(net, params, imgs, labels)
    assert sep > 0.3, sep


def test_ghost_clusters_absorb_clutter(dataset):
    """After training, the ghost columns must capture MORE softmax mass on
    pure-clutter tokens than on place-signal tokens — the mechanism the
    layer exists for."""
    imgs, labels = dataset
    cfg = DescriptorConfig(
        image_hw=HW, num_clusters=8, num_ghost=2, trunk_dim=64
    )
    net, params, _ = _train(cfg, imgs, labels)

    rng = np.random.default_rng(5)
    H, W = HW
    noise = rng.integers(0, 255, (8, H, W, 1), dtype=np.uint8)  # pure clutter
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    pattern = np.stack(
        [
            np.clip(
                127 + 110 * np.sin(f * xs) * np.cos(f * ys), 0, 255
            ).astype(np.uint8)[..., None]
            for f in np.linspace(0.05, 0.3, 8)
        ]
    )  # place-like signal

    def mean_ghost_mass(batch):
        _, inter = net.apply(
            params, normalize_image(jnp.asarray(batch)),
            mutable=["intermediates"],
        )
        leaves = jax.tree.leaves(inter)
        return float(jnp.mean(leaves[0]))

    gm_noise = mean_ghost_mass(noise)
    gm_pattern = mean_ghost_mass(pattern)
    assert gm_noise > gm_pattern, (gm_noise, gm_pattern)
    assert gm_noise > 0.05, gm_noise  # ghosts actually used on clutter


def test_ghost_selectable_end_to_end(dataset):
    """kind='netvlad' + num_ghost>0 must flow through the PIPELINE config
    path (descriptor dim, DB append, detection) unchanged."""
    from cerebro_tpu.config import CerebroConfig, LoopConfig, RuntimeConfig
    from cerebro_tpu.runtime import CerebroPipeline

    imgs, labels = dataset
    cfg = CerebroConfig(
        descriptor=DescriptorConfig(
            image_hw=HW, num_clusters=8, num_ghost=2, trunk_dim=64,
            kind="netvlad",
        ),
        loop=LoopConfig(db_capacity=512, dot_threshold=0.5),
        runtime=RuntimeConfig(descriptor_batch=4, stash_dir="/tmp/ghost_e2e"),
    )
    pipe = CerebroPipeline(cfg)
    for t in range(12):
        pipe.ingest_frame(float(t), imgs[t % len(imgs), ..., 0],
                          n_tracked=50, is_keyframe=True)
    pipe.flush_descriptors()
    assert len(pipe.db_gid_to_store) == 12
    rows = np.asarray(pipe.db.vectors[:12], np.float32)
    norms = np.linalg.norm(rows, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-2)
