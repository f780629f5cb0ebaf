import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import DescriptorConfig
from cerebro_tpu.models.descriptor import create_descriptor_model
from cerebro_tpu.parallel import make_mesh
from cerebro_tpu.train import allpair_loss, create_train_state, train_step

SMALL = DescriptorConfig(image_hw=(64, 64), num_channels=1, trunk_dim=64, num_clusters=4)


def test_allpair_loss_orders_correctly():
    # two well-separated clusters of unit descriptors -> near-zero loss;
    # interleaved labels -> positive loss
    d = jnp.eye(4)[:, :4]
    descs = jnp.concatenate([jnp.tile(d[0:1], (2, 1)), jnp.tile(d[1:2], (2, 1))])
    good = allpair_loss(descs, jnp.asarray([0, 0, 1, 1]))
    bad = allpair_loss(descs, jnp.asarray([0, 1, 0, 1]))
    assert float(good) < 1e-6
    assert float(bad) > 0.4


def test_train_step_reduces_loss(rng):
    net, params = create_descriptor_model(SMALL, seed=0)
    state, tx = create_train_state(params, lr=3e-4)
    imgs = rng.integers(0, 255, size=(8, 64, 64, 1)).astype(np.uint8)
    # two "places": first 4 images similar, last 4 similar
    imgs[1:4] = imgs[0] + rng.integers(-6, 6, size=(3, 64, 64, 1)).astype(np.uint8)
    imgs[5:8] = imgs[4] + rng.integers(-6, 6, size=(3, 64, 64, 1)).astype(np.uint8)
    labels = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    x = jnp.asarray(imgs)

    state, loss0 = train_step(net, tx, state, x, labels)
    for _ in range(8):
        state, loss = train_step(net, tx, state, x, labels)
    assert float(loss) < float(loss0)
    assert int(state.step) == 9


def test_train_step_sharded_matches_unsharded(rng):
    net, params = create_descriptor_model(SMALL, seed=0)
    imgs = jnp.asarray(rng.integers(0, 255, size=(8, 64, 64, 1)).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 3, size=(8,)).astype(np.int32))

    state_a, tx = create_train_state(params, lr=1e-3)
    state_b, _ = create_train_state(params, lr=1e-3)
    mesh = make_mesh()

    _, loss_plain = train_step(net, tx, state_a, imgs, labels)
    _, loss_shard = train_step(net, tx, state_b, imgs, labels, mesh=mesh)
    np.testing.assert_allclose(float(loss_plain), float(loss_shard), rtol=2e-3)
