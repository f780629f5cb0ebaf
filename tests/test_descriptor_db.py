import jax.numpy as jnp
import numpy as np

from cerebro_tpu.db import descriptors as ddb


def test_append_and_count():
    db = ddb.create(1024, 64, dtype=jnp.float32)
    assert db.capacity == 1024 and int(db.count) == 0
    batch = jnp.ones((8, 64))
    db = ddb.append(db, batch, jnp.asarray(8))
    assert int(db.count) == 8
    db = ddb.append(db, 2 * batch, jnp.asarray(8))
    assert int(db.count) == 16
    np.testing.assert_allclose(np.asarray(db.vectors[8:16], np.float32), 2.0)


def test_partial_batch_append():
    db = ddb.create(1024, 64, dtype=jnp.float32)
    batch = jnp.arange(8 * 64, dtype=jnp.float32).reshape(8, 64)
    db = ddb.append(db, batch, jnp.asarray(3))
    assert int(db.count) == 3
    # next append lands at row 3, overwriting the over-written tail
    db = ddb.append(db, -batch, jnp.asarray(8))
    assert int(db.count) == 11
    np.testing.assert_allclose(
        np.asarray(db.vectors[3:11], np.float32), np.asarray(-batch, np.float32), atol=1e-2
    )


def test_capacity_saturation():
    db = ddb.create(16, 8)
    batch = jnp.ones((8, 8))
    for _ in range(4):
        db = ddb.append(db, batch, jnp.asarray(8))
    assert int(db.count) == 16  # saturates, no crash


def test_query_limits():
    db = ddb.create(1024, 8)
    db = ddb.append(db, jnp.ones((8, 8)), jnp.asarray(8))
    lims = ddb.query_limits(db, jnp.asarray([0, 60, 100]), exclusion=50)
    np.testing.assert_array_equal(np.asarray(lims), [0, 8, 8])  # clipped to count
    db2 = dataclass_with_count(db, 200)
    lims2 = ddb.query_limits(db2, jnp.asarray([0, 60, 100]), exclusion=50)
    np.testing.assert_array_equal(np.asarray(lims2), [0, 10, 50])


def dataclass_with_count(db, count):
    import dataclasses

    return dataclasses.replace(db, count=jnp.asarray(count, jnp.int32))
