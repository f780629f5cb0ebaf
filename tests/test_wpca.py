"""WPCA whitening projection (the reference's ReljaNetVLAD post-stage:
VGG16 + NetVLAD64 + WPCA -> 4096, whole_image_desc_compute_server.py:62-165)
and the VGG16-style backbone cut (keras_helpers.py:231-336)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "descriptor_ported"
)


def test_wpca_whitens_and_projects(tmp_path, rng):
    from cerebro_tpu.models.wpca import apply_wpca, fit_wpca, load_wpca, save_wpca

    # anisotropic bank: a few dominant correlated directions
    n, d, k = 96, 256, 32
    basis = rng.normal(size=(8, d))
    bank = rng.normal(size=(n, 8)) @ basis * 5.0 + rng.normal(size=(n, d))
    wp = fit_wpca(bank, out_dim=k, power=0.5, shrinkage=0.0)
    assert wp.proj.shape == (d, k) and wp.out_dim == k

    # full whitening (power=0.5): projected (pre-norm) bank has ~identity
    # covariance
    x = (bank - np.asarray(wp.mean)) @ np.asarray(wp.proj)
    cov = np.cov(x.T)
    np.testing.assert_allclose(np.diag(cov), 1.0, atol=0.1)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.1

    # applied descriptors are unit-norm; save/load round-trips
    y = np.asarray(apply_wpca(wp, bank[:5]))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, atol=1e-5)
    save_wpca(wp, str(tmp_path / "wpca.npz"))
    back = load_wpca(str(tmp_path / "wpca.npz"))
    np.testing.assert_allclose(np.asarray(apply_wpca(back, bank[:5])), y, atol=1e-6)

    # rank cap: out_dim larger than the bank rank is clipped, not NaN
    wp2 = fit_wpca(bank[:16], out_dim=k)
    assert wp2.out_dim == 15
    assert np.isfinite(np.asarray(apply_wpca(wp2, bank[:4]))).all()

    # default (power=0) is centered PCA projection: directions keep their
    # relative variance instead of being equalized
    wp0 = fit_wpca(bank, out_dim=k)
    x0 = (bank - np.asarray(wp0.mean)) @ np.asarray(wp0.proj)
    v = np.var(x0, axis=0)
    assert v[0] > 5 * v[-1]


def test_vgg_backbone_descriptor():
    import jax.numpy as jnp

    from cerebro_tpu.config import DescriptorConfig
    from cerebro_tpu.models.descriptor import create_descriptor_model, describe_batch

    cfg = DescriptorConfig(
        image_hw=(48, 64), backbone="vgg16", num_clusters=4, trunk_dim=128
    )
    net, params = create_descriptor_model(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 48, 64, 1), dtype=np.uint8)
    )
    d = np.asarray(describe_batch(net, params, imgs))
    assert d.shape == (2, 4 * 128)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
    d2 = np.asarray(describe_batch(net, params, imgs))
    np.testing.assert_array_equal(d, d2)


@pytest.mark.skipif(not os.path.isdir(ARTIFACT), reason="no ported artifact")
def test_wpca_retrieval_ab_photo_world(tmp_path):
    """Retrieval A/B on the photo world: WPCA fitted on a domain bank must
    not lose the ported descriptor's same/different-place margin while
    cutting the dimension 8192 -> 256 (32x less DB memory + search FLOPs
    per row). Whitening typically WIDENS the margin by rotating out the
    globally-correlated background directions."""
    import jax.numpy as jnp

    from cerebro_tpu import photoworld as pw
    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.models.mobilenet import load_ported_params, ported_forward
    from cerebro_tpu.models.wpca import apply_wpca, fit_wpca

    params, meta = load_ported_params(ARTIFACT)
    world = pw.PhotoWorld.create(seed=0)
    ren = sw.Renderer(world)
    R = pw.PHOTO_RADIUS_M
    scale = meta.get("input_scale", "raw")

    def describe(pts):
        imgs = np.stack(
            [np.repeat(ren.render(x, y)[..., None], 3, -1) for x, y in pts]
        ).astype(np.float32)
        out = []
        for i in range(0, len(imgs), 16):
            out.append(
                np.asarray(
                    ported_forward(
                        params, jnp.asarray(imgs[i : i + 16]), input_scale=scale
                    )
                )
            )
        return np.concatenate(out)

    rng = np.random.default_rng(1)
    # fit bank: 96 random annulus spots (deployment-domain statistics)
    ths = rng.uniform(0, 2 * np.pi, 96)
    rrs = rng.uniform(R - 2, R + 2, 96)
    bank = describe(list(zip(rrs * np.cos(ths), rrs * np.sin(ths))))
    wp = fit_wpca(bank, out_dim=256)

    # held-out probes: anchor / 0.3 m revisit / antipode
    pth = rng.uniform(0, 2 * np.pi, 16)
    anchors = describe([(R * np.cos(t), R * np.sin(t)) for t in pth])
    revisit = describe([(R * np.cos(t) - 0.05, R * np.sin(t) + 0.3) for t in pth])
    antipode = describe([(-R * np.cos(t), -R * np.sin(t)) for t in pth])

    def margin(a, r, n):
        same = np.sum(a * r, -1)
        diff = np.sum(a * n, -1)
        return float(same.mean() - diff.mean()), float(same.mean()), float(diff.mean())

    m_raw, s_raw, d_raw = margin(anchors, revisit, antipode)
    aw, rw, nw = (np.asarray(apply_wpca(wp, x)) for x in (anchors, revisit, antipode))
    m_wpca, s_wpca, d_wpca = margin(aw, rw, nw)

    # the projection must WIDEN the margin while compressing 8192 -> <=95
    # dims (86x less DB memory + search FLOPs per row); measured: raw
    # 0.74 -> projected 1.16 at this bank size
    assert m_wpca > m_raw, (m_raw, m_wpca)
    assert s_wpca > d_wpca + 0.5, (s_wpca, d_wpca)
    # same-place similarity stays on the raw scale, so the engine's 0.85
    # dot threshold keeps its meaning after projection
    assert s_wpca > 0.7, s_wpca


def test_pipeline_wpca_wiring(tmp_path, rng):
    """DescriptorConfig.wpca_artifact chains the projection into the
    engine: the DB runs at the projected dimension and ingest works."""
    import jax.numpy as jnp

    from cerebro_tpu.config import CerebroConfig, DescriptorConfig, LoopConfig
    from cerebro_tpu.models.gist import gist_descriptors
    from cerebro_tpu.models.wpca import fit_wpca, save_wpca
    from cerebro_tpu.runtime import CerebroPipeline

    # fit on a bank of gist descriptors of random frames
    imgs = rng.integers(0, 255, (40, 32, 64, 1), dtype=np.uint8)
    bank = np.asarray(gist_descriptors(jnp.asarray(imgs), dim=128))
    wp = fit_wpca(bank, out_dim=16)
    path = str(tmp_path / "wpca.npz")
    save_wpca(wp, path)

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(
            image_hw=(32, 64), kind="gist", num_clusters=1, trunk_dim=128,
            wpca_artifact=path,
        ),
        loop=LoopConfig(db_capacity=128),
    )
    pipe = CerebroPipeline(cfg)
    assert pipe.db.vectors.shape[1] == wp.out_dim
    for t in range(6):
        pipe.ingest_frame(float(t), imgs[t, :, :, 0], n_tracked=50)
    pipe.flush_descriptors()
    assert len(pipe.db_gid_to_store) == 6
    rows = np.asarray(pipe.db.vectors)[:6]
    # DB rows are stored at reduced precision; allow rounding in the norm
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, atol=5e-3)
