import time, dataclasses, functools, numpy as np, jax, jax.numpy as jnp
from cerebro_tpu import synthworld as sw
from cerebro_tpu.config import VerifyConfig
from cerebro_tpu.geometry import stereo
from cerebro_tpu.ops import features, ransac

world = sw.CircuitWorld.create(seed=0)
ren = sw.Renderer(world)
rig = ren.rig()
cfg = dataclasses.replace(VerifyConfig(), max_features=1024, ransac_hypotheses=128, gms_factor=4.0)
rng = np.random.default_rng(0)
la, ra = ren.stereo(0.0, 0.0)
lb, rb = ren.stereo(0.1, 0.05)
ja, jra, jb, jrb = (jnp.asarray(x, jnp.float32) for x in (la, ra, lb, rb))

def t(fn, *args, n=5, label=""):
    t0 = time.perf_counter()
    o = fn(*args); jax.block_until_ready(o)
    print(f"{label}: compile+1 {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return o

depth_fn = jax.jit(lambda l, r: stereo.depth_pipeline_rectified(l, r, rig))
t(depth_fn, ja, jra, label="stereo depth (1 frame)")
match_multi = jax.jit(functools.partial(features.match_image_pair, max_kp=1024, gms_factor=4.0, oriented=True, scales=cfg.scale_banks))
t(match_multi, ja, jb, label="match multi-octave (default)")
match_plain = jax.jit(functools.partial(features.match_image_pair, max_kp=1024, gms_factor=4.0, oriented=False, scales=(1.0,)))
t(match_plain, ja, jb, label="match plain")
K = 1024
X = jnp.asarray(rng.standard_normal((K,3)).astype(np.float32) + np.array([0,0,5],np.float32))
x2 = X[:, :2] / X[:, 2:3]
valid = jnp.ones((K,), bool)
key = jax.random.PRNGKey(0)
pnp_fn = jax.jit(lambda k: ransac.ransac_pnp(k, X, x2, valid, n_hyp=128, sample_size=4, inlier_thresh=0.03, min_inlier_ratio=0.3, min_points=16))
t(pnp_fn, key, label="ransac_pnp 128 hyp")
icp_fn = jax.jit(lambda k: ransac.ransac_icp(k, X, X, valid, n_hyp=128, sample_size=3, inlier_thresh=0.1, min_inlier_ratio=0.3, min_points=16))
t(icp_fn, key, label="ransac_icp 128 hyp")
