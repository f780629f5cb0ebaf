#!/bin/bash
# run twice; second run should compile much faster if the cache works
python - <<'PY'
import time, numpy as np, jax, jax.numpy as jnp
from cerebro_tpu.runtime import enable_compilation_cache
d = enable_compilation_cache("/tmp/xla_cache_test")
import functools
from cerebro_tpu.ops import features
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((240, 320)).astype(np.float32))
t0 = time.perf_counter()
m = jax.jit(functools.partial(features.match_image_pair, max_kp=1024, oriented=True,
                              scales=(0.5, 0.70710678, 1.0, 1.41421356)))(img, img)
jax.block_until_ready(m.valid)
print(f"compile+run: {time.perf_counter()-t0:.1f} s; cache dir files:", end=" ")
import os
print(sum(len(f) for _,_,f in os.walk(d)))
PY
