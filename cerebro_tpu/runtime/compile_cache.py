"""Persistent XLA compilation cache.

The verification program compiles in 25-50 s per batch shape on the chip
(BENCH_STAGES.json `compile_s_first_call`) and the whole engine has a
handful of such programs. A long-running service pays this once per
process; enabling JAX's persistent cache makes it once per MACHINE —
subsequent engine starts, benches, and relocalization sessions reuse the
serialized executables. The reference has no analog (its hot code is
ahead-of-time C++); this is the JAX-native equivalent of shipping
compiled binaries.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    cache_dir: str | None = None, min_compile_secs: float = 1.0
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/cerebro_tpu/xla``). Safe to call multiple times; returns the
    directory in use. Call BEFORE the first jit execution for full effect —
    already-compiled programs in this process are not retro-cached."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "cerebro_tpu", "xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    # cache across minor jax/runtime updates is keyed internally; nothing
    # else to configure
    return cache_dir
