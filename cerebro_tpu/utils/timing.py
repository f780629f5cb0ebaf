"""Per-stage timing metrics.

Replaces the reference's pervasive ElapsedTime tic/toc inline profiling
(src/utils/ElapsedTime.h; e.g. descriptor latency feeding the adaptive skip,
src/Cerebro.cpp:108-118,281) with a structured collector: named stages,
rolling statistics, JSON export, and optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Host wall-clock per stage. JAX dispatch is asynchronous, so a stage
    that launches device work returns before the work finishes; with
    ``sync=False`` (the default, used for throughput runs) a stage measures
    dispatch cost only and device time surfaces at whichever later stage
    first blocks. For honest per-stage device attribution, construct with
    ``sync=True`` (or set ``.sync``) and close each device stage with
    ``sync_point(outputs)`` — the stage then blocks until its device work
    is done before the clock stops."""

    def __init__(self, window: int = 200, sync: bool = False):
        self.window = window
        self.sync = sync
        self._samples: Dict[str, list] = defaultdict(list)

    def sync_point(self, *arrays):
        """Block on device values when sync attribution is on. Call as the
        last statement inside a ``stage()`` block; passes values through."""
        if self.sync:
            import jax

            jax.block_until_ready(arrays)
        return arrays[0] if len(arrays) == 1 else arrays

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            buf = self._samples[name]
            buf.append(dt)
            if len(buf) > self.window:
                del buf[: len(buf) - self.window]

    def record(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    def stats(self, skip_first: int = 0) -> Dict[str, Dict[str, float]]:
        """Per-stage statistics. ``skip_first`` drops that many leading
        samples per stage from the aggregates (the first dispatch of a
        freshly-traced program pays XLA compilation — tens of seconds on a
        TPU — and including it makes mean/p95 describe the compiler, not
        the engine); the excluded warm-up cost is still reported as
        ``first_ms`` so the compile time stays visible."""
        out = {}
        for name, buf in self._samples.items():
            if not buf:
                continue
            steady = buf[skip_first:] if len(buf) > skip_first else buf
            s = sorted(steady)
            out[name] = {
                "count": len(steady),
                "mean_ms": 1e3 * sum(steady) / len(steady),
                "p50_ms": 1e3 * s[len(s) // 2],
                "p95_ms": 1e3 * s[int(len(s) * 0.95)],
                "last_ms": 1e3 * steady[-1],
            }
            if skip_first and len(buf) > skip_first:
                out[name]["first_ms"] = 1e3 * buf[0]
                out[name]["warmup_excluded"] = skip_first
        return out

    def estimated_ms(self, name: str) -> Optional[float]:
        """Rolling mean latency — the reference's est_compute_time used by
        its load-shedding policy (src/Cerebro.cpp:193-203)."""
        buf = self._samples.get(name)
        if not buf:
            return None
        return 1e3 * sum(buf) / len(buf)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
