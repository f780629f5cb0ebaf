#!/usr/bin/env python
"""Live-rate soak with the real model on the real chip (VERDICT r2 #9).

Drives CerebroService at the reference's live camera rate — 20 Hz
(ref README.md:11-12), 240x320 stereo-left frames, the PORTED flagship
descriptor — for ``--seconds`` of stream time, pushing frames in real time
from a producer thread. Passes when:

  * zero descriptor shedding (the engine keeps up with the camera),
  * ingest backlog stays bounded (never grows past a few batches),
  * every eligible keyframe described.

The reference runs this live on ~2 desktop CPU cores with a GPU descriptor
server at ~30 ms/frame (README.md:157-165). Emits one JSON line; --out
writes SOAK_LIVE.json.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NS = 1_000_000_000


def run(seconds: float, rate_hz: float, cpu: bool, out: str | None):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.config import (
        CerebroConfig,
        DescriptorConfig,
        LoopConfig,
        RuntimeConfig,
    )
    from cerebro_tpu.runtime import CerebroPipeline, CerebroService

    n_frames = int(seconds * rate_hz)
    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(sw.IMG_H, sw.IMG_W), kind="ported"),
        loop=LoopConfig(db_capacity=4096),
        runtime=RuntimeConfig(
            descriptor_batch=8,  # 0.4 s of stream at 20 Hz — low latency
            stash_dir="/tmp/soak_live_stash",
            image_ram_window_s=10.0,
        ),
    )
    seq = sw.make_sequence(n_frames=n_frames, laps=2.0)
    world = sw.CircuitWorld.create(seed=0)
    ren = sw.Renderer(world)
    # pre-render so the host producer can hold a 20 Hz pace
    frames = [ren.render(seq.xy[i, 0], seq.xy[i, 1]) for i in range(n_frames)]

    pipe = CerebroPipeline(cfg)
    # warm the compile outside the soak (a long-running engine compiles once)
    import jax.numpy as jnp

    pipe.describe_fn(jnp.asarray(np.stack(frames[:8])[..., None]))

    svc = CerebroService(pipe, hold_s=0.05)
    svc.start()

    backlog_samples = []
    t_start = time.perf_counter()

    def producer():
        for i in range(n_frames):
            target = t_start + i / rate_hz
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            ns = int((1.0 + i / rate_hz) * NS)
            svc.push_image(ns, frames[i])
            # healthy tracking throughout: the soak measures sustained rate,
            # not kidnap handling (which would make frames ineligible)
            svc.push_tracking(ns, 100, is_keyframe=True)
        svc.push_image(int(1e6 * NS), np.zeros_like(frames[0]))  # flush horizon

    th = threading.Thread(target=producer)
    th.start()
    while th.is_alive():
        # sync-free sampling: full status() would drain device detection
        # results (a blocking host fetch) every tick and starve the stream
        backlog_samples.append(
            int(svc.ingest.engine.pending) + len(pipe._pending_desc)
        )
        time.sleep(0.1)
    th.join()
    wall = time.perf_counter() - t_start
    svc.stop()
    st = svc.status()

    report = {
        "device": jax.devices()[0].platform,
        "rate_hz": rate_hz,
        "n_frames": n_frames,
        "stream_seconds": round(seconds, 1),
        "wall_seconds": round(wall, 1),
        "described": st["described"],
        "shed_descriptors": st["shed_descriptors"],
        "max_backlog_frames": int(max(backlog_samples, default=0)),
        "loop_edges": st["loop_edges"],
        "descriptor": "ported (mobilenet_conv7_allpairloss)",
        "image_hw": [sw.IMG_H, sw.IMG_W],
        "realtime_factor": round(seconds / wall, 3),
        "pass": bool(
            st["shed_descriptors"] == 0
            and st["described"] >= n_frames
            and max(backlog_samples, default=0) <= 8 * cfg.runtime.descriptor_batch
            # the producer must actually have held the camera rate: a wall
            # time much beyond the stream length means pushes were starved
            and wall <= seconds * 1.25 + 10.0
        ),
    }
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not report["pass"]:
        raise SystemExit(1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--rate", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run(args.seconds, args.rate, args.cpu, args.out)


if __name__ == "__main__":
    main()
