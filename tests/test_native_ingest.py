"""Native C++ ingest engine: build, semantics, differential vs Python model,
and thread-safety smoke."""

import threading

import numpy as np
import pytest

from cerebro_tpu.native import NativeIngest, PyIngest, make_ingest


def has_native():
    try:
        NativeIngest()
        return True
    except RuntimeError:
        return False


pytestmark = pytest.mark.skipif(not has_native(), reason="g++ unavailable")

NS = int(1e9)


def test_basic_association():
    ing = NativeIngest(tol_s=1e-3, hold_s=0.1)
    T = np.eye(4)
    T[0, 3] = 1.5
    ing.push_image(1 * NS)
    ing.push_image(1 * NS + 200_000, is_right=True)  # 0.2 ms off -> same frame
    ing.push_pose(1 * NS + 500_000, T)  # 0.5 ms off -> associates
    ing.push_tracking(1 * NS - 300_000, 42, True)
    ing.push_image(2 * NS)  # advances newest past hold
    out = ing.drain()
    assert len(out) == 1
    f = out[0]
    assert f["has_left"] and f["has_right"] and f["has_tracking"]
    assert f["pose"] is not None and abs(f["pose"][0, 3] - 1.5) < 1e-12
    assert f["n_tracked"] == 42 and f["is_keyframe"]
    assert ing.pending == 1  # the 2 s frame still held


def test_out_of_order_and_late_pose():
    ing = NativeIngest(hold_s=0.5)
    # images arrive out of order; poses arrive late
    for s in [3, 1, 2]:
        ing.push_image(s * NS)
    for s in [1, 2, 3]:
        T = np.eye(4)
        T[1, 3] = s
        ing.push_pose(s * NS + 100_000, T)
    ing.push_image(10 * NS)
    out = ing.drain()
    assert [f["stamp_ns"] for f in out] == [1 * NS, 2 * NS, 3 * NS]
    for k, f in enumerate(out):
        assert f["pose"][1, 3] == k + 1


def test_gap_counter():
    ing = NativeIngest(gap_s=1.0)
    ing.push_image(1 * NS)
    ing.push_image(int(1.1 * NS))
    assert ing.gap_count == 0
    ing.push_image(5 * NS)  # 3.9 s gap
    assert ing.gap_count == 1


def test_differential_vs_python_model(rng):
    """Random interleaved feeds: native and Python models must emit the
    same assembled frames."""
    nat = NativeIngest(tol_s=1e-3, hold_s=0.2)
    py = PyIngest(tol_s=1e-3, hold_s=0.2)
    stamps = np.sort(rng.integers(0, 10 * NS, 200))
    ops = []
    for s in stamps:
        s = int(s)
        jitter = int(rng.integers(-500_000, 500_000))
        ops.append(("img", s, False))
        if rng.random() < 0.8:
            T = np.eye(4)
            T[0, 3] = s * 1e-9
            ops.append(("pose", s + jitter, T))
        if rng.random() < 0.7:
            ops.append(("trk", s + jitter, int(rng.integers(0, 200)), bool(rng.random() < 0.5)))
    rng.shuffle(ops)
    for op in ops:
        if op[0] == "img":
            nat.push_image(op[1], op[2])
            py.push_image(op[1], op[2])
        elif op[0] == "pose":
            nat.push_pose(op[1], op[2])
            py.push_pose(op[1], op[2])
        else:
            nat.push_tracking(op[1], op[2], op[3])
            py.push_tracking(op[1], op[2], op[3])
    a = nat.drain(max_out=500)
    b = py.drain(max_out=500)
    assert len(a) == len(b) and len(a) > 50
    for fa, fb in zip(a, b):
        assert fa["stamp_ns"] == fb["stamp_ns"]
        assert fa["has_tracking"] == fb["has_tracking"]
        assert (fa["pose"] is None) == (fb["pose"] is None)
        if fa["pose"] is not None:
            np.testing.assert_allclose(fa["pose"], fb["pose"])


def test_threaded_feeds():
    ing = NativeIngest(hold_s=0.0, capacity=100000)
    n_per = 500

    def feed_images():
        for i in range(n_per):
            ing.push_image((i + 1) * NS)

    def feed_poses():
        for i in range(n_per):
            ing.push_pose((i + 1) * NS + 100, np.eye(4))

    threads = [threading.Thread(target=feed_images), threading.Thread(target=feed_poses)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = []
    while True:
        got = ing.drain(max_out=256)
        if not got:
            break
        total += got
    assert len(total) == n_per - 0 or len(total) >= n_per - 1  # last may be held
    assert ing.dropped == 0


def test_make_ingest_returns_something():
    ing = make_ingest()
    ing.push_image(NS)
    assert ing.pending == 1


def test_stream_ingestor_feeds_pipeline(tmp_path):
    """Threaded producer -> native association -> pipeline consumer."""
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import small_config
    from cerebro_tpu.runtime import CerebroPipeline, StreamIngestor

    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg)  # no rig: detection only
    ing = StreamIngestor(pipe, hold_s=0.05)
    rng = np.random.default_rng(0)

    def producer():
        for i in range(20):
            s = (i + 1) * NS
            img = rng.integers(0, 255, (240, 320)).astype(np.uint8)
            ing.push_image(s, img)
            ing.push_pose(s + 100_000, np.eye(4))
            ing.push_tracking(s - 100_000, 100, True)

    th = threading.Thread(target=producer)
    th.start()
    th.join()
    ing.push_image(30 * NS, np.zeros((240, 320), np.uint8))  # advance horizon
    fed = ing.pump()
    assert fed == 20
    pipe.flush_descriptors()
    st = pipe.status()
    assert st["frames"] == 20
    assert st["described"] == 20
    assert pipe.store.pose_valid[:20].all()


def test_service_live_loop(tmp_path):
    """CerebroService: concurrent producers while the worker processes -
    the full cerebro_node-process equivalent running live."""
    import sys, time
    sys.path.insert(0, "tests")
    from test_pipeline import small_config, stereo_images, camera_pose
    from test_verify import big_texture, make_rig
    from cerebro_tpu.runtime import CerebroPipeline, CerebroService

    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())
    svc = CerebroService(pipe, verify_every_s=0.1, optimize_every_s=0.5, hold_s=0.05)

    tex = big_texture(np.random.default_rng(11), n=4096)
    frames = [stereo_images(tex, camera_pose(i)) for i in range(14)]

    svc.start()

    def producer():
        t = 1.0
        for i in range(14):
            la, ra = frames[i]
            ns = int(t * 1e9)
            svc.push_image(ns, la)
            svc.push_image(ns, ra, is_right=True)
            svc.push_pose(ns + 100_000, camera_pose(i).astype(np.float64))
            svc.push_tracking(ns - 100_000, 100)
            t += 1.0
            time.sleep(0.01)
        t = 30.0
        for i in range(2, 6):
            la, ra = frames[i]
            ns = int(t * 1e9)
            svc.push_image(ns, la)
            svc.push_image(ns, ra, is_right=True)
            svc.push_pose(ns + 100_000, camera_pose(14 + i - 2).astype(np.float64))
            svc.push_tracking(ns - 100_000, 100)
            t += 1.0
            time.sleep(0.01)
        # horizon advance so the hold window releases the last frames
        svc.push_image(int(60 * 1e9), np.zeros_like(frames[0][0]))

    th = threading.Thread(target=producer)
    th.start()
    th.join()
    time.sleep(1.0)  # let the worker catch up
    svc.stop(save_dir=str(tmp_path / "svc_state"))

    st = svc.status()
    assert st["frames"] >= 18
    assert st["loop_edges"] >= 1, st
    assert svc.latest_trajectory is not None
    import os
    assert os.path.exists(tmp_path / "svc_state" / "manifest.json")
