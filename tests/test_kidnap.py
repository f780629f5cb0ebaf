"""Kidnap state machine semantics (ref src/Cerebro.cpp:2235-2475)."""

from cerebro_tpu.config import KidnapConfig
from cerebro_tpu.kidnap import KidnapMonitor

CFG = KidnapConfig()  # threshold 15 feats, sustain 3 s, gap 1 s


def feed_range(mon, t0, t1, n, dt=0.1):
    evs = []
    t = t0
    while t < t1:
        evs += mon.feed(round(t, 5), n)
        t += dt
    return evs


def test_normal_stream_no_events():
    mon = KidnapMonitor(CFG)
    evs = feed_range(mon, 0.0, 10.0, 100)
    assert evs == [] and mon.world_id == 0 and not mon.is_kidnapped()


def test_kidnap_and_recovery_cycle():
    mon = KidnapMonitor(CFG)
    feed_range(mon, 0.0, 5.0, 100)
    evs = feed_range(mon, 5.0, 9.0, 5)  # below threshold for 4 s > 3 s
    kidnaps = [e for e in evs if e.kind == "kidnap"]
    assert len(kidnaps) == 1
    # kidnap event carries the START stamp (ref :2355-2365)
    assert abs(kidnaps[0].stamp - 5.0) < 0.2
    assert mon.is_kidnapped()

    evs = feed_range(mon, 9.0, 10.0, 100)
    recs = [e for e in evs if e.kind == "recover"]
    assert len(recs) == 1
    assert recs[0].world_id == 1  # new world opened
    assert mon.world_id == 1 and not mon.is_kidnapped()
    assert len(mon.intervals) == 1


def test_short_dropout_does_not_trigger():
    mon = KidnapMonitor(CFG)
    feed_range(mon, 0.0, 5.0, 100)
    evs = feed_range(mon, 5.0, 6.5, 5)  # only 1.5 s < 3 s sustain
    evs += feed_range(mon, 6.5, 10.0, 100)
    assert [e for e in evs if e.kind == "kidnap"] == []
    assert mon.world_id == 0


def test_stream_gap_forces_world_change():
    mon = KidnapMonitor(CFG)
    feed_range(mon, 0.0, 5.0, 100)
    evs = mon.feed(8.0, 100)  # 3 s gap > 1 s
    kinds = [e.kind for e in evs]
    assert kinds == ["kidnap", "recover"]
    assert mon.world_id == 1


def test_two_kidnaps_two_worlds():
    mon = KidnapMonitor(CFG)
    feed_range(mon, 0.0, 3.0, 100)
    feed_range(mon, 3.0, 7.0, 3)
    feed_range(mon, 7.0, 10.0, 100)
    feed_range(mon, 10.0, 14.0, 2)
    feed_range(mon, 14.0, 16.0, 100)
    assert mon.world_id == 2
    assert len(mon.intervals) == 2
    info = mon.info()
    assert info["world_id"] == 2 and len(info["intervals"]) == 2
