"""Status counters and timing instrumentation."""

import time

import numpy as np

from quisk_tpu.app.status import StatusBoard
from quisk_tpu.io.ratematch import RateServo
from quisk_tpu.utils.profiling import RateMeter, StageTimer


def test_stage_timer_accumulates():
    tm = StageTimer(enabled=True, sync=False)
    tm.start()
    time.sleep(0.01)
    tm.mark("a")
    time.sleep(0.02)
    tm.mark("b")
    tm.start()
    time.sleep(0.01)
    tm.mark("a")
    assert tm.counts["a"] == 2 and tm.counts["b"] == 1
    assert tm.totals["a"] >= 0.018 and tm.totals["b"] >= 0.018
    rep = tm.report()
    assert "a" in rep and "ms/block" in rep
    # disabled timer is free of effects
    off = StageTimer(enabled=False)
    off.start(); off.mark("x")
    assert not off.totals


def test_rate_meter_converges():
    rm = RateMeter(window_secs=0.05)
    rm.add(0)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 0.2:
        rm.add(480)
        n += 1
        time.sleep(0.005)
    assert rm.rate > 0
    assert 0.3 * 480 / 0.005 < rm.rate < 3.0 * 480 / 0.005


def test_status_board_aggregates_components():
    sb = StatusBoard()
    servo = RateServo(buffer_samples=1024)
    sb.attach("audio_out", servo)
    servo.read(64)                       # forces an underrun
    sb.count("fft_overrun")
    sb.count("fft_overrun")
    snap = sb.snapshot()
    assert snap["audio_out.underruns"] == 1
    assert snap["fft_overrun"] == 2
    assert "uptime_secs" in snap
    assert sb.healthy({"fft_overrun": 5})
    assert not sb.healthy({"fft_overrun": 1})
