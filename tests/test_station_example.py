"""Station-automation example: composed Hardware fan-out (n2adr parity).

The reference's n2adr/quisk_hardware.py composes the HiQSDR plugin with
shack accessories (antenna tuner, filter boxes, control box) and forwards
ChangeFrequency/ChangeBand/HeartBeat/PTT to each.  The example reproduces
that pattern on the quisk_tpu Hardware API; this test pins the fan-out.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from station_automation import StationHardware  # noqa: E402

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio


def _radio():
    cfg = RadioConfig(sample_rate=48000.0, mode="USB", audio_block=2048)
    hw = StationHardware(cfg)
    return Radio(cfg, hardware=hw), hw


def test_tuner_follows_qsy():
    radio, hw = _radio()
    hw.open()
    radio.set_frequency(7_074_000)
    assert hw.anttuner.tune_count == 1
    radio.set_frequency(7_076_000)          # within the matched window
    assert hw.anttuner.tune_count == 1
    radio.set_frequency(7_200_000)          # out of window -> re-tune
    assert hw.anttuner.tune_count == 2
    assert hw.tx_frequency == 7_200_000     # base plugin still updated


def test_band_change_switches_filter_and_resets_tuner():
    radio, hw = _radio()
    radio.set_band("20")
    assert hw.filterbox.relay == hw.filterbox.BANDS["20"]
    assert hw.anttuner.tuned_hz is not None   # set_band tunes the center
    before = hw.anttuner.tune_count
    radio.set_band("40")
    radio.set_frequency(7_074_000)
    assert hw.anttuner.tune_count > before    # band change forced a re-tune


def test_ptt_interlock_and_heartbeat_and_samples():
    radio, hw = _radio()
    hw.open()
    hw.OnButtonPTT(True)
    assert hw.controlbox.tx_enabled
    hw.OnButtonPTT(False)
    assert not hw.controlbox.tx_enabled
    hw.HeartBeat()
    hw.HeartBeat()
    assert hw.controlbox.heartbeat_count == 2
    audio = radio.run_once()                 # sample plane delegates to sim
    assert audio is not None and np.all(np.isfinite(audio))
