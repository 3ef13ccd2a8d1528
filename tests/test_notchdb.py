"""Manual notch database (wdsp/nbp.c parity): carve depth, tune
tracking, persistence, and data-only application."""

import numpy as np

from quisk_tpu.app.config import RadioConfig, Settings
from quisk_tpu.app.notchdb import NotchDB
from quisk_tpu.app.radio import Radio
from quisk_tpu.ops import design


def _tone_power_db(radio: Radio, tone_hz: float, blocks: int = 6) -> float:
    """Feed a tone at an absolute RF offset through the radio's sim
    hardware and return its audio power in dB."""
    radio.hw.tone_hz = tone_hz
    audio = radio.run(blocks=blocks)[0]
    audio = audio[audio.size // 2:]                  # settled half
    return 10.0 * np.log10(np.mean(audio ** 2) + 1e-30)


def test_design_notch_depth_and_passband():
    fs = 48000.0
    taps = design.bandpass_with_notches(1025, 300.0, 2700.0, fs,
                                        [(1000.0, 120.0)])
    w = np.fft.fftfreq(8192, 1.0 / fs)
    H = np.abs(np.fft.fft(taps, 8192))
    at = lambda f: H[np.argmin(np.abs(w - f))]
    # exact null at the notch center (responses subtract, both unity there)
    assert 20 * np.log10(at(1000.0) + 1e-12) < -60.0
    # passband away from the notch untouched
    assert abs(20 * np.log10(at(600.0))) < 1.0
    assert abs(20 * np.log10(at(2200.0))) < 1.0
    # out-of-band notch is a no-op
    t2 = design.bandpass_with_notches(1025, 300.0, 2700.0, fs,
                                      [(5000.0, 120.0)])
    np.testing.assert_allclose(t2, design.bandpass_analytic(
        1025, 300.0, 2700.0, fs), atol=0)


def test_radio_notch_carves_and_tracks_tune():
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=10000.0, agc=False)
    r = Radio(cfg, hardware="sim")
    r.open()
    try:
        # interferer at +1 kHz into the USB passband
        clean = _tone_power_db(r, 11000.0)
        r.add_notch(11000.0, width_hz=150.0)
        notched = _tone_power_db(r, 11000.0)
        assert clean - notched > 30.0, (clean, notched)
        # data-only: same compiled step object, state carried
        # retune moves the passband; the notch tracks the ABSOLUTE freq
        r.set_frequency(9000.0)              # notch now at +2 kHz baseband
        tracked = _tone_power_db(r, 11000.0)
        assert clean - tracked > 30.0, (clean, tracked)
        # a tone NOT on the notch passes at full level
        passband = _tone_power_db(r, 10000.0)
        assert passband > clean - 6.0
        # removing restores the response
        r.remove_notch(11000.0)
        restored = _tone_power_db(r, 11000.0)
        assert clean - restored < 3.0, (clean, restored)
    finally:
        r.close()


def test_notchdb_persistence_roundtrip(tmp_path):
    p = tmp_path / "settings.json"
    s = Settings(path=str(p))
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=10000.0, agc=False)
    r = Radio(cfg, hardware="sim", settings=s)
    r.open()
    r.add_notch(11000.0, width_hz=150.0)
    r.run(blocks=1)
    r.close()                                 # saves settings

    s2 = Settings(path=str(p))
    r2 = Radio(RadioConfig(sample_rate=48000.0, audio_block=2048,
                           mode="USB", tune_hz=10000.0, agc=False),
               hardware="sim", settings=s2)
    r2.open()
    try:
        assert len(r2.notch_db) == 1
        assert r2.notch_db.notches[0].freq_hz == 11000.0
        notched = _tone_power_db(r2, 11000.0)
        clean = _tone_power_db(r2, 10500.0)
        assert clean - notched > 25.0, (clean, notched)
    finally:
        r2.close()


def test_notchdb_unit():
    db = NotchDB()
    db.add(7100000.0, 80.0)
    db.add(7150000.0, 80.0)
    db.set_active(7150000.0, False)
    bb = db.baseband(7099000.0)
    assert bb == ((1000.0, 80.0),)           # inactive entry dropped
    assert db.remove(7150000.0) == 1
    rt = NotchDB.from_list(db.to_list())
    assert len(rt) == 1 and rt.notches[0].freq_hz == 7100000.0
