"""CW receive: a carrier on the dial frequency must demodulate to the CW
pitch tone, not DC — the chain applies RIT = -+cw_pitch to the NCO for
CWU/CWL (parity quisk.py:6175-6177 RIT = -+cwTone on CW mode changes)."""

import numpy as np
import pytest

from quisk_tpu.modes import Mode
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 48000.0


def _tone_audio(chain, f_sig, n_blocks=6):
    n = np.arange(n_blocks * chain.block_in)
    iq = np.exp(2j * np.pi * f_sig / FS * n).astype(np.complex64)
    st = chain.init_state()
    st, audio = chain.process(st, iq[None])
    return np.asarray(audio)[0]


def _peak_hz(audio, fs):
    a = audio[len(audio) // 2:]
    X = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / fs)
    return f[np.argmax(X[1:]) + 1]


@pytest.mark.parametrize("mode", [Mode.CWU, Mode.CWL])
def test_cw_carrier_lands_on_pitch(mode):
    chain = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, agc=False, cw_pitch=600.0),
        tune_hz=7000.0, mode=int(mode))
    audio = _tone_audio(chain, 7000.0)
    assert np.sqrt(np.mean(audio ** 2)) > 0.05     # not silence
    assert abs(_peak_hz(audio, chain.fs_audio) - 600.0) < 30.0


def test_cw_rit_applied_on_mode_retune():
    cfg = RxChainConfig(sample_rate=FS, channels=1, agc=False, cw_pitch=600.0)
    chain = RxChain.create(cfg, tune_hz=7000.0, mode=int(Mode.USB))
    chain = chain.retune(cfg, mode=int(Mode.CWU))   # no tune_hz passed
    audio = _tone_audio(chain, 7000.0)
    assert abs(_peak_hz(audio, chain.fs_audio) - 600.0) < 30.0
    # and back to USB restores the plain dial tune (carrier -> DC, filtered)
    chain = chain.retune(cfg, mode=int(Mode.USB))
    audio = _tone_audio(chain, 7500.0)              # 500 Hz above dial
    assert abs(_peak_hz(audio, chain.fs_audio) - 500.0) < 30.0


def test_radio_vfo_split_absolute_cat_frequency():
    """A CAT client sending 7.074 MHz at fs=48k must not wrap the NCO: the
    Radio recenters its VFO and the chain sees a small baseband offset."""
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.app.config import RadioConfig

    cfg = RadioConfig(sample_rate=FS, mode="USB", tune_hz=7_074_000.0)
    radio = Radio(cfg, hardware="sim")
    assert radio.vfo_hz == 7_074_000.0 and radio.cfg.tune_hz == 0.0
    radio.set_frequency(7_075_000.0)    # stays inside the passband
    assert radio.vfo_hz == 7_074_000.0 and radio.cfg.tune_hz == 1000.0
    radio.set_frequency(14_074_000.0)   # band change: VFO must follow
    assert radio.vfo_hz == 14_074_000.0 and radio.cfg.tune_hz == 0.0
