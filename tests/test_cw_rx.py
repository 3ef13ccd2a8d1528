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


# --------------------------- serial CW key / PTT (is_key_down.c parity)
def test_serial_key_bit_mapping():
    from quisk_tpu.app.cw import SerialKey

    bits = {"cts": 0, "dsr": 0}
    key = SerialKey(cts="CW when high", dsr="PTT when low",
                    read_bits=lambda: (bits["cts"], bits["dsr"]))
    assert key.in_use
    # dsr low => PTT asserted ("when low"); cts low => key up
    assert key.poll() == (False, True)
    bits["cts"], bits["dsr"] = 1, 1
    assert key.poll() == (True, False)
    # reversed-polarity CW on DSR
    key2 = SerialKey(dsr="CW when low",
                     read_bits=lambda: (0, bits["dsr"]))
    bits["dsr"] = 0
    assert key2.poll() == (True, False)
    bits["dsr"] = 1
    assert key2.poll() == (False, False)
    # unconfigured bits never assert
    key3 = SerialKey(read_bits=lambda: (1, 1))
    assert not key3.in_use
    assert key3.poll() == (False, False)


def test_serial_key_open_error_and_pty():
    import os
    import pty

    from quisk_tpu.app.cw import SerialKey

    bad = SerialKey("/nonexistent/ttyS99", cts="CW when high")
    assert bad.error and not bad.in_use
    # a pty opens but has no modem bits: polls read all-zero, no crash
    master, slave = pty.openpty()
    k = SerialKey(os.ttyname(slave), cts="CW when high")
    assert k.error == ""
    assert k.poll() == (False, False)
    k.close()
    os.close(master)
    os.close(slave)


def test_radio_serial_key_drives_tx():
    import numpy as np

    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio

    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="CWU",
                      tune_hz=1000.0)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    try:
        radio.enable_tx()
        state = {"down": False}
        radio.enable_serial_key(cts="CW when high",
                                read_bits=lambda: (state["down"], 0))
        mic = np.zeros(radio.tx.block, np.float32)
        assert radio.transmit(mic) is None          # key up: no TX
        state["down"] = True
        iq = radio.transmit(mic)                    # serial key keys the TX
        assert iq is not None and np.max(np.abs(iq)) > 0.1
    finally:
        radio.close()
