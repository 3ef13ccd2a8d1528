"""Split RX/TX and RIT (parity quisk.py:5783 OnBtnSplit + 2112 ritFreq,
quisk.c:2537-2590 second demod bank + play routings, sound.c:708
tx_mic_phase TX rotation).

RIT shifts the demod tune only; split moves TX to a separate dial, points
demod bank 1 at it with the reference's stereo play options, and (for
soundcard radios that cannot place TX themselves) rotates the outgoing
IQ to the TX offset.
"""

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
from quisk_tpu.hw.base import Hardware
from quisk_tpu.io import sources

FS = 48000.0


class BandHardware(Hardware):
    def __init__(self, iq):
        super().__init__()
        self.iq = iq
        self.pos = 0
        self.freq_calls = []

    def read_samples(self, n):
        if self.pos + n > len(self.iq):
            return None
        out = self.iq[self.pos:self.pos + n]
        self.pos += n
        return out[None]

    def ChangeFrequency(self, tx_freq, vfo_freq, source="", band=""):
        self.freq_calls.append((tx_freq, vfo_freq))
        return super().ChangeFrequency(tx_freq, vfo_freq, source, band)


def _tone_peak_hz(audio, fs=FS):
    seg = np.asarray(audio, np.float64)
    X = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1.0 / fs)[np.argmax(X)]


def _run(radio, blocks):
    outs = []
    for _ in range(blocks):
        a = radio.run_once()
        assert a is not None
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=-1)


def test_rit_shifts_demod_only():
    # USB carrier at +7000, radio tuned to +7000: a 1 kHz audio tone
    # (tone transmitted at carrier+1000); RIT +200 moves the demod tune
    # up so the audio tone drops to 800 Hz while dial/hardware stay put.
    n = 16 * 2048
    iq = sources.tone(8000.0, FS, n).astype(np.complex64) * 0.3
    hw = BandHardware(iq)
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
              hardware=hw)
    audio = _run(r, 4)[0]
    assert abs(_tone_peak_hz(audio[-4096:]) - 1000.0) < 15.0
    hw_calls = len(hw.freq_calls)
    r.set_rit(200.0)
    assert r.rit_on
    audio = _run(r, 4)[0]
    assert abs(_tone_peak_hz(audio[-4096:]) - 800.0) < 15.0
    # dial unchanged, hardware NOT retuned by RIT (quisk.py:5781)
    assert r.freq_hz == 7000.0
    assert len(hw.freq_calls) == hw_calls
    # RIT off restores
    r.set_rit(200.0, on=False)
    audio = _run(r, 4)[0]
    assert abs(_tone_peak_hz(audio[-4096:]) - 1000.0) < 15.0


def test_split_monitor_bank_and_routes():
    # RX voice tone at +7000 (audio 1 kHz), TX monitor at +10000 where a
    # second carrier sits (audio 500 Hz): split play=1 routes the HIGHER
    # frequency (the TX monitor at 10 kHz) to the left ear.
    n = 10 * 2048
    iq = (0.3 * sources.tone(8000.0, FS, n)
          + 0.3 * sources.tone(10500.0, FS, n)).astype(np.complex64)
    hw = BandHardware(iq)
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, channels=2,
                          agc=False), hardware=hw)
    r.set_split(True, tx_freq=10000.0 + r.vfo_hz, play=1)
    assert r.split_rxtx == 1
    assert r.channel_modes[1] == "USB"
    assert r.offsets[1] == 10000.0
    # higher frequency (TX monitor) is left: main goes right
    assert r.routes[0] == "right" and r.routes[1] == "left"
    audio = _run(r, 5)
    stereo = r.mix_stereo(audio[:, -4096:])
    assert abs(_tone_peak_hz(stereo[0]) - 500.0) < 15.0   # left = TX mon
    assert abs(_tone_peak_hz(stereo[1]) - 1000.0) < 15.0  # right = RX
    # hardware was told the TX dial (ChangeHwFrequency(txFreq, VFO))
    assert hw.freq_calls[-1][0] == int(10000.0 + r.vfo_hz)
    # play=4: mono TX monitor only
    r.set_split(True, tx_freq=10000.0 + r.vfo_hz, play=4)
    assert r.routes[0] == "off" and r.routes[1] == "both"
    # split off restores routes and re-syncs TX dial to RX
    r.set_split(False)
    assert r.split_rxtx == 0
    assert r.tx_freq_hz == r.freq_hz
    assert r.routes[0] == "both"


def test_split_tx_rotation_for_soundcard_radios():
    # a hardware that cannot place TX (tx_dds=False): the TX chain IQ is
    # rotated to tx_freq - VFO like sound.c:708 tx_mic_phase
    n = 20 * 2048
    iq = np.zeros(n, np.complex64)
    hw = BandHardware(iq)
    hw.tx_dds = False
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
              hardware=hw)
    r.enable_tx()
    r.set_split(True, tx_freq=r.vfo_hz + 4000.0)
    mic = (0.3 * np.sin(2 * np.pi * 1000.0 *
                        np.arange(r.tx.block) / FS)).astype(np.float32)
    r.set_ptt(True)
    iq_out = None
    for _ in range(4):
        iq_out = r.transmit(mic, ptt=True)
    assert iq_out is not None
    X = np.abs(np.fft.fft(iq_out * np.hanning(len(iq_out))))
    f = np.fft.fftfreq(len(iq_out), 1.0 / FS)
    # USB voice at 1 kHz transmitted at +4 kHz offset -> peak near 5 kHz
    assert abs(f[np.argmax(X)] - 5000.0) < 30.0
    # a DDS radio keeps TX at baseband (hardware moves the dial)
    hw2 = BandHardware(iq)
    r2 = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
               hardware=hw2)
    r2.enable_tx()
    r2.set_split(True, tx_freq=r2.vfo_hz + 4000.0)
    iq2 = None
    for _ in range(4):
        iq2 = r2.transmit(mic, ptt=True)
    X2 = np.abs(np.fft.fft(iq2 * np.hanning(len(iq2))))
    assert abs(f[np.argmax(X2)] - 1000.0) < 30.0


def test_split_default_spacing_and_cat():
    hw = BandHardware(np.zeros(4 * 2048, np.complex64))
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, channels=2,
                          agc=False), hardware=hw)
    st = r._cat_state()
    st.set("split", True)            # hamlib S 1 VFOB
    assert r.split_rxtx and r.tx_freq_hz == r.freq_hz + 3000.0
    st.set("tx_freq", int(r.vfo_hz + 9000.0))   # then I <freq>
    assert r.tx_freq_hz == r.vfo_hz + 9000.0
    assert r.offsets[1] == 9000.0
    st.set("split", False)
    assert not r.split_rxtx
    # Kenwood RIT traffic through the serial protocol object
    from quisk_tpu.app.cat import FlexZZProtocol
    proto = FlexZZProtocol(st)
    proto.handle("RU100")
    proto.handle("RT1")
    assert r.rit_on and r.rit_hz == 100.0
    assert "+00100" in proto.handle("ZZIF")
    proto.handle("RC")
    assert r.rit_hz == 0.0
