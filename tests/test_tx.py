"""TX chain tests incl. TX->RX loopback (the reference's DEBUG_MIC==1
self-test demodulates your own transmission, sound.c:1090-1099)."""

import numpy as np
import pytest

from quisk_tpu.modes import Mode
from quisk_tpu.io import sources
from quisk_tpu.oracle import dsp
from quisk_tpu.rx import RxChain, RxChainConfig
from quisk_tpu.tx import TxChain, TxChainConfig

FS = 48000.0
B = 2048


def _stream_tx(tx, audio2d):
    st = tx.init_state()
    outs = []
    for i in range(audio2d.shape[1] // tx.block):
        st, iq = tx.step(st, audio2d[:, i * tx.block:(i + 1) * tx.block])
        outs.append(np.asarray(iq))
    return np.concatenate(outs, axis=-1)


def test_tx_ssb_spectrum_one_sided():
    voice = sources.voice_like(FS, 8 * B).astype(np.float32)
    tx = TxChain.create(TxChainConfig(channels=2, alc=False),
                        mode=[int(Mode.USB), int(Mode.LSB)])
    iq = _stream_tx(tx, np.broadcast_to(voice, (2, len(voice))))
    F = np.fft.fftfreq(4 * B, 1 / FS)
    for c, sign in ((0, 1), (1, -1)):
        X = np.abs(np.fft.fft(iq[c][4 * B: 8 * B]))
        want = X[(sign * F > 300) & (sign * F < 2700)]
        image = X[(-sign * F > 300) & (-sign * F < 2700)]
        assert 20 * np.log10(want.mean() / (image.mean() + 1e-12)) > 40


def test_tx_fm_deviation():
    # FM TX is phase modulation of the bandpassed audio (microphone.c:1253-
    # 1258): a full-scale tone at f gives deviation fm_deviation * f/band_hi.
    f_tone = 1000.0
    tone = np.sin(2 * np.pi * f_tone / FS * np.arange(8 * B)).astype(np.float32)
    tx = TxChain.create(TxChainConfig(channels=1, alc=False,
                                      fm_deviation_hz=2500.0),
                        mode=int(Mode.FM))
    iq = _stream_tx(tx, tone[None])
    # constant envelope
    mag = np.abs(iq[0][B:])
    assert np.max(np.abs(mag - 1.0)) < 1e-3
    # instantaneous frequency peak: PM deviation scales with audio frequency
    want = 2500.0 * f_tone / 2700.0
    dphi = np.angle(iq[0][1:] * np.conj(iq[0][:-1]))
    finst = dphi * FS / (2 * np.pi)
    assert abs(np.max(finst[B:]) - want) < 0.1 * want


def test_tx_fm_ctcss_deviation():
    # CTCSS rides at 15% of total deviation (microphone.c:1247): with no
    # audio, instantaneous frequency is a 100 Hz tone of ~0.15*2500 Hz peak.
    tx = TxChain.create(TxChainConfig(channels=1, alc=False,
                                      fm_deviation_hz=2500.0, ctcss_hz=100.0),
                        mode=int(Mode.FM))
    iq = _stream_tx(tx, np.zeros((1, 8 * B), np.float32))
    dphi = np.angle(iq[0][1:] * np.conj(iq[0][:-1]))
    finst = dphi * FS / (2 * np.pi)
    peak = np.max(np.abs(finst[B:]))
    assert abs(peak - 0.15 * 2500.0) < 0.05 * 2500.0
    # and the tone is at the CTCSS frequency
    X = np.abs(np.fft.rfft(finst[B:B + 4 * B]))
    f = np.fft.rfftfreq(4 * B, 1 / FS)
    assert abs(f[np.argmax(X[1:]) + 1] - 100.0) < 15.0


def test_tx_am_envelope():
    voice = 0.5 * sources.voice_like(FS, 4 * B).astype(np.float32)
    voice /= np.max(np.abs(voice))
    tx = TxChain.create(TxChainConfig(channels=1, alc=False), mode=int(Mode.AM))
    iq = _stream_tx(tx, voice[None])
    env = np.abs(iq[0])
    assert env.min() > -0.01 and env.max() < 1.05


@pytest.mark.parametrize("mode", [Mode.USB, Mode.LSB, Mode.AM, Mode.FM])
def test_tx_rx_loopback(mode):
    nblk = 16
    voice = sources.voice_like(FS, nblk * B, band=(400.0, 2400.0)).astype(np.float32)
    voice *= 0.4 / np.max(np.abs(voice))
    tx = TxChain.create(TxChainConfig(channels=1, alc=False,
                                      fm_deviation_hz=2500.0), mode=int(mode))
    iq = _stream_tx(tx, voice[None]).astype(np.complex64)
    rx = RxChain.create(RxChainConfig(sample_rate=FS, channels=1, agc=False,
                                      fm_deviation_hz=2500.0),
                        tune_hz=[0.0], mode=int(mode))
    st = rx.init_state()
    st, audio = rx.process(st, iq)
    audio = np.asarray(audio)[0]
    if mode == Mode.FM:
        # FM TX phase-modulates the bandpassed audio; the RX discriminator
        # differentiates the phase and applies 300 Hz de-emphasis, so the
        # oracle is d/dt(bandpassed voice) through the same one-pole
        from quisk_tpu.ops import design
        taps = design.bandpass_analytic(513, 300.0, 2700.0, FS)
        _, bp = dsp.fir_stream(voice.astype(np.float64), np.real(taps) * 2.0)
        a = np.exp(-2 * np.pi * 300.0 / FS)
        ref = dsp.one_pole(np.diff(bp, prepend=0.0), a, 1 - a)
    else:
        # TX bandpass limits to 300-2700: compare against the TX's own
        # real bandpassed audio (what actually went on air)
        from quisk_tpu.ops import design
        taps = design.bandpass_analytic(513, 300.0, 2700.0, FS)
        _, ref = dsp.fir_stream(voice.astype(np.float64), np.real(taps) * 2.0)
    snr = dsp.frac_align_snr(ref, audio, skip=4 * B)
    assert snr > 18, (mode, snr)
