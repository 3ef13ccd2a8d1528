"""TX -> RX loopback self-test (parity: the reference's DEBUG_MIC==1 mode
demodulates your own transmission, sound.c:886-888, 1090-1099)."""

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.oracle import dsp
from quisk_tpu.rx import RxChain, RxChainConfig
from quisk_tpu.tx import TxChain, TxChainConfig

FS = 48000.0
B = 2048


def _loopback(mode, nblk=16, offset_hz=5000.0, **rx_kw):
    tx = TxChain.create(TxChainConfig(channels=1, alc=False,
                                      fm_deviation_hz=5000.0), mode=int(mode))
    rx = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, audio_block=B, agc=False,
                      fm_deviation_hz=5000.0, **rx_kw),
        tune_hz=offset_hz, mode=int(mode))
    voice = sources.voice_like(FS, nblk * B, band=(400.0, 2300.0))
    voice = (0.5 * voice / np.max(np.abs(voice))).astype(np.float32)
    t = np.arange(nblk * B) / FS
    carrier = np.exp(2j * np.pi * offset_hz * t).astype(np.complex64)
    st_tx, st_rx = tx.init_state(), rx.init_state()
    outs = []
    for i in range(nblk):
        sl = slice(i * B, (i + 1) * B)
        st_tx, iq = tx.step(st_tx, voice[None, sl])
        st_rx, audio = rx.step(st_rx, np.asarray(iq) * carrier[None, sl])
        outs.append(np.asarray(audio))
    return voice, np.concatenate(outs, axis=-1)[0]


def test_ssb_tx_rx_roundtrip():
    voice, audio = _loopback(Mode.USB)
    seg = slice(8 * B, 16 * B)
    # band-limit the reference to the shared passband before comparing
    from scipy import signal as sig
    core = sig.firwin(257, [500.0, 2200.0], fs=FS, pass_zero=False)
    v = np.convolve(voice[seg], core, "same")
    a = np.convolve(audio[seg], core, "same")
    snr = dsp.frac_align_snr(v[300:-300], a[300:-300] * np.std(v) / np.std(a),
                             max_lag=2000)
    assert snr > 20.0, snr


def test_fm_tx_rx_roundtrip():
    voice, audio = _loopback(Mode.FM)
    seg = slice(8 * B, 16 * B)
    from scipy import signal as sig
    # FM TX phase-modulates the audio (microphone.c:1253-1258); the RX
    # discriminator differentiates the phase and applies 300 Hz
    # de-emphasis, so the oracle is d/dt(voice) through the same one-pole
    a_de = np.exp(-2.0 * np.pi * 300.0 / FS)
    v_ref = sig.lfilter([1.0 - a_de], [1.0, -a_de],
                        np.diff(voice, prepend=0.0))
    core = sig.firwin(257, [500.0, 2200.0], fs=FS, pass_zero=False)
    v = np.convolve(v_ref[seg], core, "same")
    a = np.convolve(audio[seg], core, "same")
    snr = dsp.frac_align_snr(v[300:-300], a[300:-300] * np.std(v) / np.std(a),
                             max_lag=2000)
    assert snr > 15.0, snr


def test_radio_transmit_keying():
    cfg = RadioConfig(sample_rate=FS, audio_block=B, mode="USB")
    radio = Radio(cfg, hardware="sim")
    radio.open()
    radio.enable_tx()
    radio.set_vox(True)                               # VOX is opt-in
    quiet = np.zeros(radio.tx.block, np.float32)
    loud = (0.3 * np.sin(2 * np.pi * 1000.0 * np.arange(radio.tx.block) / FS)
            ).astype(np.float32)
    assert radio.transmit(quiet) is None              # unkeyed: no TX
    iq = radio.transmit(loud, ptt=True)               # PTT keys it
    assert iq is not None and np.iscomplexobj(iq)
    iq2 = radio.transmit(loud)                        # VOX holds it up
    assert iq2 is not None
    radio.close()
