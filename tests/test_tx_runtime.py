"""Full-duplex block loop: key-down TX integration + live mic capture.

Parity targets: the reference's ONE sound-loop iteration does RX and TX —
on key-down the RX audio is replaced by sidetone/silence under 5 ms
envelopes (quisk.c:2371-2433), key-up restores RX click-free
(quisk.c:2711-2738), and the mic section runs mic -> TX DSP -> hardware
IQ (sound.c:1034-1186).  Capture-side audio: sound.c:1034-1094 +
microphone.c:1105-1122 (achieved-rate measurement).
"""

import time

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio

FS = 48000.0
B = 2048


def _rms(x):
    return float(np.sqrt(np.mean(np.square(np.asarray(x, np.float64)))))


def test_audio_capture_file_mic_rate_and_starvation():
    from quisk_tpu.io.audio_in import AudioCapture, ClockedFileMic

    data = np.arange(4800, dtype=np.float32) / 4800.0
    cap = AudioCapture(ClockedFileMic(data, 16000.0, loop=True), 16000.0)
    cap.start()
    time.sleep(0.25)
    blk = cap.get(1600)
    assert len(blk) == 1600
    # samples arrive in file order (the ramp is monotone before the wrap)
    assert np.allclose(np.diff(blk[:100]), 1.0 / 4800.0, atol=1e-6)
    rate = cap.measured_rate()
    assert 0.6 * 16000.0 < rate < 1.4 * 16000.0, rate
    cap.get(10 * 16000)            # far beyond what real time provided
    assert cap.starved >= 1
    assert cap.stats()["captured"] > 0
    cap.stop()


def test_half_duplex_cw_session():
    """A keyed CW session inside run_once: sidetone + TX IQ while keyed,
    RX resumes after key-up, and no block edge ever clicks."""
    cfg = RadioConfig(sample_rate=FS, audio_block=B, mode="CWU",
                      tune_hz=10000.0)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    radio.enable_tx(sidetone_level=0.3)
    writes = []
    radio.hw.write_samples = lambda iq: writes.append(np.asarray(iq))
    schedule = [False] * 4 + [True] * 6 + [False] * 6
    blocks = []
    for k in schedule:
        radio.set_cw_key(k)
        blocks.append(radio.run_once()[0])
    audio = np.concatenate(blocks)

    assert _rms(audio[: 3 * B]) > 0.05          # RX only: signal present
    # fully keyed region (past the 5 ms ramps): pure sidetone at the CW
    # pitch with the configured level (0.3 peak -> 0.212 RMS)
    seg = audio[6 * B: 9 * B]
    win = np.hanning(len(seg))
    f = np.fft.rfftfreq(len(seg), 1.0 / FS)
    peak = f[np.argmax(np.abs(np.fft.rfft(seg * win)))]
    assert abs(peak - 600.0) < 20.0, peak
    assert 0.15 < _rms(seg) < 0.28, _rms(seg)
    # TX IQ reached the hardware exactly while keyed, at full carrier
    assert len(writes) == 6
    assert float(np.abs(writes[2]).max()) > 0.9
    assert _rms(audio[-2 * B:]) > 0.05          # RX resumed after key-up
    # zero clicks: every sample-to-sample step (including block edges and
    # both key transitions) is bounded by envelope-rate slew
    assert float(np.abs(np.diff(audio)).max()) < 0.2
    radio.close()


def test_half_duplex_ssb_mic_session():
    """PTT SSB session with a live (paced) file microphone: RX audio is
    muted while keyed, the mic tone appears as TX sideband energy, and
    the capture never starves."""
    # sim tone is at 10 kHz; tuning 9 kHz puts it at +1 kHz in the USB band
    cfg = RadioConfig(sample_rate=FS, audio_block=B, mode="USB",
                      tune_hz=9000.0)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    radio.enable_tx()
    tone = (0.3 * np.sin(2.0 * np.pi * 1000.0 * np.arange(48000) / FS)
            ).astype(np.float32)
    radio.enable_mic(tone, latency_ms=2000.0)
    nblk = 14
    need = nblk * radio.tx.block
    t0 = time.time()
    while radio.mic.fill < need and time.time() - t0 < 8.0:
        time.sleep(0.01)
    assert radio.mic.fill >= need, "mic capture thread did not keep up"
    writes = []
    radio.hw.write_samples = lambda iq: writes.append(np.asarray(iq))
    blocks = []
    for i in range(nblk):
        radio.set_ptt(4 <= i < 9)
        blocks.append(radio.run_once()[0])
    audio = np.concatenate(blocks)

    assert _rms(audio[: 3 * B]) > 0.05           # RX audible before keying
    assert _rms(audio[6 * B: 8 * B]) < 0.01     # RX muted while keyed
    assert len(writes) == 5                      # one TX block per keyed loop
    iq = np.concatenate(writes)
    S = np.abs(np.fft.fft(iq * np.hanning(len(iq))))
    f = np.fft.fftfreq(len(iq), 1.0 / FS)
    peak = f[np.argmax(S)]
    assert abs(peak - 1000.0) < 50.0, peak       # USB of the 1 kHz mic tone
    usb = float(np.sum(S[(f > 100) & (f < 3000)] ** 2))
    lsb = float(np.sum(S[(f < -100) & (f > -3000)] ** 2))
    assert usb > 100.0 * lsb                     # opposite sideband rejected
    assert _rms(audio[-2 * B:]) > 0.05           # RX resumed
    assert radio.mic.stats()["starved"] == 0
    radio.close()


def test_live_loopback_session_recovers_voice():
    """The demo flow as a test: mic-file -> TX -> simulated PA -> RX
    loopback, live through the duplex loop with tx_monitor (DEBUG_MIC,
    sound.c:886) — the demodulated audio must correlate with the mic."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from demo_transceiver import live_session

    voice, audio, smeter = live_session(blocks=16)
    assert smeter > -40.0, smeter               # own signal on the S-meter
    seg = slice(6 * B, 14 * B)                  # past chain warm-up
    from scipy.signal import firwin, hilbert
    core = firwin(257, [500.0, 2200.0], fs=FS, pass_zero=False)
    v = np.convolve(voice[seg], core, "same")
    a = np.convolve(audio[seg], core, "same")
    # SSB through the loop picks up an arbitrary carrier phase, which
    # Hilbert-rotates the audio: correlate analytic signals (phase-
    # invariant) over a lag scan covering the chain group delay
    av, aa = hilbert(v), hilbert(a)
    lags = np.arange(0, 4000)
    c = np.array([np.abs(np.vdot(av[:-4000], aa[l:l + len(av) - 4000]))
                  for l in lags])
    best = int(np.argmax(c))
    a2 = aa[best:best + len(av) - 4000]
    v2 = av[:len(a2)]
    rho = float(np.abs(np.vdot(v2, a2))
                / (np.linalg.norm(v2) * np.linalg.norm(a2)))
    assert rho > 0.7, (rho, best)
    a2, v2 = np.real(a2), np.real(v2)
    radioless = float(np.std(audio[:B]))        # first block: mostly noise
    assert float(np.std(a2)) > 5.0 * max(radioless, 1e-6)


def test_vox_keys_the_loop():
    """VOX (opt-in) keys TX from mic level inside the block loop and
    releases after the hold time."""
    cfg = RadioConfig(sample_rate=FS, audio_block=B, mode="USB",
                      tune_hz=10000.0)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    radio.enable_tx()
    radio.set_vox(True, threshold=0.05, hold_secs=0.05)  # ~1 block hold
    loud = (0.3 * np.sin(2.0 * np.pi * 700.0 * np.arange(6 * B) / FS)
            ).astype(np.float32)

    class Burst:                       # unpaced: loud for 3 blocks, then EOF
        def __init__(self):
            self.mic = loud.copy()

        def read(self, n):
            out, self.mic = self.mic[:n], self.mic[n:]
            return out

        def close(self):
            pass

    radio.enable_mic(Burst())
    t0 = time.time()
    while radio.mic.captured < 6 * B and time.time() - t0 < 5.0:
        time.sleep(0.01)
    keyed = []
    for _ in range(8):
        radio.run_once()
        keyed.append(radio.ptt.transmitting)
    assert any(keyed[:4]), keyed                 # VOX keyed on the burst
    assert not any(keyed[-2:]), keyed            # released after hold
    radio.close()


def test_cq_voice_keyer_repeats_and_stops(tmp_path):
    """file_play_source 12 (quisk.py:5926): the CQ WAV becomes the mic
    with PTT held, then the radio listens for repeat_secs and repeats."""
    import numpy as np
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.hw.base import Hardware
    from quisk_tpu.io import wav as wavio

    class HW(Hardware):
        def __init__(self):
            super().__init__()
            self.tx_blocks = 0

        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

        def write_samples(self, iq):
            self.tx_blocks += 1

    FS = 48000.0
    hw = HW()
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
              hardware=hw)
    r.open()
    r.enable_tx()
    B = r.tx.block
    msg = (0.3 * np.sin(2 * np.pi * 800.0 * np.arange(2 * B) / FS)
           ).astype(np.float32)
    p = tmp_path / "cq.wav"
    wavio.write_audio_wav(str(p), msg, FS)
    # repeat after ~1 block of listening
    r.play_cq(str(p), repeat_secs=B / FS)
    states = []
    for _ in range(8):
        r.run_once()
        states.append(r._keyed)
    # keyed for 2 blocks, idle ~1, keyed again (repeat)
    assert states[0] and states[1]
    assert not all(states[2:4])          # a listening gap happened
    assert any(states[3:])               # and the message repeated
    assert hw.tx_blocks >= 3
    r.stop_cq()
    for _ in range(2):
        r.run_once()
    assert not r._keyed
    # one-shot (no repeat) un-keys at the end by itself
    r.play_cq(str(p))
    for _ in range(4):
        r.run_once()
    assert not r._keyed and r._cq is None


def test_add_tone_injects_test_carrier():
    import numpy as np
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.hw.base import Hardware

    class HW(Hardware):
        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

    FS = 48000.0
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
              hardware=HW())
    silent = np.concatenate([np.asarray(r.run_once())[0]
                             for _ in range(4)])
    r.add_tone(8000.0)                  # 1 kHz above the USB carrier
    loud = np.concatenate([np.asarray(r.run_once())[0] for _ in range(4)])
    seg = loud[-4096:]
    X = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1.0 / FS)
    assert np.sqrt(np.mean(silent ** 2)) < 1e-6
    assert abs(f[np.argmax(X)] - 1000.0) < 15.0
    r.add_tone(0)
    off = np.concatenate([np.asarray(r.run_once())[0] for _ in range(4)])
    assert np.sqrt(np.mean(off[-4096:] ** 2)) < 1e-6
