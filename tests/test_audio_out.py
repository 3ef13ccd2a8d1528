"""Paced audio playback: real-time sink pacing, the fill servo, and the
RX x2/4/8 play-rate interpolation (parity sound.c:504-618, quisk.c:2663)."""

import time

import numpy as np

from quisk_tpu.io.audio_out import AudioPlayer, ClockedNullSink, WavFileSink


def test_clocked_sink_paces_realtime():
    rate = 48000.0
    sink = ClockedNullSink(rate)
    t0 = time.perf_counter()
    for _ in range(10):
        sink.write(np.zeros(2400, np.float32))   # 10 x 50 ms
    dt = time.perf_counter() - t0
    assert 0.45 <= dt <= 0.8, dt                 # ~0.5 s of audio took ~0.5 s


def test_player_fill_servo_converges():
    """Producer runs 0.2% fast (clock skew): the servo must hold the
    buffer near 50% fill with no under/overruns after priming."""
    rate = 48000.0
    player = AudioPlayer(ClockedNullSink(rate), rate, latency_ms=100.0,
                         block=480)
    player.start()
    block = 512
    n_blocks = 60
    t0 = time.perf_counter()
    produced = 0
    skew = 1.002                                  # producer 0.2% fast
    tone = 0.1 * np.sin(2 * np.pi * 700 / rate * np.arange(block)
                        ).astype(np.float32)
    for i in range(n_blocks):
        player.push(tone)
        produced += block
        target = t0 + produced / (rate * skew)
        dt = target - time.perf_counter()
        if dt > 0:
            time.sleep(dt)
    st = player.stats()
    player.stop()
    assert st["blocks_played"] > 10
    assert st["underruns"] == 0, st
    assert 0.1 < st["fill"] < 0.95, st


def test_wav_sink_roundtrip(tmp_path):
    from quisk_tpu.io.wav import read_audio_wav
    p = tmp_path / "out.wav"
    s = WavFileSink(str(p), 48000.0)
    x = 0.25 * np.sin(2 * np.pi * 1000 / 48000 * np.arange(4800)
                      ).astype(np.float32)
    s.write(x[:2400]); s.write(x[2400:]); s.close()
    y, fs = read_audio_wav(str(p))
    assert fs == 48000.0
    assert np.max(np.abs(np.squeeze(y)[: len(x)] - x)) < 1e-3


def test_radio_play_rate_interpolation():
    """RX audio at 48 k interpolated x4 to a 192 k playback device
    (quisk.c:2663-2682): tone frequency preserved, images rejected."""
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio

    cfg = RadioConfig(sample_rate=48000.0, mode="USB", tune_hz=10000.0,
                      playback_rate=192000.0, latency_ms=100.0)
    radio = Radio(cfg, hardware="sim")
    radio.hw.tone_hz = 11000.0                    # 1 kHz above the USB tune
    sink = WavFileSink("/tmp/quisk_play_test.wav", 192000.0)
    radio.enable_audio_out(sink=sink, block=2048)
    radio.open()
    radio.run(blocks=10)
    time.sleep(0.3)                               # let the player drain
    radio.close()                                 # closes the sink (writes)
    from quisk_tpu.io.wav import read_audio_wav
    y, fs = read_audio_wav("/tmp/quisk_play_test.wav")
    y = np.squeeze(y)
    assert fs == 192000.0 and len(y) > 48000
    # the player pads with zeros once the producer stops: analyze the
    # loudest 0.2 s window instead of a fixed offset
    W = int(0.2 * fs)
    cs = np.concatenate([[0.0], np.cumsum(y.astype(np.float64) ** 2)])
    rms = cs[W:] - cs[:-W]
    k0 = int(np.argmax(rms))
    seg = y[k0:k0 + W]
    X = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1 / fs)
    peak = f[np.argmax(X[10:]) + 10]
    # sim hardware: tone 1 kHz above the tune -> 1 kHz audio, now at 192 k
    assert abs(peak - 1000.0) < 30.0
    # interpolation images (47k, 49k, 95k...) rejected
    img = X[(f > 40000.0)].max()
    assert 20 * np.log10(X.max() / (img + 1e-12)) > 60.0
