"""Tests: variable-rate resampler + rate servo, spectral noise blanker,
diversity combining."""

import numpy as np
import pytest

from quisk_tpu.io.ratematch import RateServo, VarRateResampler
from quisk_tpu.ops.diversity import (DiversityCombiner,
                                     estimate_max_snr_weights,
                                     null_steering_weights)
from quisk_tpu.ops.noise import SpectralNoiseBlanker

FS = 48000.0
B = 2048


# ------------------------------------------------------- var resampler
def test_var_resampler_identity_ratio():
    rs = VarRateResampler(1.0)
    t = np.arange(4 * B) / FS
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = np.concatenate([rs.process(x[i * B:(i + 1) * B]) for i in range(4)])
    # ratio 1 reproduces the input (3-sample latency from the window)
    n = min(len(y), len(x)) - 4
    err = y[3:n] - x[:n - 3]
    assert np.max(np.abs(err[100:])) < 1e-6


def test_var_resampler_tone_fidelity_at_offset_ratio():
    ratio = 1.0 + 117e-6                   # 117 ppm clock skew
    rs = VarRateResampler(ratio)
    n = 32 * B
    t = np.arange(n) / FS
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = np.concatenate([rs.process(x[i * B:(i + 1) * B])
                        for i in range(n // B)])
    # output is the same tone at fs/ratio: check against the exact
    # resampled reference
    ty = (np.arange(len(y)) * ratio - 3.0) / FS   # 3-sample latency
    ref = np.sin(2 * np.pi * 1000.0 * ty)
    err = y[100:-100] - ref[100:len(y) - 100]
    assert np.sqrt(np.mean(err ** 2)) < 1e-4


def test_rate_servo_holds_fill_under_skew():
    # capture clock 200 ppm fast relative to playback
    servo = RateServo(buffer_samples=8 * B, kp=2e-3, ki=2e-5)
    skew = 1.0 + 200e-6
    rng = np.random.default_rng(0)
    fills = []
    servo.feed(rng.standard_normal(4 * B))          # prefill toward 50%
    n_in = int(B * skew)
    for i in range(400):
        servo.feed(rng.standard_normal(n_in))       # fast capture clock
        servo.read(B)                                # nominal playback
        fills.append(servo.fill)
    assert servo.underruns == 0 and servo.overruns == 0
    tail = np.asarray(fills[200:])
    assert np.all(tail > 0.2) and np.all(tail < 0.8), (tail.min(), tail.max())
    # fill drift must be arrested (servo absorbing the 200 ppm skew)
    drift = abs(np.mean(fills[-50:]) - np.mean(fills[200:250]))
    assert drift < 0.1, drift


# ---------------------------------------------------------- spectral NB
@pytest.mark.slow
def test_spectral_nb_removes_impulses_keeps_tone():
    snb = SpectralNoiseBlanker.create(B)
    n = 16 * B
    t = np.arange(n) / FS
    tone = np.sin(2 * np.pi * 750.0 * t).astype(np.float32)
    x = tone.copy()
    rng = np.random.default_rng(1)
    hits = rng.integers(4 * B, n - B, 40)
    for h in hits:
        x[h:h + 8] += 30.0 * rng.standard_normal(8).astype(np.float32)
    st = snb.init_state(1)
    outs = []
    for i in range(16):
        st, y = snb(st, x[None, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0]
    seg = slice(4 * B, 15 * B)
    assert np.max(np.abs(y[seg])) < 3.0          # impulses gone
    # tone survives: correlate with the (STFT-delayed) tone
    d = snb.fft // 2
    c = np.corrcoef(y[4 * B + d:15 * B + d], tone[4 * B:15 * B])[0, 1]
    assert c > 0.95, c


# ----------------------------------------------------------- diversity
def _pair_snapshot(seed=0, n=8192, interf_phase=1.1):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = np.exp(2j * np.pi * 0.01 * t)
    interf = 5.0 * np.exp(2j * np.pi * 0.07 * t)
    noise = 0.05 * (rng.standard_normal((2, n))
                    + 1j * rng.standard_normal((2, n)))
    x0 = sig + interf + noise[0]
    x1 = 0.8 * np.exp(0.4j) * sig + interf * np.exp(1j * interf_phase) + noise[1]
    return np.stack([x0, x1])[None].astype(np.complex64)   # [1, 2, n]


def test_diversity_null_steering_kills_interferer():
    x = _pair_snapshot()
    t = np.arange(x.shape[-1])
    interf_only = np.stack([np.exp(2j * np.pi * 0.07 * t),
                            np.exp(2j * np.pi * 0.07 * t + 1.1j)])[None]
    w = null_steering_weights(interf_only.astype(np.complex64))
    div = DiversityCombiner.create(1).set_weights(w)
    _, y = div((), x)
    y = np.asarray(y)[0]
    Y = np.abs(np.fft.fft(y))
    f = np.fft.fftfreq(len(y))
    k_int = np.argmin(np.abs(f - 0.07))
    k_sig = np.argmin(np.abs(f - 0.01))
    # interferer (5x stronger in) driven below the signal at the output
    assert Y[k_int] < 0.1 * Y[k_sig], (Y[k_int], Y[k_sig])


def test_diversity_max_snr_beats_single_antenna():
    x = _pair_snapshot(interf_phase=3.0)
    # estimate on signal-dominant snapshot (no interferer)
    t = np.arange(x.shape[-1])
    rng = np.random.default_rng(5)
    sig_snap = np.stack([np.exp(2j * np.pi * 0.01 * t),
                         0.8 * np.exp(0.4j) * np.exp(2j * np.pi * 0.01 * t)])
    sig_snap = (sig_snap + 0.3 * (rng.standard_normal((2, len(t)))
                                  + 1j * rng.standard_normal((2, len(t)))))
    w = estimate_max_snr_weights(sig_snap[None].astype(np.complex64))
    div = DiversityCombiner.create(1).set_weights(w)
    _, y = div((), x)
    y = np.asarray(y)[0]
    Y = np.abs(np.fft.fft(y))
    k_sig = np.argmin(np.abs(np.fft.fftfreq(len(y)) - 0.01))
    single = np.abs(np.fft.fft(np.asarray(x)[0, 0]))[k_sig]
    # combined signal power >= single antenna (coherent gain)
    assert Y[k_sig] > 1.1 * single
