"""Tests: graphic EQ, continuous frequency compressor, biquad sections,
PLL FM demod, CESSB overshoot control."""

import numpy as np
import pytest
from scipy import signal as sig

from quisk_tpu.io import sources
from quisk_tpu.oracle import dsp
from quisk_tpu.ops.compress import OvershootControl
from quisk_tpu.ops.demod import PLLFMDemod
from quisk_tpu.ops.eq import CFCompressor, GraphicEQ, eq_taps
from quisk_tpu.ops.iir import Biquad

FS = 48000.0
B = 2048


def _stream(op, x, nblk):
    st = op.init_state(x.shape[0])
    outs = []
    for i in range(nblk):
        st, y = op(st, x[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


# ------------------------------------------------------------------ EQ
def test_eq_taps_match_requested_gains():
    freqs = [100.0, 400.0, 1000.0, 3000.0, 8000.0]
    gains = [6.0, 0.0, -12.0, 3.0, 0.0]
    taps = eq_taps(1025, freqs, gains, FS)
    w, H = sig.freqz(taps, worN=4096, fs=FS)
    for f0, g0 in zip(freqs, gains):
        k = np.argmin(np.abs(w - f0))
        got = 20 * np.log10(np.abs(H[k]) + 1e-12)
        assert abs(got - g0) < 1.5, (f0, g0, got)


def test_graphic_eq_streams_and_boosts():
    eq = GraphicEQ.create(B, FS, [100.0, 1000.0, 8000.0], [0.0, 12.0, 0.0],
                          ntaps=1025)
    n = 8 * B
    t = np.arange(n) / FS
    x = (np.sin(2 * np.pi * 1000.0 * t)
         + np.sin(2 * np.pi * 100.0 * t)).astype(np.float32)[None]
    y = _stream(eq, x, 8)[0]
    seg = slice(2 * B, 8 * B)
    f = np.fft.rfftfreq(6 * B, 1 / FS)
    Y = np.abs(np.fft.rfft(y[seg]))
    X = np.abs(np.fft.rfft(x[0][seg]))
    k1 = np.argmin(np.abs(f - 1000.0))
    k0 = np.argmin(np.abs(f - 100.0))
    assert 20 * np.log10(Y[k1] / X[k1]) == pytest.approx(12.0, abs=1.0)
    assert 20 * np.log10(Y[k0] / X[k0]) == pytest.approx(0.0, abs=1.0)


# ------------------------------------------------------------- CFC
def test_cfcomp_compresses_loud_passes_quiet():
    comp = CFCompressor.create(B, FS, target_db=-6.0, ratio=4.0,
                               max_gain_db=20.0, max_cut_db=20.0)
    n = 16 * B
    t = np.arange(n) / FS
    # STFT-bin-centered tones (fft 512 @ 48 k -> 93.75 Hz spacing) so the
    # measured level equals the true level
    loud = 1.0 * np.sin(2 * np.pi * 562.5 * t)
    quiet = 0.02 * np.sin(2 * np.pi * 1968.75 * t)
    x = (loud + quiet).astype(np.float32)[None]
    y = _stream(comp, x, 16)[0]
    seg = slice(8 * B, 16 * B)
    f = np.fft.rfftfreq(8 * B, 1 / FS)
    Y = np.abs(np.fft.rfft(y[seg]))
    X = np.abs(np.fft.rfft(x[0][seg]))
    kl = np.argmin(np.abs(f - 562.5))
    kq = np.argmin(np.abs(f - 1968.75))
    cut = 20 * np.log10(Y[kl] / X[kl])
    lift = 20 * np.log10(Y[kq] / X[kq])
    # loud bin pulled down, quiet bin lifted -> dynamic range reduced
    assert cut < -3.0, cut
    assert lift > 3.0, lift


def test_cfcomp_identity_at_unity():
    comp = CFCompressor.create(B, FS, ratio=1.0)   # slope 0: no gain change
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8 * B)).astype(np.float32)
    y = _stream(comp, x, 8)
    # output is the input delayed by fft/2 (STFT latency), energy preserved
    d = 256
    err = y[0][d:4 * B] - x[0][: 4 * B - d]
    assert np.sqrt(np.mean(err**2)) < 1e-3


# ---------------------------------------------------------------- Biquad
@pytest.mark.slow
def test_biquad_matches_scipy_lfilter():
    bq = Biquad.notch(1000.0, FS, q=10.0)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4 * B)).astype(np.float32)
    y = _stream(bq, x, 4)
    b = [float(bq.b0), float(bq.b1), float(bq.b2)]
    a = [1.0, float(bq.a1), float(bq.a2)]
    ref = sig.lfilter(b, a, x, axis=-1)
    assert np.max(np.abs(y - ref)) < 5e-3


@pytest.mark.slow
def test_biquad_notch_kills_tone():
    bq = Biquad.notch(600.0, FS, q=30.0)
    n = 8 * B
    t = np.arange(n) / FS
    x = np.sin(2 * np.pi * 600.0 * t).astype(np.float32)[None]
    y = _stream(bq, x, 8)[0]
    assert np.sqrt(np.mean(y[4 * B:] ** 2)) < 0.02


# ----------------------------------------------------------- PLL FM
def test_pll_fm_demod_recovers_audio():
    n = 16 * B
    audio = sources.voice_like(FS, n, band=(300.0, 2500.0))
    audio = 0.8 * audio / np.max(np.abs(audio))
    iq = sources.fm_signal(audio, deviation_hz=5000.0, fs=FS)
    # de-emphasis off to compare against the raw modulating audio
    dem = PLLFMDemod.create(FS, deviation_hz=5000.0, deemph_hz=20000.0)
    y = _stream(dem, iq[None].astype(np.complex64), 16)[0]
    seg = slice(8 * B, 16 * B)
    snr = dsp.frac_align_snr(audio[seg], y[seg], max_lag=256)
    assert snr > 15.0, snr


def test_pll_fm_ctcss_notch():
    n = 16 * B
    t = np.arange(n) / FS
    audio = np.sin(2 * np.pi * 1000.0 * t)
    ctcss = 0.3 * np.sin(2 * np.pi * 100.0 * t)
    iq = sources.fm_signal(audio + ctcss, deviation_hz=5000.0, fs=FS)
    dem = PLLFMDemod.create(FS, deviation_hz=5000.0, ctcss_hz=100.0)
    y = _stream(dem, iq[None].astype(np.complex64), 16)[0]
    seg = slice(8 * B, 16 * B)
    f = np.fft.rfftfreq(8 * B, 1 / FS)
    Y = np.abs(np.fft.rfft(y[seg]))
    kc = np.argmin(np.abs(f - 100.0))
    kv = np.argmin(np.abs(f - 1000.0))
    assert Y[kc] / Y[kv] < 0.05, Y[kc] / Y[kv]


# ------------------------------------------------------------ CESSB
def test_overshoot_control_bounds_envelope():
    n = 16 * B
    voice = sources.voice_like(FS, n, band=(300.0, 2700.0))
    z = sig.hilbert(3.0 * voice / np.max(np.abs(voice)))  # drive into clip
    osc = OvershootControl.create(B, FS, ceiling=1.0)
    y = _stream(osc, z[None].astype(np.complex64), 16)[0]
    env = np.abs(y[4 * B:])
    assert np.max(env) < 1.10, np.max(env)       # envelope bounded
    # splatter: out-of-band power far below in-band
    seg = y[4 * B:]
    F = np.fft.fftfreq(len(seg), 1 / FS)
    S = np.abs(np.fft.fft(seg)) ** 2
    inband = S[(F >= 250.0) & (F <= 3100.0)].sum()
    splat = S[(F > 4000.0) & (F < 12000.0)].sum() + S[(F < -500.0)].sum()
    assert 10 * np.log10(inband / (splat + 1e-12)) > 25.0
