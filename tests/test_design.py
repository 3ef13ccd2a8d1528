"""Filter-design property tests: responses must meet their design specs."""

import numpy as np

from quisk_tpu.ops import design


def test_lowpass_response():
    fs = 48000.0
    h = design.lowpass(255, 3000.0, fs)
    f, H = design.freq_response(h, fs, 8192)
    mag = np.abs(H)
    passband = mag[(np.abs(f) < 2400)]
    stopband = mag[(np.abs(f) > 4000)]
    assert np.all(passband > 0.98) and np.all(passband < 1.02)
    assert 20 * np.log10(stopband.max()) < -60


def test_halfband_structure_and_atten():
    h = design.halfband(45, atten_db=120.0)
    k = np.arange(45) - 22
    zeros = h[(k % 2 == 0) & (k != 0)]
    assert np.all(zeros == 0.0)
    assert abs(h.sum() - 1.0) < 1e-12
    f, H = design.freq_response(h, 2.0, 16384)  # fs=2 -> f in [-1, 1)
    stop = np.abs(H[np.abs(f) > 0.75])          # stopband of a decim-by-2
    assert 20 * np.log10(stop.max()) < -110     # ~120 dB design, margin


def test_analytic_bandpass_selects_sideband():
    fs = 48000.0
    h = design.bandpass_analytic(1025, 300.0, 3100.0, fs)
    f, H = design.freq_response(h, fs, 16384)
    mag = np.abs(H)
    inband = mag[(f > 600) & (f < 2800)]
    image = mag[(f < -300) & (f > -3100)]
    assert np.all(inband > 0.95)
    assert 20 * np.log10(image.max() + 1e-30) < -60  # opposite sideband rejected


def test_analytic_bandpass_lsb():
    fs = 48000.0
    h = design.bandpass_analytic(1025, -3100.0, -300.0, fs)
    f, H = design.freq_response(h, fs, 16384)
    mag = np.abs(H)
    assert np.all(mag[(f < -600) & (f > -2800)] > 0.95)
    assert 20 * np.log10(mag[(f > 300) & (f < 3100)].max() + 1e-30) < -60


def test_decimator_antialias():
    fs = 480000.0
    h = design.decimator(10, fs, atten_db=100.0)
    f, H = design.freq_response(h, fs, 32768)
    stop = np.abs(H[np.abs(f) > fs / 20.0])     # beyond fs_out/2
    assert 20 * np.log10(stop.max()) < -90
