"""Resamplers: halfband cascade, interpolator, fractional decimator."""

from fractions import Fraction

import numpy as np
import pytest

from quisk_tpu.io import sources
from quisk_tpu.ops import design
from quisk_tpu.ops.resample import FracDecim, HalfbandDecim2, Interpolator
from quisk_tpu.oracle import dsp


def _stream(op, x2d, block):
    st = op.init_state(x2d.shape[0])
    outs = []
    for i in range(x2d.shape[1] // block):
        st, y = op(st, x2d[:, i * block:(i + 1) * block])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_halfband_matches_oracle(rng):
    B = 2048
    x = (rng.standard_normal((2, 4 * B)) + 1j * rng.standard_normal((2, 4 * B))
         ).astype(np.complex64)
    hb = HalfbandDecim2.create(B)
    y = _stream(hb, x, B)
    taps = design.halfband(45)
    for c in range(2):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps, decim=2)
        assert dsp.snr_db(ref, y[c]) > 100


def test_halfband_cascade_passes_band(rng):
    """192 k -> 48 k via two halfbands: a 10 kHz tone survives unscathed."""
    fs, B = 192000.0, 4096
    n = 8 * B
    x = sources.tone(10000.0, fs, n).astype(np.complex64)[None]
    h1 = HalfbandDecim2.create(B)
    h2 = HalfbandDecim2.create(B // 2)
    s1, s2 = h1.init_state(1), h2.init_state(1)
    outs = []
    for i in range(n // B):
        s1, y = h1(s1, x[:, i * B:(i + 1) * B])
        s2, y = h2(s2, y)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0]
    ref = sources.tone(10000.0, 48000.0, len(y))
    # total group delay is fractional in output samples -> fit complex gain
    g = np.vdot(ref[1024:], y[1024:]) / np.vdot(ref[1024:], ref[1024:])
    err = y[1024:] - g * ref[1024:]
    snr = 10 * np.log10(np.mean(np.abs(y[1024:]) ** 2)
                        / (np.mean(np.abs(err) ** 2) + 1e-30))
    assert abs(abs(g) - 1.0) < 0.01, g
    assert snr > 60, snr


def test_interpolator(rng):
    """Interp x4 of a band-limited signal reproduces the dense signal."""
    fs_in, L, B = 12000.0, 4, 512
    n = 8 * B
    dense = sources.voice_like(fs_in * L, n * L, band=(300.0, 2500.0))
    x = dense[::L].astype(np.complex64)[None]  # band-limited: decimation is exact
    op = Interpolator.create(L, B, fs_out=fs_in * L)
    y = _stream(op, x, B).real[0]
    # group delay = (ntaps-1)/2 output samples (~118 here)
    snr = dsp.align_and_snr(dense, y, max_lag=256, skip=4 * B)
    assert snr > 40, snr


@pytest.mark.parametrize("ratio", [Fraction(25, 24), Fraction(125, 108)])
def test_frac_decim_tone(ratio):
    """A tone through the fractional decimator lands at the right frequency
    with low distortion (4-point Lagrange on an oversampled signal)."""
    fs_out = 48000.0
    fs_in = fs_out * ratio
    M = ratio.numerator
    B = M * max(1, 2048 // M)
    n = 8 * B
    f0 = 3000.0
    x = sources.tone(f0, float(fs_in), n).astype(np.complex64)[None]
    op = FracDecim.create(ratio, B)
    y = _stream(op, x, B)[0]
    assert len(y) == n * ratio.denominator // M
    ref = sources.tone(f0, fs_out, len(y))
    # allow arbitrary phase: fit complex gain
    g = np.vdot(ref[1024:], y[1024:]) / np.vdot(ref[1024:], ref[1024:])
    err = y[1024:] - g * ref[1024:]
    snr = 10 * np.log10(np.mean(np.abs(y[1024:]) ** 2) / np.mean(np.abs(err) ** 2))
    assert abs(abs(g) - 1.0) < 0.01
    assert snr > 55, snr


def test_frac_decim_streaming_invariance():
    ratio = Fraction(25, 24)
    B = 1000
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((1, 4 * B)) + 1j * rng.standard_normal((1, 4 * B))
         ).astype(np.complex64)
    small = FracDecim.create(ratio, B)
    big = FracDecim.create(ratio, 4 * B)
    y_small = _stream(small, x, B)
    y_big = _stream(big, x, 4 * B)
    np.testing.assert_allclose(y_small, y_big, atol=2e-5)
