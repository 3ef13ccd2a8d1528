"""Adaptive predistortion (PureSignal-style) for the TX chain.

Parity: wdsp/calcc.c (1154 LoC — PureSignal calibration: correlate the TX
signal with the PA feedback, fit a complex gain vs envelope curve, build
the inverse) + iqc.c (applies the correction), and the reference's own
spline machinery (microphone.c:1581-1676 PreDistort + spline/splint,
quisk_utils.py:4).

Method (the same shape as calcc's):
1. align feedback to reference (integer lag by cross-correlation, complex
   gain by least squares),
2. bin samples by reference envelope into ``n_bins`` levels; per bin the
   PA's complex gain  g(e) = <fb * conj(ref)> / <|ref|^2>,
3. smooth the measured AM/AM + AM/PM curve (the reference fits a cubic
   spline; a short moving average over bins is equivalent at this bin
   count),
4. the correction is the pointwise inverse target/actual, applied by
   envelope-indexed table lookup — on TPU a gather, batched over channels.

The apply step is a jax op; calibration runs on the host at a slow cadence
(the reference recalibrates every few seconds of TX).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _align(ref: np.ndarray, fb: np.ndarray, max_lag: int = 256):
    """Align feedback to reference: integer lag + complex gain."""
    n = min(len(ref), len(fb))
    r, f = ref[:n], fb[:n]
    c = np.correlate(f, r, "full")
    lag = int(np.argmax(np.abs(c))) - (n - 1)
    if lag > 0:
        r2, f2 = r[: n - lag], f[lag:]
    else:
        r2, f2 = r[-lag:], f[: n + lag]
    g = np.vdot(r2, f2) / (np.vdot(r2, r2) + 1e-30)
    return r2, f2 / g, lag, g


def measure_pa_gain(ref: np.ndarray, feedback: np.ndarray, n_bins: int = 64,
                    smooth: int = 5):
    """(envelope_grid [n_bins], complex gain [n_bins]) of the PA.

    The gain curve is normalised so g -> 1 at small envelope (the linear
    region); bins with too few samples inherit their neighbours' values.
    """
    ref = np.asarray(ref, np.complex128)
    fb = np.asarray(feedback, np.complex128)
    r, f, _, _ = _align(ref, fb)
    env = np.abs(r)
    emax = float(np.max(env)) + 1e-12
    idx = np.minimum((env / emax * n_bins).astype(np.int64), n_bins - 1)
    num = np.zeros(n_bins, np.complex128)
    den = np.zeros(n_bins)
    cnt = np.zeros(n_bins)
    np.add.at(num, idx, f * np.conj(r))
    np.add.at(den, idx, env ** 2)
    np.add.at(cnt, idx, 1.0)
    good = (cnt > 8) & (den > 1e-20)
    g = np.ones(n_bins, np.complex128)
    g[good] = num[good] / den[good]
    # fill sparse bins from the nearest measured one
    if good.any():
        gi = np.where(good)[0]
        for k in np.where(~good)[0]:
            g[k] = g[gi[np.argmin(np.abs(gi - k))]]
    # smooth (the reference fits a spline through the bins)
    if smooth > 1:
        kern = np.ones(smooth) / smooth
        g = (np.convolve(g.real, kern, "same")
             + 1j * np.convolve(g.imag, kern, "same"))
    grid = (np.arange(n_bins) + 0.5) / n_bins * emax
    return grid, g


def _fit_and_invert(ref, feedback, n_bins: int, extend: float = 1.25):
    """Fit the PA to an even-order polynomial model and build the inverse
    correction table (tab_env [n_bins], c complex [n_bins])."""
    grid, g = measure_pa_gain(ref, feedback, 64, smooth=1)
    # normalise to the small-signal gain: the correction bends the curve,
    # absolute level belongs to the drive control
    g = g / g[4]
    # weighted LS fit of |g|-1 and arg(g) to b2 e^2 + b4 e^4 (the physical
    # odd-order nonlinearity model the reference's spline approximates)
    E = np.stack([grid ** 2, grid ** 4], axis=1)
    m = slice(4, len(grid))
    bm, *_ = np.linalg.lstsq(E[m], np.abs(g[m]) - 1.0, rcond=None)
    bp, *_ = np.linalg.lstsq(E[m], np.angle(g[m]), rcond=None)
    gmag = lambda a: 1.0 + bm[0] * a ** 2 + bm[1] * a ** 4   # noqa: E731
    gph = lambda a: bp[0] * a ** 2 + bp[1] * a ** 4          # noqa: E731
    # invert a*|g(a)| = e on a dense drive grid (monotone up to the model's
    # saturation peak — grid inversion, no fixed-point: e/g(a) iteration
    # diverges near the knee), extending modestly past the measured
    # envelope (the drive the correction itself will reach)
    emax = grid[-1] * extend
    tab_e = np.arange(n_bins) / (n_bins - 1) * emax
    a_grid = np.linspace(0.0, grid[-1] * 1.6, 2048)
    out = a_grid * np.clip(gmag(a_grid), 0.05, None)
    peak = int(np.argmax(out))
    a_req = np.interp(tab_e, out[: peak + 1], a_grid[: peak + 1],
                      right=a_grid[peak])
    c = np.where(tab_e > 0, a_req / np.maximum(tab_e, 1e-9), 1.0) \
        * np.exp(-1j * gph(a_req))
    return tab_e, c


@struct.dataclass
class Predistorter:
    """Envelope-indexed complex-gain correction ``y = x * c(|x|)`` with
    linear interpolation between table entries.

    The table is data: recalibration swaps it without recompiling.  Complex
    table kept as (re, im) so no complex leaf crosses the jit boundary.
    """

    c_re: jnp.ndarray              # [n_bins]
    c_im: jnp.ndarray
    env_max: jnp.ndarray           # scalar: top of the table's range

    @classmethod
    def identity(cls, n_bins: int = 256):
        return cls(c_re=jnp.ones((n_bins,), jnp.float32),
                   c_im=jnp.zeros((n_bins,), jnp.float32),
                   env_max=jnp.float32(1.0))

    @classmethod
    def from_measurement(cls, ref, feedback, n_bins: int = 256):
        """Calibrate from a (reference, PA feedback) capture."""
        tab_e, c = _fit_and_invert(ref, feedback, n_bins)
        return cls(c_re=jnp.asarray(c.real, jnp.float32),
                   c_im=jnp.asarray(c.imag, jnp.float32),
                   env_max=jnp.float32(tab_e[-1]))

    def refine(self, ref, feedback, n_bins: int = 256) -> "Predistorter":
        """One PureSignal iteration: ``feedback`` was captured WITH this
        predistorter applied; measure the residual nonlinearity of the
        composite (predistorter+PA) plant and fold its correction in:
        c_total(e) = c_resid(e) * c_old(e * |c_resid(e)|).

        The first round can only extrapolate the PA beyond the drive range
        it measured; iterating measures the PA at the drive levels the
        correction actually uses (parity: calcc.c recalibrates
        continuously during TX).
        """
        tab_e, c2 = _fit_and_invert(ref, feedback, n_bins)
        e_old = np.asarray(self.env_max) * np.arange(len(self.c_re)) \
            / (len(self.c_re) - 1)
        c_old = np.asarray(self.c_re) + 1j * np.asarray(self.c_im)
        e_mod = tab_e * np.abs(c2)
        c1i = (np.interp(e_mod, e_old, c_old.real)
               + 1j * np.interp(e_mod, e_old, c_old.imag))
        c = c2 * c1i
        return Predistorter(c_re=jnp.asarray(c.real, jnp.float32),
                            c_im=jnp.asarray(c.imag, jnp.float32),
                            env_max=jnp.float32(tab_e[-1]))

    def init_state(self, channels: int):
        return ()

    def __call__(self, state, x: jnp.ndarray):
        """x [C, B] complex TX signal -> predistorted signal."""
        n = self.c_re.shape[0]
        pos = jnp.clip(jnp.abs(x) / self.env_max * (n - 1), 0.0, n - 1.0)
        k = jnp.minimum(pos.astype(jnp.int32), n - 2)
        fr = (pos - k).astype(jnp.float32)
        c_re = self.c_re[k] * (1.0 - fr) + self.c_re[k + 1] * fr
        c_im = self.c_im[k] * (1.0 - fr) + self.c_im[k + 1] * fr
        return state, x * jax.lax.complex(c_re, c_im)


class SimulatedPA:
    """Memoryless nonlinear PA model for closed-loop calibration tests:
    odd-order AM/AM compression plus envelope-dependent AM/PM rotation —
    the distortion family calcc.c measures and inverts.  Deterministic."""

    def __init__(self, g3: complex = -0.22 + 0.06j, g5: complex = 0.05,
                 ampm_rad: float = 0.12, sat: float = 1.5):
        self.g3, self.g5, self.ampm, self.sat = g3, g5, ampm_rad, sat

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        e2 = np.abs(x) ** 2
        y = x * (1.0 + self.g3 * e2 + self.g5 * e2 ** 2)
        y = y * np.exp(1j * self.ampm * e2)
        mag = np.abs(y)
        y = np.where(mag > self.sat,
                     y * self.sat / np.maximum(mag, 1e-30), y)  # hard limit
        return y.astype(np.complex64)


def two_tone_imd_db(iq: np.ndarray, fs: float, f1: float, f2: float) -> float:
    """Third-order IMD level (dBc) of a two-tone signal — the PureSignal
    quality metric (parity: the reference's IMD test mode,
    microphone.c:140-159)."""
    n = len(iq)
    w = np.hanning(n)
    S = np.abs(np.fft.fft(iq * w))
    f = np.fft.fftfreq(n, 1.0 / fs)

    def peak(freq):
        k = np.argmin(np.abs(f - freq))
        return np.max(S[max(k - 3, 0):k + 4])

    carrier = max(peak(f1), peak(f2))
    imd = max(peak(2 * f1 - f2), peak(2 * f2 - f1))
    return 20.0 * np.log10(imd / (carrier + 1e-30))
