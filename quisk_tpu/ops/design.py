"""Filter design — host-side, float64 NumPy.

Design happens once at configuration time on the host; the resulting tap /
frequency-mask arrays are *data* fed to the TPU kernels, so retuning a filter
never recompiles a kernel (the reference gets the same property by
double-buffering FIRCORE frequency masks, wdsp/firmin.c:322-346).

Functional parity targets in the reference:
- windowed-sinc lowpass design: quisk.py:5405 ``MakeFilterCoef``
- analytic tuning of a real lowpass into a complex bandpass:
  filter.c:58-81 ``quisk_filt_tune`` (coef * e^{j 2 pi f (i - D)}, conjugate
  flip for lower sideband)
- 45-tap half-band decimate-by-2 with ~120 dB stopband: filter.c:377-417
- premade equiripple filter sets: filters.py (we design with remez at runtime
  instead of shipping tables)
"""

from __future__ import annotations

import functools

import numpy as np
from scipy import signal as _sig


def lowpass(ntaps: int, cutoff_hz: float, fs: float, window: str | tuple = "blackman") -> np.ndarray:
    """Windowed-sinc FIR lowpass, unity DC gain, float64 taps."""
    if ntaps % 2 == 0:
        ntaps += 1
    return _sig.firwin(ntaps, cutoff_hz, fs=fs, window=window)


def kaiser_lowpass(cutoff_hz: float, fs: float, atten_db: float = 90.0,
                   transition_hz: float | None = None) -> np.ndarray:
    """Kaiser-window lowpass sized automatically from attenuation/transition."""
    if transition_hz is None:
        transition_hz = 0.2 * cutoff_hz
    ntaps, beta = _sig.kaiserord(atten_db, transition_hz / (0.5 * fs))
    ntaps |= 1  # force odd for a symmetric type-I filter
    return _sig.firwin(ntaps, cutoff_hz, fs=fs, window=("kaiser", beta))


def tune(taps: np.ndarray, center_hz: float, fs: float) -> np.ndarray:
    """Shift a (real or complex) filter's response by +center_hz.

    Multiplies tap k by e^{j 2 pi f (k - D) / fs} with D = (T-1)/2, keeping
    the group-delay reference at the filter center, matching the reference's
    analytic tuning (filter.c:58-81).  A real lowpass of bandwidth W/2 tuned
    to +fc becomes a complex *analytic* bandpass over [fc-W/2, fc+W/2]: its
    response at negative (image) frequencies is the lowpass stopband.
    """
    t = np.asarray(taps)
    k = np.arange(len(t), dtype=np.float64) - (len(t) - 1) / 2.0
    return t * np.exp(2j * np.pi * center_hz * k / fs)


def bandpass_analytic(ntaps: int, f1: float, f2: float, fs: float,
                      window: str | tuple = "blackman") -> np.ndarray:
    """Complex analytic bandpass passing [f1, f2] (may be negative for LSB).

    This is the RX channel filter: it both bandlimits and selects the
    sideband, so SSB demodulation after it is simply taking the real part
    (the reference computes Re±Im of the same analytic output,
    quisk.c:1956-2001 — identical up to a 45-degree phase and sqrt(2) gain).
    """
    if f2 <= f1:
        raise ValueError(f"need f1 < f2, got [{f1}, {f2}]")
    half_bw = (f2 - f1) / 2.0
    center = (f1 + f2) / 2.0
    lp = lowpass(ntaps, half_bw, fs, window)
    return tune(lp, center, fs)


def bandpass_with_notches(ntaps: int, f1: float, f2: float, fs: float,
                          notches=(), window: str | tuple = "blackman"
                          ) -> np.ndarray:
    """Analytic bandpass with narrow notches carved out of the passband.

    ``notches`` is a sequence of ``(center_hz, width_hz)`` on the same
    frequency axis as ``[f1, f2]``.  Each in-band notch subtracts an
    aligned narrow analytic bandpass from the impulse response — both are
    linear-phase with the same delay, so their frequency responses
    subtract exactly and the passband elsewhere is untouched.  This is
    the reference's notch-bank bandpass (wdsp/nbp.c: the channel filter
    is re-designed with the database's in-band notches removed); notches
    outside (or clipped to) the passband are skipped.
    """
    h = bandpass_analytic(ntaps, f1, f2, fs, window)
    for fc, width in notches:
        lo = max(f1, fc - width / 2.0)
        hi = min(f2, fc + width / 2.0)
        if hi - lo < 1e-9:
            continue                     # entirely out of band
        h = h - bandpass_analytic(ntaps, lo, hi, fs, window)
    return h


@functools.lru_cache(maxsize=None)
def halfband(ntaps: int = 45, atten_db: float = 120.0) -> np.ndarray:
    """Half-band lowpass for decimate-by-2 (parity: filter.c:379-385 HB45).

    Every even-offset tap except the center is exactly zero: the ideal
    half-band impulse response sinc(k/2) vanishes there and windowing
    preserves the zeros.  Returned taps are float64, unity DC gain.
    """
    if ntaps % 4 != 1:
        raise ValueError("half-band FIR needs ntaps % 4 == 1 (e.g. 45)")
    beta = kaiser_beta(atten_db)
    h = _sig.firwin(ntaps, 0.5, window=("kaiser", beta))
    # Snap the theoretical zeros exactly to zero (numerical dust otherwise).
    k = np.arange(ntaps) - (ntaps - 1) // 2
    h[(k % 2 == 0) & (k != 0)] = 0.0
    return h / h.sum()


def kaiser_beta(atten_db: float) -> float:
    return float(_sig.kaiser_beta(atten_db))


def decimator(decim: int, fs_in: float, atten_db: float = 100.0,
              passband_frac: float = 0.4) -> np.ndarray:
    """Anti-alias lowpass for an integer decimator stage.

    Passband edge at ``passband_frac * fs_out``, stopband edge at
    ``fs_out/2`` so nothing aliases into the retained band.
    """
    fs_out = fs_in / decim
    cutoff = passband_frac * fs_out
    transition = (0.5 - passband_frac) * fs_out
    ntaps, beta = _sig.kaiserord(atten_db, transition / (0.5 * fs_in))
    ntaps |= 1
    return _sig.firwin(ntaps, cutoff + transition / 2.0, fs=fs_in,
                       window=("kaiser", beta))


def interpolator(interp: int, fs_out: float, atten_db: float = 90.0,
                 passband_frac: float = 0.4) -> np.ndarray:
    """Image-reject lowpass for an integer interpolator (gain = interp)."""
    fs_in = fs_out / interp
    cutoff = passband_frac * fs_in
    transition = (0.5 - passband_frac) * fs_in
    ntaps, beta = _sig.kaiserord(atten_db, transition / (0.5 * fs_out))
    ntaps |= 1
    h = _sig.firwin(ntaps, cutoff + transition / 2.0, fs=fs_out,
                    window=("kaiser", beta))
    return h * interp  # compensate zero-stuffing energy loss


def remez_bandpass(ntaps: int, f1: float, f2: float, fs: float,
                   transition_hz: float = 300.0) -> np.ndarray:
    """Equiripple real bandpass (parity with the premade sets in filters.py)."""
    eps = transition_hz
    bands = [0.0, max(f1 - eps, 0.0) if f1 - eps > 0 else 0.0]
    # remez needs strictly increasing edges; clamp tiny low edges
    lo = max(f1 - eps, 1.0)
    hi = min(f2 + eps, fs / 2.0 - 1.0)
    if f1 <= eps:
        bands = [0.0, f2, hi, fs / 2.0]
        desired = [1.0, 0.0]
    else:
        bands = [0.0, lo, f1, f2, hi, fs / 2.0]
        desired = [0.0, 1.0, 0.0]
    return _sig.remez(ntaps, bands, desired, fs=fs)


def cic_compensator(ntaps: int, stages: int, decim: int, fs_out: float,
                    passband_frac: float = 0.4) -> np.ndarray:
    """FIR equalizing the droop of an N-stage CIC decimator
    (parity wdsp/icfir.c: the radio hardware decimates with CICs whose
    sinc^N response sags across the passband; this inverse-sinc^N filter
    flattens it).

    The compensator runs at the CIC's output rate ``fs_out``; its response
    is 1/|sinc(pi f / (decim*fs_out) * decim)|^N = 1/|sinc(f/fs_out)|^N
    over the passband, rolling off beyond ``passband_frac * fs_out``.
    """
    if ntaps % 2 == 0:
        ntaps += 1
    n = 4096
    f = np.fft.rfftfreq(n, d=1.0 / fs_out)
    # CIC magnitude at its output rate (input rate fs_out*decim):
    # |sin(pi f D / fs_in) / (D sin(pi f / fs_in))|^N
    fin = fs_out * decim
    num = np.sin(np.pi * f * decim / fin)
    den = decim * np.sin(np.pi * f / fin)
    mag = np.ones_like(f)
    nz = den != 0.0
    mag[nz] = np.abs(num[nz] / den[nz])
    mag[~nz] = 1.0
    comp = np.zeros_like(f)
    pb = f <= passband_frac * fs_out
    comp[pb] = 1.0 / np.maximum(mag[pb], 1e-6) ** stages
    # soft rolloff to zero between passband edge and fs/2
    trans = (f > passband_frac * fs_out) & (f < 0.5 * fs_out)
    if trans.any():
        tt = (f[trans] - passband_frac * fs_out) / (
            0.5 * fs_out - passband_frac * fs_out)
        comp[trans] = comp[pb][-1] * 0.5 * (1.0 + np.cos(np.pi * tt))
    h = np.fft.irfft(comp, n)
    h = np.roll(h, ntaps // 2)[:ntaps] * np.blackman(ntaps)
    return h


def freq_response(taps: np.ndarray, fs: float, n: int = 4096):
    """(freqs_hz, complex response) over [-fs/2, fs/2) for design checks."""
    t = np.asarray(taps, dtype=np.complex128)
    H = np.fft.fftshift(np.fft.fft(t, n))
    f = np.fft.fftshift(np.fft.fftfreq(n, d=1.0 / fs))
    return f, H
