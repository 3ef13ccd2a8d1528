"""Reference DSP in float64 NumPy, one function per kernel under test.

These are *independent* implementations of the documented algorithms (see
SURVEY.md §2 for the reference file:line of each), used only by tests — no
JAX, no float32, sequential semantics where the real thing is sequential.
"""

from __future__ import annotations

import numpy as np

TWO_PI = 2.0 * np.pi


def fir_stream(x: np.ndarray, taps: np.ndarray, hist: np.ndarray | None = None,
               decim: int = 1):
    """Streaming FIR: y[n] = sum_k h[k] x[n*decim - k], with carried history.

    Returns (new_hist, y).  x: [N] (1-D, single channel).
    """
    taps = np.asarray(taps)
    T = len(taps)
    if hist is None:
        hist = np.zeros(T - 1, dtype=np.result_type(x.dtype, taps.dtype))
    xe = np.concatenate([hist, x])
    full = np.convolve(xe, taps, mode="full")
    # valid, fully-overlapped outputs start at index T-1 of `full` relative
    # to xe; stream position 0 of this block is xe index T-1.
    y = full[T - 1: T - 1 + len(x): decim]
    return xe[len(xe) - (T - 1):], y


def nco_phase(n0: int, count: int, freq_hz: float, fs: float) -> np.ndarray:
    """Exact integer-accumulator NCO phase angles (matches ops/nco.py)."""
    word = int(round(freq_hz / fs * 2**32)) % 2**32
    idx = (n0 + np.arange(count, dtype=np.int64)) * word % 2**32
    return idx.astype(np.float64) * (TWO_PI / 2**32)


def mix_down(x: np.ndarray, freq_hz: float, fs: float, n0: int = 0) -> np.ndarray:
    return x * np.exp(-1j * nco_phase(n0, len(x), freq_hz, fs))


def ssb_demod(x: np.ndarray, gain: float = 2.0) -> np.ndarray:
    return gain * np.real(x)


def am_demod(x: np.ndarray, pole: float = 0.995, gain: float = 2.0,
             x_prev: float = 0.0, y_prev: float = 0.0) -> np.ndarray:
    env = np.abs(x)
    y = np.empty_like(env)
    for n in range(len(env)):
        yn = env[n] - x_prev + pole * y_prev
        x_prev, y_prev = env[n], yn
        y[n] = yn
    return gain * y


def fm_demod(x: np.ndarray, fs: float, deviation_hz: float = 5000.0,
             deemph_hz: float = 300.0, prev: complex = 0.0,
             y_prev: float = 0.0) -> np.ndarray:
    d = x * np.conj(np.concatenate([[prev], x[:-1]]))
    disc = np.arctan2(d.imag, d.real) * (fs / (TWO_PI * deviation_hz))
    a = np.exp(-TWO_PI * deemph_hz / fs)
    b = 1.0 - a
    y = np.empty_like(disc)
    for n in range(len(disc)):
        y_prev = a * y_prev + b * disc[n]
        y[n] = y_prev
    return y


def one_pole(x: np.ndarray, a: float, b: float, y_prev: float = 0.0) -> np.ndarray:
    y = np.empty_like(x)
    for n in range(len(x)):
        y_prev = a * y_prev + b * x[n]
        y[n] = y_prev
    return y


def snr_db(ref: np.ndarray, test: np.ndarray, skip: int = 0) -> float:
    """SNR of `test` against `ref` in dB, optionally skipping a transient."""
    r = np.asarray(ref)[skip:]
    t = np.asarray(test)[skip:]
    err = r - t
    p_sig = np.mean(np.abs(r) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    if p_err == 0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_err)


def align_and_snr(ref: np.ndarray, test: np.ndarray, max_lag: int = 0,
                  skip: int = 0, scale: bool = True) -> float:
    """SNR after optimally scaling (and optionally lag-aligning) `test`.

    Used for end-to-end chain checks where a pure delay / gain difference is
    expected (different but equivalent filter implementations).
    """
    r = np.asarray(ref, dtype=np.float64)[skip:]
    t = np.asarray(test, dtype=np.float64)[skip:]
    best = -np.inf
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            a, b = r[lag:], t[: len(t) - lag]
        else:
            a, b = r[: len(r) + lag], t[-lag:]
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        g = (np.dot(a, b) / np.dot(b, b)) if scale and np.dot(b, b) > 0 else 1.0
        best = max(best, snr_db(a, g * b))
    return best
