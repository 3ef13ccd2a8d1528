"""Spectrum analysis: batched windowed FFT averaging, dB graphs, S-meter,
and frequency measurement.

Parity targets in the reference:
- graph engine (quisk.c:5142 ``get_graph``): Hann-windowed FFTs accumulated
  in a FIFO (quisk.c:2454-2475), magnitudes averaged until the refresh
  interval elapses, converted to dB re full scale, re-binned to screen
  pixels with zoom/pan (5289-5301)
- S-meter: sum of power bins inside the filter passband with a +4.26 dB
  window-leakage correction (quisk.c:5218-5244, 5311)
- measure_frequency (quisk.c:5579-5650): parabolic-interpolated FFT peak
- bandscope (quisk.c:2875): the same engine on raw wideband input

Here the FIFO+GUI-thread split disappears: accumulation is a carried state
array and any consumer reads the running average — no fft_error overruns
(quisk.c:2469) by construction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def make_window(name: str, n: int) -> np.ndarray:
    """Analysis window by name (the reference's Hanning-family graph
    window, quisk.c:5212, plus WDSP's analyzer window options,
    wdsp/analyzer.c window table).  All are cosine-sum windows evaluated
    at runtime — pure data, so switching windows never recompiles."""
    t = 2.0 * np.pi * np.arange(n) / n
    coeffs = {
        "rect": (1.0,),
        "hann": (0.5, -0.5),
        "hamming": (0.54, -0.46),
        "blackman": (0.42, -0.5, 0.08),
        # 4-term -92 dB Blackman-Harris (the wdsp analyzer default family)
        "blackman-harris": (0.35875, -0.48829, 0.14128, -0.01168),
        # SRS flat-top: near-zero scalloping loss, for amplitude accuracy
        "flat-top": (0.21557895, -0.41663158, 0.277263158,
                     -0.083578947, 0.006947368),
    }
    if name not in coeffs:
        raise ValueError(f"unknown window {name!r}; "
                         f"choices: {sorted(coeffs)}")
    return sum(a * np.cos(k * t) for k, a in enumerate(coeffs[name]))


@struct.dataclass
class SpectrumAnalyzer:
    """Accumulating power spectrum over ``[C, block]`` IQ blocks.

    State: (psum [C, fft_size] float32 accumulated power, count scalar).
    ``block`` must be a multiple of ``fft_size``; each block contributes
    block/fft_size windowed FFTs to the average.

    The analysis window and its equivalent-noise-bandwidth correction are
    DATA (same shapes for every choice): :meth:`with_window` swaps them
    on a live analyzer without recompiling, like the reference's analyzer
    window option (wdsp/analyzer.c) — the S-meter stays bin-sum exact for
    every window because the ENBW travels with it.
    """

    window: jnp.ndarray                     # [fft_size] float32
    enbw_bins: jnp.ndarray                  # scalar: window ENBW in bins
    fft_size: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, fft_size: int, block: int, window: str = "hann"):
        if block % fft_size:
            raise ValueError(f"block {block} not a multiple of fft {fft_size}")
        w = make_window(window, fft_size)
        enbw = _enbw_bins(w)
        # normalise so a full-scale complex tone reads 0 dBFS
        w = w / w.sum()
        return cls(window=jnp.asarray(w, jnp.float32),
                   enbw_bins=jnp.float32(enbw),
                   fft_size=fft_size, block=block)

    def with_window(self, window: str) -> "SpectrumAnalyzer":
        """Same analyzer, different window — data only, no recompile."""
        w = make_window(window, self.fft_size)
        enbw = _enbw_bins(w)
        w = w / w.sum()
        return self.replace(window=jnp.asarray(w, jnp.float32),
                            enbw_bins=jnp.float32(enbw))

    def init_state(self, channels: int):
        return (jnp.zeros((channels, self.fft_size), jnp.float32),
                jnp.zeros((), jnp.float32))

    def accumulate(self, state, x: jnp.ndarray):
        psum, count = state
        C = x.shape[0]
        nseg = self.block // self.fft_size
        segs = x.reshape(C, nseg, self.fft_size) * self.window
        X = jnp.fft.fft(segs, axis=-1)
        p = jnp.mean(jnp.abs(X) ** 2, axis=1)
        return (psum + p, count + 1.0), None

    def power(self, state) -> jnp.ndarray:
        """Averaged linear power, fftshifted so index 0 = -fs/2. [C, F]."""
        psum, count = state
        return jnp.fft.fftshift(psum / jnp.maximum(count, 1.0), axes=-1)

    def graph_db(self, state, floor_db: float = -180.0) -> jnp.ndarray:
        """Averaged spectrum in dB re full-scale tone. [C, F]."""
        p = self.power(state)
        return 10.0 * jnp.log10(jnp.maximum(p, 10.0 ** (floor_db / 10.0)))

    def freqs(self, sample_rate: float) -> np.ndarray:
        return np.fft.fftshift(np.fft.fftfreq(self.fft_size, 1.0 / sample_rate))

    def smeter_power(self, state, sample_rate: float, f_lo, f_hi) -> jnp.ndarray:
        """Total power in [f_lo, f_hi] per channel (linear).

        f_lo/f_hi: scalars or [C] arrays — per-channel passbands supported.
        Corrects for the CURRENT window's incoherent power gain (ENBW in
        bins, carried as data) so a tone's bin-summed power is exact for
        every window choice — the per-window generalisation of the
        reference's fixed Hann leakage correction (quisk.c:5311)."""
        p = self.power(state)
        f = jnp.asarray(self.freqs(sample_rate), jnp.float32)
        lo = jnp.broadcast_to(jnp.asarray(f_lo, jnp.float32), (p.shape[0],))
        hi = jnp.broadcast_to(jnp.asarray(f_hi, jnp.float32), (p.shape[0],))
        mask = (f[None, :] >= lo[:, None]) & (f[None, :] <= hi[:, None])
        return jnp.sum(jnp.where(mask, p, 0.0), axis=-1) / self.enbw_bins

    def reset(self, state):
        psum, count = state
        return (jnp.zeros_like(psum), jnp.zeros_like(count))


def _enbw_bins(w: np.ndarray) -> float:
    """Equivalent noise bandwidth of a window, in FFT bins: the factor by
    which windowing spreads a tone's power across neighbouring bins
    (1.0 rect, 1.5 Hann, ~2.0 Blackman-Harris 4-term, ~3.77 flat-top)."""
    w = np.asarray(w, np.float64)
    return float(len(w) * np.sum(w ** 2) / np.sum(w) ** 2)


def measure_frequency(x: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """Estimate the dominant tone frequency per channel ``[C]`` from one
    block, FFT peak + parabolic interpolation (quisk.c:5579 semantics)."""
    C, B = x.shape
    w = jnp.asarray(hann(B), jnp.float32)
    X = jnp.fft.fft(x * w, axis=-1)
    mag = jnp.abs(X)
    k = jnp.argmax(mag, axis=-1)
    km1 = (k - 1) % B
    kp1 = (k + 1) % B
    c = jnp.take_along_axis(mag, k[:, None], axis=-1)[:, 0]
    a = jnp.take_along_axis(mag, km1[:, None], axis=-1)[:, 0]
    b = jnp.take_along_axis(mag, kp1[:, None], axis=-1)[:, 0]
    denom = a - 2 * c + b
    mu = jnp.where(jnp.abs(denom) > 1e-20, 0.5 * (a - b) / denom, 0.0)
    kf = k.astype(jnp.float32) + mu
    # map bin to signed frequency
    kf = jnp.where(kf > B / 2, kf - B, kf)
    return kf * (sample_rate / B)


def _rebin_geometry(F: int, pixels: int, zoom: float, center_frac: float):
    span = int(F / zoom)
    start = int(F / 2 + center_frac * F - span / 2)
    start = max(0, min(F - span, start))
    per = max(1, span // pixels)
    return start, per


def rebin_pixels(db: jnp.ndarray, pixels: int, zoom: float = 1.0,
                 center_frac: float = 0.0) -> jnp.ndarray:
    """Re-bin a [C, F] dB spectrum to [C, pixels] for display, max-holding
    within each pixel (zoom >= 1 narrows the view about center_frac of fs).
    Use :func:`rebin_freqs` for the matching pixel center frequencies."""
    C, F = db.shape
    start, per = _rebin_geometry(F, pixels, zoom, center_frac)
    v = db[:, start:start + per * pixels].reshape(C, pixels, per)
    return jnp.max(v, axis=-1)


def rebin_freqs(freqs: np.ndarray, pixels: int, zoom: float = 1.0,
                center_frac: float = 0.0) -> np.ndarray:
    """Center frequency of each display pixel produced by rebin_pixels."""
    F = len(freqs)
    start, per = _rebin_geometry(F, pixels, zoom, center_frac)
    idx = start + np.arange(pixels) * per + per // 2
    return np.asarray(freqs)[np.minimum(idx, F - 1)]
