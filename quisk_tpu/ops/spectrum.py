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
import jax
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
    #: analysis hop in samples; hop == fft_size is the disjoint-frame
    #: mode (r4 default).  hop < fft_size enables OVERLAPPED capture
    #: (wdsp/analyzer.c parity: the reference analyzer's overlap >= 0
    #: frame scheduling, analyzer.c SetAnalyzer/overlap) — with a Hann
    #: window at 50% overlap every sample gets full weight somewhere, so
    #: short transients can't hide in a window null at a frame edge.
    hop: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, fft_size: int, block: int, window: str = "hann",
               overlap: float = 0.0):
        """``overlap`` is the frame-overlap fraction (0, 0.5, 0.75, ...):
        hop = fft_size*(1-overlap) must divide both fft_size and block."""
        if block % fft_size:
            raise ValueError(f"block {block} not a multiple of fft {fft_size}")
        hop = int(round(fft_size * (1.0 - overlap)))
        if not 0 < hop <= fft_size or fft_size % hop or block % hop:
            raise ValueError(
                f"overlap {overlap} needs hop = fft*(1-overlap) to divide "
                f"fft_size {fft_size} and block {block} (got hop {hop})")
        w = make_window(window, fft_size)
        enbw = _enbw_bins(w)
        # normalise so a full-scale complex tone reads 0 dBFS
        w = w / w.sum()
        return cls(window=jnp.asarray(w, jnp.float32),
                   enbw_bins=jnp.float32(enbw),
                   fft_size=fft_size, block=block, hop=hop)

    def with_window(self, window: str) -> "SpectrumAnalyzer":
        """Same analyzer, different window — data only, no recompile."""
        w = make_window(window, self.fft_size)
        enbw = _enbw_bins(w)
        w = w / w.sum()
        return self.replace(window=jnp.asarray(w, jnp.float32),
                            enbw_bins=jnp.float32(enbw))

    def init_state(self, channels: int):
        base = (jnp.zeros((channels, self.fft_size), jnp.float32),
                jnp.zeros((), jnp.float32))
        if self.hop == self.fft_size:
            return base
        # overlapped mode carries the trailing fft-hop input samples as
        # (re, im) f32 planes (complex64 must not cross the boundary)
        h = self.fft_size - self.hop
        return base + (jnp.zeros((channels, h), jnp.float32),
                       jnp.zeros((channels, h), jnp.float32))

    def accumulate(self, state, x: jnp.ndarray):
        L = self.fft_size
        C = x.shape[0]
        if self.hop == L:                         # disjoint frames
            psum, count = state
            segs = x.reshape(C, -1, L) * self.window
            X = jnp.fft.fft(segs, axis=-1)
            p = jnp.mean(jnp.abs(X) ** 2, axis=1)
            return (psum + p, count + 1.0), None
        # overlapped frames: q = L/hop strided reshape VIEWS of the
        # history-extended block (no gather, no materialized frame stack
        # beyond the windowed segments the FFT needs anyway); frame i*hop
        # lives in view group i = (i mod q)
        psum, count, hr, hi = state
        hop = self.hop
        q = L // hop
        xr = jnp.concatenate([hr, jnp.real(x)], axis=-1)
        xi = jnp.concatenate([hi, jnp.imag(x)], axis=-1)
        n = xr.shape[-1]                          # block + L - hop
        total = x.shape[-1] // hop                # frames this block
        p = jnp.zeros((C, L), jnp.float32)
        for i in range(q):
            nj = (n - i * hop - L) // L + 1
            sr = xr[:, i * hop: i * hop + nj * L].reshape(C, nj, L)
            si = xi[:, i * hop: i * hop + nj * L].reshape(C, nj, L)
            seg = jnp.fft.fft(jax.lax.complex(sr, si) * self.window,
                              axis=-1)
            p = p + jnp.sum(jnp.abs(seg) ** 2, axis=1)
        new_h = (xr[:, n - (L - hop):], xi[:, n - (L - hop):])
        return (psum + p / total, count + 1.0) + new_h, None

    def power(self, state) -> jnp.ndarray:
        """Averaged linear power, fftshifted so index 0 = -fs/2. [C, F]."""
        psum, count = state[0], state[1]
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
        """Zero the running average; overlapped mode keeps its sample
        history (only one frame of transient either way)."""
        psum, count = state[0], state[1]
        return (jnp.zeros_like(psum), jnp.zeros_like(count)) + tuple(
            state[2:])


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


@struct.dataclass
class ZoomSpectrum:
    """Zoom-FFT: re-capture a narrow passband at ``decim``-times finer
    frequency resolution than the base analyzer.

    ``rebin_pixels`` zoom is pixel re-binning of ONE base-resolution
    capture — past zoom ~ fft_size/pixels the display gains no new
    information.  WDSP's analyzer instead re-captures at the span it is
    asked to show (multi-resolution capture: wdsp/analyzer.c:1-120
    SetAnalyzer span/overlap management).  The TPU-native equivalent:
    mix the view center to baseband (NCO), lowpass + decimate by D on
    the MXU (MatmulFIR), and run a :class:`SpectrumAnalyzer` (overlap
    supported) at rate fs/D — same fft_size, span fs/D, resolution D x
    finer.  Streaming: NCO phase, FIR history and the analyzer average
    are all carried state, so the zoomed view converges while the radio
    keeps running, and ``retuned`` moves the view center without
    recompiling (the NCO word is data).
    """

    nco: "object"                  # NCO at the view center
    fir: "object"                  # MatmulFIR lowpass decimator
    an: SpectrumAnalyzer
    decim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, fft_size: int, block: int, center_hz: float,
               sample_rate: float, decim: int, window: str = "hann",
               overlap: float = 0.5, atten_db: float = 80.0):
        from quisk_tpu.ops.design import kaiser_lowpass
        from quisk_tpu.ops.fir import MatmulFIR
        from quisk_tpu.ops.nco import NCO
        if block % decim or (block // decim) % fft_size:
            raise ValueError("need decim | block and fft_size | block/decim")
        # anti-alias lowpass at 90% of the zoomed Nyquist
        taps = kaiser_lowpass(0.45 * sample_rate / decim, sample_rate,
                              atten_db=atten_db)
        return cls(nco=NCO.create(center_hz, sample_rate, block, 1),
                   fir=MatmulFIR.create(taps, block, decim=decim),
                   an=SpectrumAnalyzer.create(fft_size, block // decim,
                                              window=window,
                                              overlap=overlap),
                   decim=decim)

    def retuned(self, center_hz: float, sample_rate: float) -> "ZoomSpectrum":
        """Move the view center — NCO word is data, no recompile."""
        from quisk_tpu.ops.nco import NCO
        return self.replace(nco=NCO.create(center_hz, sample_rate,
                                           self.nco.block, 1))

    def init_state(self, channels: int):
        return (self.nco.init_state(channels),
                self.fir.init_state(channels),
                self.an.init_state(channels))

    def accumulate(self, state, x: jnp.ndarray):
        ph, fh, an_st = state
        ph, bb = self.nco(ph, x)
        fh, y = self.fir(fh, bb)
        an_st, _ = self.an.accumulate(an_st, y)
        return (ph, fh, an_st), None

    def graph_db(self, state, floor_db: float = -180.0) -> jnp.ndarray:
        return self.an.graph_db(state[2], floor_db)

    def power(self, state) -> jnp.ndarray:
        return self.an.power(state[2])

    def freqs(self, sample_rate: float, center_hz: float = 0.0) -> np.ndarray:
        """Absolute pixel frequencies of the zoomed view."""
        return center_hz + self.an.freqs(sample_rate / self.decim)
