"""Noise mitigation: impulse noise blanker and FFT-domain auto-notch.

Parity targets:
- Noise blanker (quisk.c:680 ``NoiseBlanker``): sliding magnitude average,
  pulse = sample > avg * limit (limits 6.0/4.0/2.5 by level), samples zeroed
  during the pulse with raised-cosine windows (~500 us half-window) before
  and after so the blanking itself doesn't click.
- Auto-notch (quisk.c:794 ``dAutoNotch``): block FFT of the audio, find up
  to two persistent spectral peaks, design an FFT-domain notch FIR (zero the
  bins, IFFT, window, re-FFT) and apply by overlap-save block convolution.

Both are fully vectorised over ``[C, B]``: the blanker's pulse-widening is a
convolution of the pulse mask with a raised-cosine kernel; the notch filter
re-design happens every block from data (no recompiles) and its application
reuses the overlap-save machinery.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NoiseBlanker:
    """Impulse blanker on raw IQ blocks.

    State: hist [C, W-1 + K-1] (enough input history for the moving average
    and the widening kernel to be streaming-exact at block joins is NOT kept
    — the reference also treats each buffer independently; we keep the
    moving-average history only).
    """

    kernel: jnp.ndarray                  # [K] raised-cosine widening kernel
    limit: jnp.ndarray
    avg_win: int = struct.field(pytree_node=False)
    kwidth: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, level: int = 2,
               half_window_us: float = 500.0, avg_win: int = 64):
        limit = {1: 6.0, 2: 4.0, 3: 2.5}[level]   # reference quisk.c:716-727
        K = 2 * max(1, int(half_window_us * 1e-6 * sample_rate)) + 1
        k = 0.5 + 0.5 * np.cos(np.linspace(-np.pi, np.pi, K))  # peak at center
        return cls(kernel=jnp.asarray(k, jnp.float32), limit=jnp.float32(limit),
                   avg_win=avg_win, kwidth=K)

    def init_state(self, channels: int):
        # host numpy: complex64 cannot cross the host<->device boundary
        return np.zeros((channels, self.avg_win - 1), np.complex64)

    def __call__(self, hist, x: jnp.ndarray):
        xe = jnp.concatenate([hist, x], axis=-1)
        mag = jnp.abs(xe)
        # moving average of |x| over avg_win (streaming via history)
        csum = jnp.cumsum(mag, axis=-1)
        w = self.avg_win
        avg = (csum[:, w - 1:] - jnp.concatenate(
            [jnp.zeros_like(csum[:, :1]), csum[:, :-w]], axis=-1)) / w
        m = jnp.abs(x)
        pulse = (m > self.limit * jnp.maximum(avg, 1e-12)).astype(jnp.float32)
        # widen the pulse with the raised-cosine kernel -> blanking depth
        pw = jax.lax.conv_general_dilated(
            pulse[:, None, :], self.kernel[None, None, :], (1,),
            padding=[(self.kwidth // 2, self.kwidth // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]
        gain = jnp.clip(1.0 - pw, 0.0, 1.0)
        new_hist = xe[:, xe.shape[-1] - (self.avg_win - 1):]
        return new_hist, x * gain


@struct.dataclass
class AutoNotch:
    """Automatic multi-tone notch on audio blocks.

    Tracks a smoothed power spectrum per channel, finds up to ``n_notch``
    persistent peaks, builds a windowed notch FIR in the frequency domain
    each block (data only), applies it overlap-save style.

    State: (ema spectrum [C, F], input history [C, T-1]).
    """

    window: jnp.ndarray                  # [T] FIR design window
    depth_bins: int = struct.field(pytree_node=False)
    n_notch: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    nfft: int = struct.field(pytree_node=False)
    ntaps: int = struct.field(pytree_node=False)
    ema: float = struct.field(pytree_node=False)
    snr_open: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, ntaps: int | None = None, n_notch: int = 2,
               width_bins: int = 4, ema: float = 0.7, snr_open_db: float = 12.0):
        if ntaps is None:
            # notch depth needs FIR frequency resolution finer than the
            # notch width: use a block-length filter (the reference's design
            # runs at its FFT size too, quisk.c:910-949)
            ntaps = block + 1
        nfft = 1 << (block + ntaps - 1 - 1).bit_length()
        w = np.hanning(ntaps)
        return cls(window=jnp.asarray(w, jnp.float32), depth_bins=width_bins,
                   n_notch=n_notch, block=block, nfft=nfft, ntaps=ntaps,
                   ema=ema, snr_open=10 ** (snr_open_db / 10.0))

    def init_state(self, channels: int):
        return (jnp.zeros((channels, self.nfft), jnp.float32),
                jnp.zeros((channels, self.ntaps - 1), jnp.float32))

    def _design_mask(self, spec: jnp.ndarray) -> jnp.ndarray:
        """[C, nfft] complex frequency response of the notch FIR."""
        C, F = spec.shape
        med = jnp.median(spec, axis=-1, keepdims=True) + 1e-20
        mask = jnp.ones((C, F), jnp.float32)
        s = spec
        for _ in range(self.n_notch):
            k = jnp.argmax(s, axis=-1)
            peaky = (jnp.take_along_axis(s, k[:, None], 1)[:, 0]
                     > self.snr_open * med[:, 0])
            offs = jnp.arange(-self.depth_bins, self.depth_bins + 1)
            idx = (k[:, None] + offs[None, :]) % F
            hit = jnp.zeros((C, F), jnp.float32)
            hit = hit.at[jnp.arange(C)[:, None], idx].set(1.0)
            hit = hit * peaky[:, None]
            # also notch the conjugate bins (real audio symmetric spectrum)
            mask = mask * (1.0 - hit) * (1.0 - hit[:, ::-1])
            s = s * (1.0 - hit) * (1.0 - hit[:, ::-1])
        # brick mask -> windowed FIR -> actual applied response
        h = jnp.fft.ifft(mask.astype(jnp.complex64), axis=-1)
        h = jnp.roll(h, self.ntaps // 2, axis=-1)[:, : self.ntaps]
        h = h * self.window
        return jnp.fft.fft(h, n=self.nfft, axis=-1)

    def __call__(self, state, a: jnp.ndarray):
        spec_ema, hist = state
        # update smoothed spectrum from this block
        A = jnp.abs(jnp.fft.fft(a, n=self.nfft, axis=-1)) ** 2
        spec_ema = self.ema * spec_ema + (1.0 - self.ema) * A
        H = self._design_mask(spec_ema)
        xe = jnp.concatenate([hist, a], axis=-1)
        X = jnp.fft.fft(xe.astype(jnp.complex64), n=self.nfft, axis=-1)
        y = jnp.fft.ifft(X * H, axis=-1)
        y = jnp.real(y[:, self.ntaps - 1: self.ntaps - 1 + self.block])
        # compensate the FIR group delay bookkeeping: output aligned to input
        new_hist = xe[:, xe.shape[-1] - (self.ntaps - 1):]
        return (spec_ema, new_hist), y
