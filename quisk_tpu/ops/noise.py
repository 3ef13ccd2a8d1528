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
        # widen the pulse with the raised-cosine kernel -> blanking depth.
        # FFT convolution: at wideband rates the kernel is ~1000 taps
        # (500 us half-window), and a feature-1 direct conv over
        # [C, 40960] is ~40 GFLOP of VPU work per block; rfft/irfft is
        # ~6x cheaper and identical (symmetric kernel, real signals).
        B = x.shape[-1]
        K = self.kwidth
        nfft = 1 << int(np.ceil(np.log2(B + K - 1)))
        pw_full = jnp.fft.irfft(
            jnp.fft.rfft(pulse, nfft) * jnp.fft.rfft(self.kernel, nfft),
            nfft)
        pw = pw_full[:, K // 2: K // 2 + B]      # 'same' centered alignment
        gain = jnp.clip(1.0 - pw, 0.0, 1.0)
        new_hist = xe[:, xe.shape[-1] - (self.avg_win - 1):]
        return new_hist, x * gain


@struct.dataclass
class SpectralNoiseBlanker:
    """Spectral noise blanker: excise impulse energy in the STFT domain
    (parity wdsp/snb.c, 855 LoC — detect/interpolate corrupted bins).

    Impulses are broadband: a frame whose broadband power jumps far above
    the tracked background is flagged, the flag is dilated one frame each
    way (the window-attenuated halves of a straddling hit are too weak to
    trip the detector but strong enough to click), and flagged frames'
    spectra are replaced by the last clean frame's — so carriers and voice
    running through the hit survive where a time blanker would notch them.
    Dilation also guarantees the stored "clean" spectrum never holds
    sub-threshold impulse leakage.  sqrt-Hann STFT at 50% overlap.

    State: (in_tail [C,H], out_tail [C,H], bg_power [C], prev frame flagged
    [C], last clean spectrum re/im [C,F]).
    """

    window: jnp.ndarray
    fft: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    k_detect: float = struct.field(pytree_node=False)
    bg_rate: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, fft: int = 256, k_detect: float = 8.0,
               bg_rate: float = 0.05):
        if block % (fft // 2):
            raise ValueError("block must be a multiple of fft/2")
        w = np.sqrt(np.hanning(fft + 1)[:fft])
        return cls(window=jnp.asarray(w, jnp.float32), fft=fft, block=block,
                   k_detect=float(k_detect), bg_rate=float(bg_rate))

    def init_state(self, channels: int):
        H = self.fft // 2
        F = self.fft // 2 + 1
        return (jnp.zeros((channels, H), jnp.float32),
                jnp.zeros((channels, H), jnp.float32),
                # background starts HIGH and falls onto the clean level —
                # starting low would flag every frame and never update
                jnp.full((channels,), 1e6, jnp.float32),
                jnp.zeros((channels,), jnp.float32),
                jnp.zeros((channels, F), jnp.float32),
                jnp.zeros((channels, F), jnp.float32))

    def __call__(self, state, a: jnp.ndarray):
        in_tail, out_tail, bg, prev_bad, clean_re, clean_im = state
        C = a.shape[0]
        H = self.fft // 2
        nfrm = a.shape[-1] // H
        ext = jnp.concatenate([in_tail, a], axis=-1)
        idx = (jnp.arange(nfrm) * H)[:, None] + jnp.arange(self.fft)[None, :]
        frames = ext[:, idx] * self.window
        X = jnp.fft.rfft(frames, axis=-1)
        pw = jnp.mean(jnp.abs(X) ** 2, axis=-1)       # [C, nfrm]

        def frame_step(carry, p):
            bg = carry
            bad = (p > self.k_detect * bg).astype(jnp.float32)
            # background tracks only clean frames: rises slowly (impulse
            # tails must not lift it) but falls fast (so the high initial
            # value converges within ~20 frames)
            rate = jnp.where(p > bg, self.bg_rate, 0.5)
            bg = jnp.where(bad > 0, bg, bg + rate * (p - bg))
            return bg, bad

        bg, badf = jax.lax.scan(frame_step, bg, jnp.moveaxis(pw, 1, 0))
        badf = jnp.moveaxis(badf, 0, 1)               # [C, nfrm]
        # dilate one frame each way: a hit's window-attenuated half in the
        # neighbouring frame is blanked even when under threshold (the
        # backward edge of frame 0 uses the previous block's last flag)
        left = jnp.concatenate([prev_bad[:, None], badf[:, :-1]], axis=-1)
        right = jnp.concatenate([badf[:, 1:], badf[:, -1:]], axis=-1)
        dil = jnp.maximum(badf, jnp.maximum(left, right))
        prev_bad = badf[:, -1]

        # substitute flagged frames with the last clean frame's spectrum
        def subst_step(carry, xs):
            cre, cim = carry
            xre, xim, d = xs
            yre = jnp.where(d[:, None] > 0, cre, xre)
            yim = jnp.where(d[:, None] > 0, cim, xim)
            cre = jnp.where(d[:, None] > 0, cre, xre)
            cim = jnp.where(d[:, None] > 0, cim, xim)
            return (cre, cim), (yre, yim)

        (clean_re, clean_im), (yre, yim) = jax.lax.scan(
            subst_step, (clean_re, clean_im),
            (jnp.moveaxis(jnp.real(X), 1, 0), jnp.moveaxis(jnp.imag(X), 1, 0),
             jnp.moveaxis(dil, 1, 0)))
        Y = jax.lax.complex(jnp.moveaxis(yre, 0, 1), jnp.moveaxis(yim, 0, 1))
        y = jnp.fft.irfft(Y, n=self.fft, axis=-1) * self.window
        out = jnp.zeros((C, (nfrm + 1) * H), jnp.float32)
        out = out.at[:, idx].add(y)
        out = out.at[:, :H].add(out_tail)
        return ((ext[:, ext.shape[-1] - H:], out[:, nfrm * H:(nfrm + 1) * H],
                 bg, prev_bad, clean_re, clean_im), out[:, : nfrm * H])


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
