"""Noise reduction: spectral MMSE NR (NR2), block-LMS ANR/ANF, sync-AM PLL.

Parity targets in WDSP (SURVEY.md §2.2):
- emnr.c (1174 LoC): Ephraim-Malah spectral noise reduction with
  precomputed gain tables (calculus.c data table; emnr.c:315-326) — here an
  STFT (sqrt-Hann, 50% overlap-add) with a decision-directed a-priori SNR
  estimator and the MMSE-LSA gain evaluated *directly* on the VPU via a
  rational E1 approximation: on TPU the reference's table becomes a
  dynamic gather, measured 3.4x slower than closed-form evaluation.
- anr.c / anf.c (LMS adaptive noise reduction / auto-notch): here a
  frequency-domain block-LMS adaptive linear predictor; the prediction is
  the tonal (correlated) part — ANF subtracts it, ANR keeps it.
- amd.c synchronous AM: a per-sample PLL (lax.scan over the block, states
  vectorised over channels) that locks to the carrier and demodulates
  coherently, with the same second-order loop shape.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------- STFT NR


def _exp1(v: jnp.ndarray) -> jnp.ndarray:
    """Exponential integral E1(v), v > 0 — Abramowitz & Stegun 5.1.53
    (v <= 1, poly, |err| < 2e-7) / 5.1.56 (v >= 1, rational, |err| < 2e-8).

    The reference precomputes 241x241 gain tables (emnr.c:315-326 over
    calculus.c's data) because per-bin E1 is expensive on a CPU; on TPU
    the table becomes a *dynamic gather*, which measured 3.4x slower than
    evaluating this closed form on the VPU (24.4 -> 7.2 ms at 1024ch), and
    the direct evaluation is also more accurate (no grid quantization)."""
    v = jnp.maximum(v, 1e-10)
    small = v <= 1.0
    vs = jnp.where(small, v, 1.0)
    poly = (-0.57721566 + vs * (0.99999193 + vs * (-0.24991055 + vs * (
        0.05519968 + vs * (-0.00976004 + vs * 0.00107857)))))
    e1_small = -jnp.log(vs) + poly
    vl = jnp.where(small, 1.0, v)
    num = (((vl + 8.5733287401) * vl + 18.059016973) * vl
           + 8.6347608925) * vl + 0.2677737343
    den = (((vl + 9.5733223454) * vl + 25.6329561486) * vl
           + 21.0996530827) * vl + 3.9584969228
    e1_large = jnp.exp(-vl) / vl * (num / den)
    return jnp.where(small, e1_small, e1_large)


@struct.dataclass
class SpectralNR:
    """MMSE-LSA spectral noise reduction on real audio ``[C, block]``.

    STFT with sqrt-Hann analysis/synthesis windows at 50% overlap; noise
    PSD tracked by exponential minimum-statistics; a-priori SNR by the
    decision-directed rule; spectral gain = the MMSE-LSA estimator
    G = xi/(1+xi) * exp(E1(v)/2) evaluated directly on the VPU (see
    ``_exp1`` for why this beats the reference's precomputed tables here).

    State: (in_tail [C, H], out_tail [C, H], noise_psd [C, F], prev_s2
    [C, F]) with H = fft/2 hop and F = fft/2+1 rFFT bins.
    """

    window: jnp.ndarray          # [fft] sqrt-Hann
    fft: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    alpha: float = struct.field(pytree_node=False)      # decision-directed
    noise_up: float = struct.field(pytree_node=False)   # noise PSD rise rate
    noise_down: float = struct.field(pytree_node=False)
    gain_floor: float = struct.field(pytree_node=False)
    #: optional MXU matmul rfft/irfft pair (ops/mxdft.MatmulRDFT) —
    #: the TPU FFT unit is the documented slow path (CLAUDE.md)
    rdft: Any = None

    @classmethod
    def create(cls, block: int, fft: int = 512, alpha: float = 0.98,
               gain_floor_db: float = -18.0, mxu_dft: bool = False):
        if block % (fft // 2):
            raise ValueError("block must be a multiple of fft/2")
        rdft = None
        if mxu_dft:
            from quisk_tpu.ops.mxdft import MatmulRDFT
            rdft = MatmulRDFT.create(fft)
        w = np.sqrt(np.hanning(fft + 1)[:fft])
        return cls(window=jnp.asarray(w, jnp.float32), rdft=rdft,
                   fft=fft, block=block, alpha=alpha,
                   # quantile tracker on the time-smoothed PSD: equilibrium
                   # where p_below*ln(down) + p_above*ln(up) = 0 puts the
                   # estimate near the ~30th percentile of the smoothed PSD;
                   # a x2 bias factor in the gain maps that to the mean
                   noise_up=1.008, noise_down=0.98,
                   gain_floor=10 ** (gain_floor_db / 20.0))

    def init_state(self, channels: int):
        H = self.fft // 2
        F = self.fft // 2 + 1
        # (in_tail, out_tail, noise_psd, prev_s2, psd_ema); noise starts
        # HIGH and falls fast - starting low would take seconds to climb
        return (jnp.zeros((channels, H), jnp.float32),
                jnp.zeros((channels, H), jnp.float32),
                jnp.full((channels, F), 10.0, jnp.float32),
                jnp.zeros((channels, F), jnp.float32),
                jnp.zeros((channels, F), jnp.float32))

    def _frame_gain(self, S2, noise_psd, prev_s2):
        """Per-frame MMSE-LSA gain, evaluated directly.  noise_psd is the
        quantile track; x2 corrects it to the mean noise power, and a
        further 1.25x over-subtraction compensates the (slight) optimism of
        the exact estimator vs the floor-quantized table it replaced."""
        noise_psd = 2.5 * noise_psd
        gamma = jnp.clip(S2 / jnp.maximum(noise_psd, 1e-12), 1e-4, 1e2)
        xi = (self.alpha * prev_s2 / jnp.maximum(noise_psd, 1e-12)
              + (1.0 - self.alpha) * jnp.maximum(gamma - 1.0, 0.0))
        xi = jnp.clip(xi, 1e-4, 1e2)
        r = xi / (1.0 + xi)
        g = r * jnp.exp(0.5 * _exp1(jnp.clip(r * gamma, 1e-10, 700.0)))
        return jnp.maximum(g, self.gain_floor)

    def __call__(self, state, a: jnp.ndarray):
        in_tail, out_tail, noise_psd, prev_s2, psd_ema = state
        C = a.shape[0]
        H = self.fft // 2
        nfrm = a.shape[-1] // H
        ext = jnp.concatenate([in_tail, a], axis=-1)     # [C, H*(nfrm+1)]

        # frames [C, nfrm, fft] with 50% overlap, as a view stack (two
        # shifted tile views concatenated — no gather)
        tiles = ext.reshape(C, nfrm + 1, H)
        frames = jnp.concatenate([tiles[:, :-1], tiles[:, 1:]],
                                 axis=-1) * self.window   # [C, nfrm, fft]
        if self.rdft is not None:
            Xr, Xi = self.rdft.rfft_ri(frames)
            S2 = Xr * Xr + Xi * Xi
        else:
            X = jnp.fft.rfft(frames, axis=-1)
            S2 = jnp.abs(X) ** 2

        # sequential per-frame noise tracking + gain (scan over frames)
        def frame_step(carry, xs):
            npsd, ps2, pema = carry
            s2 = xs                                       # [C, F]
            pema = 0.8 * pema + 0.2 * s2                  # smooth the PSD
            npsd = jnp.where(pema < npsd, npsd * self.noise_down,
                             npsd * self.noise_up)
            npsd = jnp.minimum(npsd, pema + 1e-12)
            g = self._frame_gain(s2, npsd, ps2)
            ps2 = (g ** 2) * s2
            return (npsd, ps2, pema), g

        from quisk_tpu.ops.scanutil import unrolled_scan
        (noise_psd, prev_s2, psd_ema), gains = unrolled_scan(
            frame_step, (noise_psd, prev_s2, psd_ema),
            jnp.moveaxis(S2, 1, 0), unroll=8)
        gains = jnp.moveaxis(gains, 0, 1)                 # [C, nfrm, F]

        if self.rdft is not None:
            y = self.rdft.irfft_ri(Xr * gains, Xi * gains) * self.window
        else:
            Y = X * gains.astype(X.dtype)
            y = jnp.fft.irfft(Y, n=self.fft, axis=-1) * self.window

        # overlap-add via shifted half-frame views (no scatter): output
        # tile t = first half of frame t + second half of frame t-1
        out_tiles = (jnp.pad(y[:, :, :H], ((0, 0), (0, 1), (0, 0)))
                     + jnp.pad(y[:, :, H:], ((0, 0), (1, 0), (0, 0))))
        out_tiles = out_tiles.at[:, 0].add(out_tail)
        out = out_tiles.reshape(C, (nfrm + 1) * H)
        new_out_tail = out[:, nfrm * H:(nfrm + 1) * H]
        audio = out[:, : nfrm * H]
        new_in_tail = ext[:, ext.shape[-1] - H:]
        return (new_in_tail, new_out_tail, noise_psd, prev_s2, psd_ema), audio


# -------------------------------------------------------------- block LMS
@struct.dataclass
class BlockLMS:
    """Normalised block-LMS adaptive linear predictor.

    Predicts sample n from samples [n-delay-taps+1 .. n-delay].  Tonal
    interference is predictable across the decorrelation delay; noise and
    voice are not.  ``notch=True`` outputs input - prediction (ANF, removes
    tones, parity wdsp/anf.c); ``notch=False`` outputs the prediction (ANR,
    keeps the correlated signal, parity wdsp/anr.c).

    Weights update once per ``sub`` samples (a lax.scan over sub-blocks):
    each update is a [sub, taps] window matrix times the error vector — a
    small matmul, so the adaptation runs on the MXU rather than per-sample.
    The [C, sub, taps] windows stay f32 on purpose: the op is bound by the
    window gather + scan structure, and an A/B on the TPU measured bf16
    windows ~20% SLOWER (sub-word gathers), with dot precision tier and
    sub-block size inside run-to-run variance.
    State: (weights [C, taps], input tail [C, taps+delay-1]).
    """

    mu: jnp.ndarray
    taps: int = struct.field(pytree_node=False)
    delay: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    sub: int = struct.field(pytree_node=False)
    notch: bool = struct.field(pytree_node=False)
    leak: float = struct.field(pytree_node=False)
    fdaf: bool = struct.field(pytree_node=False, default=True)
    #: optional MXU matmul rfft/irfft for the FDAF transforms
    rdft: Any = None

    @classmethod
    def create(cls, block: int, taps: int = 256, delay: int = 16,
               mu: float = 2.0, notch: bool = True, leak: float = 1e-5,
               sub: int = 512, fdaf: bool = True, mxu_dft: bool = False):
        # larger sub-blocks average the NLMS gradient over more samples
        # (smoother adaptation — measured slightly DEEPER notches than
        # sub=128) and quarter the scan-iteration count; shrink to fit
        # small blocks
        while sub > 1 and block % sub:
            sub //= 2
        rdft = None
        if mxu_dft and fdaf:
            from quisk_tpu.ops.mxdft import make_rdft
            rdft = make_rdft(1 << (taps + sub - 2).bit_length())
        return cls(mu=jnp.float32(mu), taps=taps, delay=delay, block=block,
                   sub=sub, notch=notch, leak=leak, fdaf=fdaf, rdft=rdft)

    def init_state(self, channels: int):
        hist = self.taps + self.delay - 1
        return (jnp.zeros((channels, self.taps), jnp.float32),
                jnp.zeros((channels, hist), jnp.float32))

    def __call__(self, state, a: jnp.ndarray):
        if self.fdaf:
            return self._call_fdaf(state, a)
        w0, tail = state
        C = a.shape[0]
        hist = self.taps + self.delay - 1
        nsub = self.block // self.sub
        # window index matrix for one sub-block: win[i, k] = ext[taps-1+i-k]
        widx = (self.taps - 1 + jnp.arange(self.sub)[:, None]
                - jnp.arange(self.taps)[None, :])         # [sub, taps]

        subs = a.reshape(C, nsub, self.sub)

        def step(carry, xs):
            w, tl = carry                                  # [C,T], [C,hist]
            blk = xs                                       # [C, sub]
            ext = jnp.concatenate([tl, blk], axis=-1)      # [C, hist+sub]
            win = ext[:, widx]                             # [C, sub, taps]
            pred = jnp.einsum("cik,ck->ci", win, w,
                              precision=jax.lax.Precision.HIGHEST)
            err = blk - pred
            # NLMS: normalise by ||u||^2 ~ taps * mean power (the largest
            # autocorrelation eigenvalue for tonal input), keeping the
            # effective step ~ mu regardless of level or tap count
            power = self.taps * jnp.mean(ext ** 2, axis=-1) + 1e-8
            grad = jnp.einsum("ci,cik->ck", err, win,
                              precision=jax.lax.Precision.HIGHEST) / self.sub
            w = (1.0 - self.leak) * w + self.mu * grad / power[:, None]
            out = err if self.notch else pred
            return (w, ext[:, ext.shape[-1] - hist:]), out

        (w, tail), outs = jax.lax.scan(step, (w0, tail),
                                       jnp.moveaxis(subs, 1, 0))
        out = jnp.moveaxis(outs, 0, 1).reshape(C, self.block)
        return (w, tail), out

    def _call_fdaf(self, state, a: jnp.ndarray):
        """Frequency-domain block LMS (overlap-save FDAF) — the SAME update
        as the time-domain path (exact linear correlation, no circular
        leakage: segment + zero-padding lengths chosen so no wraparound),
        but prediction and gradient run as rFFT products instead of
        materializing [C, sub, taps] window matrices, which are ~`taps`x
        redundant HBM traffic.  Classic fast-block-LMS structure
        (Shynk 1992); gradient constrained to `taps` coefficients by the
        z[:taps] slice."""
        w0, tail = state
        C = a.shape[0]
        hist = self.taps + self.delay - 1
        nsub = self.block // self.sub
        P = self.taps + self.sub - 1          # prediction input segment
        N = 1 << (P - 1).bit_length()
        subs = a.reshape(C, nsub, self.sub)

        def rfft_ri(x):
            if self.rdft is not None:
                return self.rdft.rfft_ri(
                    jnp.pad(x, ((0, 0), (0, N - x.shape[-1]))))
            X = jnp.fft.rfft(x, n=N, axis=-1)
            return jnp.real(X), jnp.imag(X)

        def irfft_ri(Yr, Yi):
            if self.rdft is not None:
                return self.rdft.irfft_ri(Yr, Yi)
            return jnp.fft.irfft(jax.lax.complex(Yr, Yi), n=N, axis=-1)

        def step(carry, blk):
            w, tl = carry
            ext = jnp.concatenate([tl, blk], axis=-1)      # [C, hist+sub]
            s = ext[:, :P]                                  # u[n], delay kept
            Sr, Si = rfft_ri(s)
            Wr, Wi = rfft_ri(w)
            pred = irfft_ri(Sr * Wr - Si * Wi, Sr * Wi + Si * Wr)[
                :, self.taps - 1: self.taps - 1 + self.sub]
            err = blk - pred
            Er, Ei = rfft_ri(err)
            # z[n] = sum_m s[m+n] err[m]  (linear: P-1 + sub-1 < N)
            z = irfft_ri(Sr * Er + Si * Ei, Si * Er - Sr * Ei)
            grad = z[:, : self.taps][:, ::-1] / self.sub
            power = self.taps * jnp.mean(ext ** 2, axis=-1) + 1e-8
            w = (1.0 - self.leak) * w + self.mu * grad / power[:, None]
            out = err if self.notch else pred
            return (w, ext[:, ext.shape[-1] - hist:]), out

        (w, tail), outs = jax.lax.scan(step, (w0, tail),
                                       jnp.moveaxis(subs, 1, 0))
        out = jnp.moveaxis(outs, 0, 1).reshape(C, self.block)
        return (w, tail), out


# ------------------------------------------------------------- sync AM PLL
@struct.dataclass
class SyncAMDemod:
    """Synchronous AM: a second-order PLL locks to the carrier, audio is the
    in-phase projection (parity: wdsp/amd.c PLL mode).

    State: (phase [C], freq [C] rad/sample, dc [C]).  Per-sample loop via
    lax.scan; channels ride the vector lanes.
    """

    alpha: jnp.ndarray        # phase gain
    beta: jnp.ndarray         # freq gain
    dc_pole: jnp.ndarray
    max_freq: jnp.ndarray     # rad/sample clamp

    @classmethod
    def create(cls, sample_rate: float, bw_hz: float = 100.0,
               max_offset_hz: float = 2000.0):
        # standard 2nd-order loop, damping 0.707
        wn = 2.0 * np.pi * bw_hz / sample_rate
        alpha = 2.0 * 0.707 * wn
        beta = wn * wn
        return cls(alpha=jnp.float32(alpha), beta=jnp.float32(beta),
                   dc_pole=jnp.float32(0.9995),
                   max_freq=jnp.float32(2 * np.pi * max_offset_hz / sample_rate))

    def init_state(self, channels: int):
        z = jnp.zeros((channels,), jnp.float32)
        return (z, z, z)

    def __call__(self, state, x: jnp.ndarray):
        phase0, freq0, dc0 = state

        def step(carry, xt):
            ph, fr, dc = carry          # [C] each; xt [C] complex
            osc = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
            v = xt * osc                # baseband at loop estimate
            err = jnp.arctan2(jnp.imag(v), jnp.real(v))
            fr = jnp.clip(fr + self.beta * err, -self.max_freq, self.max_freq)
            ph = ph + fr + self.alpha * err
            ph = jnp.where(ph > np.pi, ph - 2 * np.pi,
                           jnp.where(ph < -np.pi, ph + 2 * np.pi, ph))
            audio = jnp.real(v)
            dc = self.dc_pole * dc + (1.0 - self.dc_pole) * audio
            return (ph, fr, dc), audio - dc

        from quisk_tpu.ops.scanutil import unrolled_scan
        (ph, fr, dc), ys = unrolled_scan(
            step, (phase0, freq0, dc0), jnp.moveaxis(x, 1, 0))
        return (ph, fr, dc), jnp.moveaxis(ys, 0, 1)
