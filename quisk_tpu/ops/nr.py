"""Noise reduction: spectral MMSE NR (NR2), block-LMS ANR/ANF, sync-AM PLL.

Parity targets in WDSP (SURVEY.md §2.2):
- emnr.c (1174 LoC): Ephraim-Malah spectral noise reduction with
  precomputed gain tables (calculus.c data table; emnr.c:315-326) — here an
  STFT (sqrt-Hann, 50% overlap-add) with a decision-directed a-priori SNR
  estimator and an MMSE-LSA gain *table lookup* computed on the host with
  scipy (the TPU translation the survey prescribes: FFT + gather).
- anr.c / anf.c (LMS adaptive noise reduction / auto-notch): here a
  frequency-domain block-LMS adaptive linear predictor; the prediction is
  the tonal (correlated) part — ANF subtracts it, ANR keeps it.
- amd.c synchronous AM: a per-sample PLL (lax.scan over the block, states
  vectorised over channels) that locks to the carrier and demodulates
  coherently, with the same second-order loop shape.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------- STFT NR


def _mmse_lsa_gain_table(n_xi: int = 121, n_gamma: int = 121):
    """Host-side gain table G(xi, gamma) for the MMSE log-spectral-amplitude
    estimator, on log-spaced grids (the reference precomputes 241x241
    tables the same way, emnr.c:315)."""
    from scipy.special import exp1

    xi = 10.0 ** np.linspace(-4, 2, n_xi)        # a-priori SNR
    gamma = 10.0 ** np.linspace(-4, 2, n_gamma)  # a-posteriori SNR
    XI, GA = np.meshgrid(xi, gamma, indexing="ij")
    v = XI / (1.0 + XI) * GA
    v = np.clip(v, 1e-10, 700.0)
    G = XI / (1.0 + XI) * np.exp(0.5 * exp1(v))
    return (np.log10(xi[0]), np.log10(xi[-1]), np.log10(gamma[0]),
            np.log10(gamma[-1]), G.astype(np.float32))


@struct.dataclass
class SpectralNR:
    """MMSE-LSA spectral noise reduction on real audio ``[C, block]``.

    STFT with sqrt-Hann analysis/synthesis windows at 50% overlap; noise
    PSD tracked by exponential minimum-statistics; a-priori SNR by the
    decision-directed rule; spectral gain looked up from a precomputed
    table (gather — MXU/VPU friendly).

    State: (in_tail [C, H], out_tail [C, H], noise_psd [C, F], prev_s2
    [C, F]) with H = fft/2 hop and F = fft/2+1 rFFT bins.
    """

    window: jnp.ndarray          # [fft] sqrt-Hann
    table: jnp.ndarray           # [n_xi, n_gamma] gains
    lg_xi0: float = struct.field(pytree_node=False)
    lg_xi1: float = struct.field(pytree_node=False)
    lg_ga0: float = struct.field(pytree_node=False)
    lg_ga1: float = struct.field(pytree_node=False)
    fft: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    alpha: float = struct.field(pytree_node=False)      # decision-directed
    noise_up: float = struct.field(pytree_node=False)   # noise PSD rise rate
    noise_down: float = struct.field(pytree_node=False)
    gain_floor: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, fft: int = 512, alpha: float = 0.98,
               gain_floor_db: float = -18.0):
        if block % (fft // 2):
            raise ValueError("block must be a multiple of fft/2")
        w = np.sqrt(np.hanning(fft + 1)[:fft])
        x0, x1, g0, g1, G = _mmse_lsa_gain_table()
        return cls(window=jnp.asarray(w, jnp.float32), table=jnp.asarray(G),
                   lg_xi0=x0, lg_xi1=x1, lg_ga0=g0, lg_ga1=g1,
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
        """Per-frame MMSE gain via table lookup.  noise_psd is the quantile
        track; x2 corrects it to the mean noise power."""
        noise_psd = 2.0 * noise_psd
        gamma = S2 / jnp.maximum(noise_psd, 1e-12)
        xi = (self.alpha * prev_s2 / jnp.maximum(noise_psd, 1e-12)
              + (1.0 - self.alpha) * jnp.maximum(gamma - 1.0, 0.0))
        n_xi, n_ga = self.table.shape
        ix = (jnp.log10(jnp.clip(xi, 10 ** self.lg_xi0, 10 ** self.lg_xi1))
              - self.lg_xi0) / (self.lg_xi1 - self.lg_xi0) * (n_xi - 1)
        ig = (jnp.log10(jnp.clip(gamma, 10 ** self.lg_ga0, 10 ** self.lg_ga1))
              - self.lg_ga0) / (self.lg_ga1 - self.lg_ga0) * (n_ga - 1)
        g = self.table[ix.astype(jnp.int32), ig.astype(jnp.int32)]
        return jnp.maximum(g, self.gain_floor)

    def __call__(self, state, a: jnp.ndarray):
        in_tail, out_tail, noise_psd, prev_s2, psd_ema = state
        C = a.shape[0]
        H = self.fft // 2
        nfrm = a.shape[-1] // H
        ext = jnp.concatenate([in_tail, a], axis=-1)     # [C, H*(nfrm+1)]

        # frames [C, nfrm, fft] with 50% overlap
        starts = jnp.arange(nfrm) * H
        idx = starts[:, None] + jnp.arange(self.fft)[None, :]
        frames = ext[:, idx] * self.window                # [C, nfrm, fft]
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

        (noise_psd, prev_s2, psd_ema), gains = jax.lax.scan(
            frame_step, (noise_psd, prev_s2, psd_ema), jnp.moveaxis(S2, 1, 0))
        gains = jnp.moveaxis(gains, 0, 1)                 # [C, nfrm, F]

        Y = X * gains.astype(X.dtype)
        y = jnp.fft.irfft(Y, n=self.fft, axis=-1) * self.window

        # overlap-add the frames
        out = jnp.zeros((C, (nfrm + 1) * H), jnp.float32)
        out = out.at[:, idx].add(y)
        out = out.at[:, :H].add(out_tail)
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
    State: (weights [C, taps], input tail [C, taps+delay-1]).
    """

    mu: jnp.ndarray
    taps: int = struct.field(pytree_node=False)
    delay: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    sub: int = struct.field(pytree_node=False)
    notch: bool = struct.field(pytree_node=False)
    leak: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, taps: int = 256, delay: int = 16,
               mu: float = 2.0, notch: bool = True, leak: float = 1e-5,
               sub: int = 128):
        if block % sub:
            raise ValueError("block must be a multiple of sub")
        return cls(mu=jnp.float32(mu), taps=taps, delay=delay, block=block,
                   sub=sub, notch=notch, leak=leak)

    def init_state(self, channels: int):
        hist = self.taps + self.delay - 1
        return (jnp.zeros((channels, self.taps), jnp.float32),
                jnp.zeros((channels, hist), jnp.float32))

    def __call__(self, state, a: jnp.ndarray):
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
            power = self.taps * jnp.mean(win ** 2, axis=(1, 2)) + 1e-8
            grad = jnp.einsum("ci,cik->ck", err, win,
                              precision=jax.lax.Precision.HIGHEST) / self.sub
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

        (ph, fr, dc), ys = jax.lax.scan(
            step, (phase0, freq0, dc0), jnp.moveaxis(x, 1, 0))
        return (ph, fr, dc), jnp.moveaxis(ys, 0, 1)
