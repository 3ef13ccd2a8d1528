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

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _band_matrix(kernel: np.ndarray, R: int) -> np.ndarray:
    """[R+K-1, R] banded tap matrix: column r carries kernel (reversed)
    starting at row r — one matmul computes R consecutive sliding-window
    dot products (the MatmulFIR patch formulation, ops/fir.py)."""
    K = kernel.shape[0]
    M = np.zeros((R + K - 1, R), np.float32)
    rev = kernel[::-1]
    for r in range(R):
        M[r: r + K, r] = rev
    return M


def _patch_dot(sig: jnp.ndarray, M: jnp.ndarray, R: int) -> jnp.ndarray:
    """Sliding-window dot products of ``sig`` [C, B+K-1] against the banded
    matrix ``M`` [R+K-1, R] -> [C, B].  Runs on the MXU in one-pass bf16:
    both uses here (pulse widening, magnitude averaging) feed a clipped
    gain / a threshold compare, where bf16's ~0.4% is inaudible."""
    C = sig.shape[0]
    Kp, _ = M.shape
    nblk = (sig.shape[-1] - (Kp - R)) // R
    idx = (jnp.arange(nblk) * R)[:, None] + jnp.arange(Kp)[None, :]
    patches = sig[:, idx]                          # [C, nblk, R+K-1]
    return jax.lax.dot_general(
        patches, M, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32).reshape(C, -1)


@struct.dataclass
class NoiseBlanker:
    """Impulse blanker on raw IQ blocks.

    State: hist [C, W-1] (enough input history for the moving average to
    be streaming-exact at block joins; the reference also treats each
    buffer independently for the widening windows).

    TPU formulation: both inner loops of the reference (the sliding
    magnitude average, quisk.c:703-714, and the raised-cosine blanking
    windows around each pulse, quisk.c:679/728-760) are sliding-window
    dot products — executed as banded-Toeplitz matmuls on the MXU
    (measured 3.3x the rfft/irfft widening convolution this replaced, and
    4x an equivalent cumsum formulation, at 1024ch x 40960).

    At wideband rates the op is HBM-bound on full-rate intermediates
    (avg/pulse/pw are each [C, B] f32 at the RAW rate), so ``pool`` > 1
    moves the slow parts onto a P:1 coarse grid: the threshold compare
    stays per-sample (fused into a grouped reduction, so no full-rate
    intermediate is materialized), the box average and the ~1000-tap
    raised-cosine widening run on group sums, and the blanking gain is
    linearly upsampled.  The RC half-window is ~480 samples at 960 kHz,
    so a 16-sample grid changes the envelope by <~3% — inaudible, and the
    detection set is identical (group max crosses iff any sample does).
    Narrow rates (K < ~100 taps) keep the exact per-sample path."""

    limit: jnp.ndarray
    avg_win: int = struct.field(pytree_node=False)
    kwidth: int = struct.field(pytree_node=False)
    pool: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, sample_rate: float, level: int = 2,
               half_window_us: float = 500.0, avg_win: int = 64):
        limit = {1: 6.0, 2: 4.0, 3: 2.5}[level]   # reference quisk.c:716-727
        H = max(1, int(half_window_us * 1e-6 * sample_rate))
        K = 2 * H + 1
        # Coarse-grid factor: largest power of two that keeps >=24 coarse
        # half-window taps (and divides avg_win).  48 kHz (H=24) -> 1
        # (exact path); 960 kHz (H=480) -> 16.
        P = 1
        while P < 16 and (H // (2 * P)) >= 24 and avg_win % (2 * P) == 0:
            P *= 2
        return cls(limit=jnp.float32(limit), avg_win=avg_win, kwidth=K,
                   pool=P)

    def init_state(self, channels: int):
        # host numpy: complex64 cannot cross the host<->device boundary
        w = self.avg_win if self.pool > 1 else self.avg_win - 1
        return np.zeros((channels, w), np.complex64)

    def __call__(self, hist, x: jnp.ndarray):
        if self.pool > 1 and x.shape[-1] % self.pool == 0:
            return self._coarse(hist, x)
        return self._exact(hist, x)

    def detect(self, hist, x: jnp.ndarray):
        """Coarse-path detection WITHOUT applying: returns
        ``(new_hist, gain [C, B/pool])`` — the blanking gain on the
        pool:1 grid.  Used by the chain to fuse the gain application
        into the Pallas front kernel (the apply pass re-reads and
        re-writes the full-rate block otherwise).  Only valid when
        ``pool > 1``."""
        if self.pool == 1:
            raise ValueError("detect() requires the coarse path (pool>1)")
        return self._coarse_gain(hist, x)

    def _coarse(self, hist, x: jnp.ndarray):
        new_hist, gc = self._coarse_gain(hist, x)
        C, B = x.shape
        P = self.pool
        # linear upsample of the gain back to the raw grid
        gpad = jnp.concatenate([gc, gc[:, -1:]], axis=-1)
        w = (jnp.arange(P, dtype=jnp.float32) / P)[None, None, :]
        g = (gc[..., None] * (1.0 - w) + gpad[:, 1:, None] * w
             ).reshape(C, B)
        return new_hist, x * g

    def _coarse_gain(self, hist, x: jnp.ndarray):
        C, B = x.shape
        P = self.pool
        W = self.avg_win // P                    # box window in groups
        xs = jnp.concatenate([hist, x], axis=-1)   # [C, B + avg_win]
        mag = jnp.abs(xs)
        mg = mag.reshape(C, mag.shape[-1] // P, P)
        # ONE full-rate pass: sibling sum/max reductions over the same
        # operand fuse into a single HBM read; everything downstream runs
        # on the P:1 coarse grid.  (A per-sample compare needs the sums
        # first — a second full-rate pass — and measured no better.)
        S = mg.sum(-1)                                      # group sums
        X = mg.max(-1)                                      # group maxes
        GB = B // P
        # trailing moving average over avg_win raw samples, per x-group
        acc = S[:, W:]
        for k in range(1, W):
            acc = acc + S[:, W - k: W - k + GB]
        avgc = acc * (1.0 / self.avg_win)                   # [C, GB]
        thr = self.limit * jnp.maximum(avgc, 1e-12)
        # group max crosses iff any sample does -> identical detection
        # set; the widening conv then sees one hit per group (the exact
        # path's per-sample RC sum clips at gain 0 anyway)
        pc = (X[:, W:] > thr).astype(jnp.float32)
        HC = (self.kwidth // 2) // P
        KC = 2 * HC + 1
        rcc = (0.5 + 0.5 * np.cos(np.linspace(-np.pi, np.pi, KC))
               ).astype(np.float32)
        Rc = 1024
        while GB % Rc:
            Rc //= 2
        pz = jnp.pad(pc, ((0, 0), (HC, HC)))
        pwc = _patch_dot(pz, jnp.asarray(_band_matrix(rcc, Rc)), Rc)
        gc = jnp.clip(1.0 - pwc, 0.0, 1.0)                  # [C, GB]
        new_hist = xs[:, -self.avg_win:]
        return new_hist, gc

    def _exact(self, hist, x: jnp.ndarray):
        B = x.shape[-1]
        hist = hist[:, hist.shape[-1] - (self.avg_win - 1):]
        # Patch redundancy is (R+K-1)/R, and the widening kernel K is ~1000
        # taps at wideband rates: R=128 materializes 8.5x the input in
        # patches (~1.4 GB/block at 1024ch) while R=1024 pays only 1.94x —
        # the op is HBM-bound on exactly that traffic.
        R = 1024
        while B % R:
            R //= 2
        # both tap sets derive from static ints -> compile-time constants
        box = np.full(self.avg_win, 1.0 / self.avg_win, np.float32)
        K = self.kwidth
        rc = (0.5 + 0.5 * np.cos(np.linspace(-np.pi, np.pi, K))
              ).astype(np.float32)
        xe = jnp.concatenate([hist, x], axis=-1)
        mag = jnp.abs(xe)
        # moving average of |x| over avg_win (streaming via history)
        avg = _patch_dot(mag, jnp.asarray(_band_matrix(box, R)), R)
        m = mag[:, self.avg_win - 1:]
        pulse = (m > self.limit * jnp.maximum(avg, 1e-12)).astype(jnp.float32)
        # widen the pulse with the raised-cosine kernel -> blanking depth
        # ('same' centered alignment, zero-padded edges)
        pz = jnp.pad(pulse, ((0, 0), ((K - 1) // 2, (K - 1) // 2)))
        pw = _patch_dot(pz, jnp.asarray(_band_matrix(rc, R)), R)
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
    #: optional MXU matmul rfft/irfft (ops/mxdft.MatmulRDFT)
    rdft: Any = None

    @classmethod
    def create(cls, block: int, fft: int = 256, k_detect: float = 8.0,
               mxu_dft: bool = False,
               bg_rate: float = 0.05):
        if block % (fft // 2):
            raise ValueError("block must be a multiple of fft/2")
        rdft = None
        if mxu_dft:
            from quisk_tpu.ops.mxdft import MatmulRDFT
            rdft = MatmulRDFT.create(fft)
        w = np.sqrt(np.hanning(fft + 1)[:fft])
        return cls(window=jnp.asarray(w, jnp.float32), rdft=rdft,
                   fft=fft, block=block,
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
        # 50%-overlap frames as a view stack (two shifted tile views
        # concatenated — no gather, same trick as ops/channelizer.py)
        tiles = ext.reshape(C, nfrm + 1, H)
        frames = jnp.concatenate([tiles[:, :-1], tiles[:, 1:]],
                                 axis=-1) * self.window
        if self.rdft is not None:
            Xre, Xim = self.rdft.rfft_ri(frames)
        else:
            X = jnp.fft.rfft(frames, axis=-1)
            Xre, Xim = jnp.real(X), jnp.imag(X)
        pw = jnp.mean(Xre * Xre + Xim * Xim, axis=-1)  # [C, nfrm]

        def frame_step(carry, p):
            bg = carry
            bad = (p > self.k_detect * bg).astype(jnp.float32)
            # background tracks only clean frames: rises slowly (impulse
            # tails must not lift it) but falls fast (so the high initial
            # value converges within ~20 frames)
            rate = jnp.where(p > bg, self.bg_rate, 0.5)
            bg = jnp.where(bad > 0, bg, bg + rate * (p - bg))
            return bg, bad

        from quisk_tpu.ops.scanutil import unrolled_scan
        bg, badf = unrolled_scan(frame_step, bg, jnp.moveaxis(pw, 1, 0),
                                 unroll=8)
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

        (clean_re, clean_im), (yre, yim) = unrolled_scan(
            subst_step, (clean_re, clean_im),
            (jnp.moveaxis(Xre, 1, 0), jnp.moveaxis(Xim, 1, 0),
             jnp.moveaxis(dil, 1, 0)))
        yre = jnp.moveaxis(yre, 0, 1)
        yim = jnp.moveaxis(yim, 0, 1)
        if self.rdft is not None:
            y = self.rdft.irfft_ri(yre, yim) * self.window
        else:
            Y = jax.lax.complex(yre, yim)
            y = jnp.fft.irfft(Y, n=self.fft, axis=-1) * self.window
        # overlap-add via shifted half-frame views (no scatter): output
        # tile t = first half of frame t + second half of frame t-1
        out_tiles = (jnp.pad(y[:, :, :H], ((0, 0), (0, 1), (0, 0)))
                     + jnp.pad(y[:, :, H:], ((0, 0), (1, 0), (0, 0))))
        out_tiles = out_tiles.at[:, 0].add(out_tail)
        out = out_tiles.reshape(C, (nfrm + 1) * H)
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
    #: optional MXU matmul rfft/irfft (ops/mxdft; CT-factored at nfft)
    rdft: Any = None

    @classmethod
    def create(cls, block: int, ntaps: int | None = None, n_notch: int = 2,
               width_bins: int = 4, ema: float = 0.7, snr_open_db: float = 12.0,
               mxu_dft: bool = False):
        """``snr_open_db`` is the peak-over-median threshold that opens a
        notch.  Note the analysis window is the full overlap-save input
        [prev tail | block] (~2x the block): a coherent tone's peak grows
        ~N^2 while the noise median grows ~N, so relative to a block-length
        FFT the same ``snr_open_db`` opens on ~3 dB weaker tones — the
        default 12 dB is calibrated for THIS window; raise it ~3 dB to
        reproduce block-length-detector behaviour."""
        if ntaps is None:
            # notch depth needs FIR frequency resolution finer than the
            # notch width: use a block-length filter (the reference's design
            # runs at its FFT size too, quisk.c:910-949)
            ntaps = block + 1
        nfft = 1 << (block + ntaps - 1 - 1).bit_length()
        rdft = None
        if mxu_dft:
            from quisk_tpu.ops.mxdft import make_rdft
            rdft = make_rdft(nfft)
        w = np.hanning(ntaps)
        return cls(window=jnp.asarray(w, jnp.float32), depth_bins=width_bins,
                   n_notch=n_notch, block=block, nfft=nfft, ntaps=ntaps,
                   ema=ema, snr_open=10 ** (snr_open_db / 10.0), rdft=rdft)

    def init_state(self, channels: int):
        return (jnp.zeros((channels, self.nfft // 2 + 1), jnp.float32),
                jnp.zeros((channels, self.ntaps - 1), jnp.float32))

    def _rfft_ri(self, x: jnp.ndarray):
        if self.rdft is not None:
            return self.rdft.rfft_ri(x)
        X = jnp.fft.rfft(x, n=self.nfft, axis=-1)
        return jnp.real(X), jnp.imag(X)

    def _irfft_ri(self, Yr: jnp.ndarray, Yi: jnp.ndarray) -> jnp.ndarray:
        if self.rdft is not None:
            return self.rdft.irfft_ri(Yr, Yi)
        return jnp.fft.irfft(jax.lax.complex(Yr, Yi), n=self.nfft, axis=-1)

    def _design_mask(self, spec: jnp.ndarray):
        """[C, nfft//2+1] (re, im) rFFT response planes of the notch FIR.

        The audio is real, so design and application run entirely on the
        half spectrum (rfft/irfft — 2x cheaper than the full complex FFTs
        this replaced; notching an rfft bin notches both +/-f).  The median
        threshold uses every 4th bin: a sort over [C, nfft] was the single
        most expensive piece of the design pass on TPU, and the median of a
        smooth power spectrum is insensitive to 4x subsampling."""
        C, F = spec.shape
        med = jnp.median(spec[:, ::4], axis=-1, keepdims=True) + 1e-20
        mask = jnp.ones((C, F), jnp.float32)
        s = spec
        f = jnp.arange(F)[None, :]
        for _ in range(self.n_notch):
            k = jnp.argmax(s, axis=-1)
            peaky = (jnp.take_along_axis(s, k[:, None], 1)[:, 0]
                     > self.snr_open * med[:, 0])
            # bins within depth_bins of the peak, with reflection at DC
            # (|f+k| <= w) and Nyquist (2(F-1)-f-k <= w) — pure broadcast
            # comparisons; the scatter .at[].set this replaces was the
            # design pass's dominant cost on TPU
            kk = k[:, None]
            w = self.depth_bins
            hit = ((jnp.abs(f - kk) <= w) | (f + kk <= w)
                   | (2 * (F - 1) - f - kk <= w)).astype(jnp.float32)
            hit = hit * peaky[:, None]
            mask = mask * (1.0 - hit)
            s = s * (1.0 - hit)
        # brick mask -> windowed FIR -> actual applied response
        h = self._irfft_ri(mask, jnp.zeros_like(mask))
        h = jnp.roll(h, self.ntaps // 2, axis=-1)[:, : self.ntaps]
        h = h * self.window
        h = jnp.pad(h, ((0, 0), (0, self.nfft - self.ntaps)))
        return self._rfft_ri(h)

    def __call__(self, state, a: jnp.ndarray):
        spec_ema, hist = state
        xe = jnp.concatenate([hist, a], axis=-1)
        Xr, Xi = self._rfft_ri(
            jnp.pad(xe, ((0, 0), (0, self.nfft - xe.shape[-1]))))
        # the smoothed detection spectrum reuses the apply-pass FFT (one
        # rfft per block instead of two): xe spans [prev tail | block] of
        # the same stream, an equally good estimator of PERSISTENT tones,
        # which are all the notch designer looks for
        spec_ema = self.ema * spec_ema + (1.0 - self.ema) * (Xr * Xr + Xi * Xi)
        Hr, Hi = self._design_mask(spec_ema)
        y = self._irfft_ri(Xr * Hr - Xi * Hi, Xr * Hi + Xi * Hr)
        y = y[:, self.ntaps - 1: self.ntaps - 1 + self.block]
        # compensate the FIR group delay bookkeeping: output aligned to input
        new_hist = xe[:, xe.shape[-1] - (self.ntaps - 1):]
        return (spec_ema, new_hist), y
