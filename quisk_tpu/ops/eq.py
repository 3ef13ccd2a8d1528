"""Audio shaping in the frequency domain: graphic EQ and the continuous
frequency compressor.

Parity targets in the reference's WDSP library (SURVEY.md §2.2):
- eq.c (853 LoC): graphic equalizer realised as a FIRCORE (partitioned
  overlap-save FIR) whose impulse response is designed by frequency
  sampling from per-band dB gains.  Here the same design runs on the host
  (float64) and the filter is the existing overlap-save kernel.
- cfcomp.c (519 LoC): "continuous frequency compressor" — an STFT processor
  that measures the level of each spectral bin and applies a per-bin
  compression gain toward a target profile.  Here: sqrt-Hann STFT at 50%
  overlap (same machinery as quisk_tpu.ops.nr.SpectralNR), per-bin attack/
  release level tracking, gain = ratio-limited distance to the target.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from quisk_tpu.ops.fir import ConvFIR


def eq_taps(ntaps: int, freqs_hz, gains_db, fs: float) -> np.ndarray:
    """Linear-phase FIR whose magnitude follows the (freq, dB) control
    points — frequency-sampling design (parity wdsp/eq.c eq_mults).

    gains are interpolated linearly in dB over log-frequency between the
    control points; below the first/above the last point the gain is held.
    """
    if ntaps % 2 == 0:
        ntaps += 1
    freqs = np.asarray(freqs_hz, np.float64)
    gains = np.asarray(gains_db, np.float64)
    if freqs.shape != gains.shape or freqs.ndim != 1 or len(freqs) < 2:
        raise ValueError("need matching 1-D freq/gain control points (>=2)")
    n = 8 * 1 << (ntaps - 1).bit_length()          # dense design grid
    f = np.fft.rfftfreq(n, d=1.0 / fs)
    lf = np.log10(np.maximum(f, freqs[0] / 4 + 1e-6))
    mag_db = np.interp(lf, np.log10(freqs), gains,
                       left=gains[0], right=gains[-1])
    mag = 10.0 ** (mag_db / 20.0)
    # zero-phase impulse response, then window to ntaps (linear phase)
    h = np.fft.irfft(mag, n)
    h = np.roll(h, ntaps // 2)[:ntaps]
    h *= np.blackman(ntaps)
    return h


@struct.dataclass
class GraphicEQ:
    """Per-channel graphic equalizer on real audio ``[C, block]``.

    A thin wrapper over a time-domain FIR with frequency-sampled taps; the
    band gains are data — :meth:`retune` swaps taps without recompiling
    (the reference double-buffers FIRCORE masks for the same reason,
    wdsp/firmin.c:322-346).
    """

    fir: ConvFIR
    fs: float = struct.field(pytree_node=False)
    ntaps: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, fs: float, freqs_hz=None, gains_db=None,
               ntaps: int = 257):
        if freqs_hz is None:
            freqs_hz = [30.0, 125.0, 500.0, 2000.0, 8000.0]
        if gains_db is None:
            gains_db = [0.0] * len(freqs_hz)
        taps = eq_taps(ntaps, freqs_hz, gains_db, fs)
        fir = ConvFIR.create(taps, block, complex_state=False)
        return cls(fir=fir, fs=fs, ntaps=fir.ntaps)

    def retune(self, freqs_hz, gains_db) -> "GraphicEQ":
        taps = eq_taps(self.ntaps, freqs_hz, gains_db, self.fs)
        return self.replace(fir=self.fir.replace(
            taps=jnp.asarray(taps, jnp.float32)))

    def init_state(self, channels: int):
        return self.fir.init_state(channels)

    def __call__(self, state, a: jnp.ndarray):
        return self.fir(state, a)


@struct.dataclass
class CFCompressor:
    """Continuous frequency compressor on real audio ``[C, block]``
    (parity wdsp/cfcomp.c).

    Per STFT frame: bin level (dB) tracked with attack/release smoothing;
    gain pulls each bin toward ``target_db`` with slope ``1 - 1/ratio``,
    bounded by ``max_gain_db``/``max_cut_db``.  sqrt-Hann analysis/synthesis
    at 50% overlap keeps perfect reconstruction at 0 dB gain.

    State: (in_tail [C,H], out_tail [C,H], level_db [C,F]).
    """

    window: jnp.ndarray
    norm_db: float = struct.field(pytree_node=False)   # full-scale-sine offset
    fft: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    target_db: float = struct.field(pytree_node=False)
    inv_ratio: float = struct.field(pytree_node=False)
    attack: float = struct.field(pytree_node=False)    # per-frame coefficient
    release: float = struct.field(pytree_node=False)
    max_gain_db: float = struct.field(pytree_node=False)
    max_cut_db: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, block: int, fs: float, fft: int = 512,
               target_db: float = -12.0, ratio: float = 3.0,
               attack_ms: float = 5.0, release_ms: float = 80.0,
               max_gain_db: float = 18.0, max_cut_db: float = 18.0):
        if block % (fft // 2):
            raise ValueError("block must be a multiple of fft/2")
        w = np.sqrt(np.hanning(fft + 1)[:fft])
        frame_rate = fs / (fft // 2)
        atk = float(1.0 - np.exp(-1.0 / (attack_ms * 1e-3 * frame_rate)))
        rel = float(1.0 - np.exp(-1.0 / (release_ms * 1e-3 * frame_rate)))
        # level calibration: a full-scale sine at a bin center measures
        # |X| = sum(window)/2 -> 0 dBFS
        norm = float(20.0 * np.log10(np.sum(w) / 2.0))
        return cls(window=jnp.asarray(w, jnp.float32), norm_db=norm,
                   fft=fft, block=block,
                   target_db=float(target_db), inv_ratio=float(1.0 / ratio),
                   attack=atk, release=rel,
                   max_gain_db=float(max_gain_db), max_cut_db=float(max_cut_db))

    def init_state(self, channels: int):
        H = self.fft // 2
        F = self.fft // 2 + 1
        return (jnp.zeros((channels, H), jnp.float32),
                jnp.zeros((channels, H), jnp.float32),
                jnp.full((channels, F), -120.0, jnp.float32))

    def __call__(self, state, a: jnp.ndarray):
        in_tail, out_tail, level_db = state
        C = a.shape[0]
        H = self.fft // 2
        nfrm = a.shape[-1] // H
        ext = jnp.concatenate([in_tail, a], axis=-1)
        # 50%-overlap frames as a view stack (no gather; see ops/nr.py)
        tiles = ext.reshape(C, nfrm + 1, H)
        frames = jnp.concatenate([tiles[:, :-1], tiles[:, 1:]],
                                 axis=-1) * self.window
        X = jnp.fft.rfft(frames, axis=-1)
        S2 = jnp.abs(X) ** 2
        # moving max over +-2 bins: a tone's whole spectral footprint (the
        # analysis window spreads it over ~3 bins) sees one level, so the
        # gain is flat across it — otherwise skirt bins get less cut and
        # overlap-add reconstructs a half-compressed tone
        pad = jnp.pad(S2, ((0, 0), (0, 0), (2, 2)), mode="edge")
        S2m = jnp.max(jnp.stack([pad[..., k:k + S2.shape[-1]]
                                 for k in range(5)]), axis=0)
        inst_db = 10.0 * jnp.log10(S2m + 1e-12) - self.norm_db

        def frame_step(lev, xs):
            up = xs > lev
            coef = jnp.where(up, self.attack, self.release)
            lev = lev + coef * (xs - lev)
            gain_db = jnp.clip((self.target_db - lev) * (1.0 - self.inv_ratio),
                               -self.max_cut_db, self.max_gain_db)
            # never lift the noise floor: no gain for bins far below target
            gain_db = jnp.where(lev < self.target_db - 40.0, 0.0, gain_db)
            return lev, gain_db

        from quisk_tpu.ops.scanutil import unrolled_scan
        level_db, gains_db = unrolled_scan(
            frame_step, level_db, jnp.moveaxis(inst_db, 1, 0), unroll=8)
        g = 10.0 ** (jnp.moveaxis(gains_db, 0, 1) / 20.0)
        y = jnp.fft.irfft(X * g.astype(X.dtype), n=self.fft,
                          axis=-1) * self.window
        # overlap-add via shifted half-frame views (no scatter)
        out_tiles = (jnp.pad(y[:, :, :H], ((0, 0), (0, 1), (0, 0)))
                     + jnp.pad(y[:, :, H:], ((0, 0), (1, 0), (0, 0))))
        out_tiles = out_tiles.at[:, 0].add(out_tail)
        out = out_tiles.reshape(C, (nfrm + 1) * H)
        return ((ext[:, ext.shape[-1] - H:], out[:, nfrm * H:(nfrm + 1) * H],
                 level_db), out[:, : nfrm * H])
