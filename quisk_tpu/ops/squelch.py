"""Squelches: SSB voice-activity squelch and FM noise squelch.

Parity targets:
- SSB squelch (quisk.c:1086 ``ssb_squelch``): 512-pt FFT of the audio, voice
  detector = spectral-flatness distance (difference between the log of the
  arithmetic mean and the mean of the logs of in-band power — small for
  noise, large for peaky voice); opens the squelch for ~1 s; audio is
  delayed so onsets are not clipped.
- FM squelch (quisk.c:2076-2085 + ``MeasureSquelch`` quisk.c:259): mean RF
  magnitude in dB against a threshold per channel.

Both are per-block decisions here (blocks are a few tens of ms, matching the
reference's FFT cadence), applied with a raised-cosine gain ramp so
open/close never clicks (the reference uses a keyup envelope for the same
reason, quisk.c:2371-2433).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def _ramp_gain(prev_gain: jnp.ndarray, target: jnp.ndarray, block: int,
               ramp: int) -> jnp.ndarray:
    """[C, block] gains moving from prev toward target over `ramp` samples
    with a raised-cosine profile."""
    t = jnp.arange(block, dtype=jnp.float32) / float(max(ramp, 1))
    frac = 0.5 - 0.5 * jnp.cos(np.pi * jnp.minimum(t, 1.0))   # 0 -> 1
    return prev_gain[:, None] + (target - prev_gain)[:, None] * frac[None, :]


@struct.dataclass
class SSBSquelch:
    """Spectral-flatness voice squelch on ``[C, B]`` audio blocks.

    State: (hold counter [C] int32, gain [C] float32).
    """

    threshold: jnp.ndarray          # flatness distance to open (nats)
    hold_blocks: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    fft_size: int = struct.field(pytree_node=False)
    ramp: int = struct.field(pytree_node=False)
    f_lo_bin: int = struct.field(pytree_node=False)
    f_hi_bin: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, block: int, threshold: float = 1.2,
               hold_secs: float = 1.0, fft_size: int = 512,
               band: tuple[float, float] = (300.0, 2700.0),
               ramp_ms: float = 5.0):
        if block % fft_size:
            raise ValueError("block must be a multiple of fft_size")
        hold = max(1, int(round(hold_secs * sample_rate / block)))
        lo = int(band[0] / sample_rate * fft_size)
        hi = int(band[1] / sample_rate * fft_size)
        return cls(threshold=jnp.float32(threshold), hold_blocks=hold,
                   block=block, fft_size=fft_size,
                   ramp=max(1, int(ramp_ms * 1e-3 * sample_rate)),
                   f_lo_bin=max(1, lo), f_hi_bin=max(lo + 2, hi))

    def init_state(self, channels: int):
        return (jnp.zeros((channels,), jnp.int32),
                jnp.zeros((channels,), jnp.float32))

    def voice_metric(self, a: jnp.ndarray) -> jnp.ndarray:
        """Spectral-flatness distance per channel (0 = flat/noise)."""
        C = a.shape[0]
        nseg = self.block // self.fft_size
        segs = a.reshape(C, nseg, self.fft_size)
        P = jnp.abs(jnp.fft.rfft(segs, axis=-1)) ** 2
        P = jnp.mean(P, axis=1)[:, self.f_lo_bin: self.f_hi_bin] + 1e-20
        return jnp.log(jnp.mean(P, axis=-1)) - jnp.mean(jnp.log(P), axis=-1)

    def __call__(self, state, a: jnp.ndarray):
        hold, gain = state
        metric = self.voice_metric(a)
        opened = metric > self.threshold
        hold = jnp.where(opened, self.hold_blocks, jnp.maximum(hold - 1, 0))
        target = (hold > 0).astype(jnp.float32)
        g = _ramp_gain(gain, target, a.shape[-1], self.ramp)
        return (hold, g[:, -1]), a * g


@struct.dataclass
class FMSquelch:
    """RF-level squelch: open when mean carrier power exceeds threshold.

    Call :meth:`measure` with the pre-demod complex baseband, then apply to
    the audio.  State: (hold [C], gain [C]).
    """

    threshold_db: jnp.ndarray
    hold_blocks: int = struct.field(pytree_node=False)
    ramp: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, block: int, threshold_db: float = -60.0,
               hold_secs: float = 0.2, ramp_ms: float = 5.0):
        hold = max(1, int(round(hold_secs * sample_rate / block)))
        return cls(threshold_db=jnp.float32(threshold_db), hold_blocks=hold,
                   ramp=max(1, int(ramp_ms * 1e-3 * sample_rate)))

    def init_state(self, channels: int):
        return (jnp.zeros((channels,), jnp.int32),
                jnp.zeros((channels,), jnp.float32))

    def measure(self, rf: jnp.ndarray) -> jnp.ndarray:
        """Mean RF power in dB per channel from the complex baseband."""
        p = jnp.mean(jnp.abs(rf) ** 2, axis=-1)
        return 10.0 * jnp.log10(p + 1e-20)

    def __call__(self, state, audio: jnp.ndarray, rf_db: jnp.ndarray):
        hold, gain = state
        opened = rf_db > self.threshold_db
        hold = jnp.where(opened, self.hold_blocks, jnp.maximum(hold - 1, 0))
        target = (hold > 0).astype(jnp.float32)
        g = _ramp_gain(gain, target, audio.shape[-1], self.ramp)
        return (hold, g[:, -1]), audio * g
