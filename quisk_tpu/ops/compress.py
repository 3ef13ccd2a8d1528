"""Speech compressor / soft clipper for the TX path.

Parity: the reference's mic processing clips and then rounds the clip knee
with a quadratic soft compressor (microphone.c:484-518) plus ``CcmPeak``
peak rounding (microphone.c:161, 533).  Here it is one smooth memoryless
transfer curve: unity slope below the knee, quadratic knee, hard ceiling —
applied elementwise over ``[C, B]``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from quisk_tpu.ops.fir import ConvFIR


@struct.dataclass
class SoftCompressor:
    """Memoryless soft knee: linear below `knee`, quadratic bend reaching
    slope 0 at `ceiling` (so output never exceeds ceiling)."""

    knee: jnp.ndarray
    ceiling: jnp.ndarray
    gain: jnp.ndarray          # drive gain (scalar or [C]); <=1 bypasses

    @classmethod
    def create(cls, drive_db: float | np.ndarray = 6.0, knee: float = 0.5,
               ceiling: float = 1.0):
        g = 10.0 ** (np.asarray(drive_db, np.float32) / 20.0)
        return cls(knee=jnp.float32(knee), ceiling=jnp.float32(ceiling),
                   gain=jnp.asarray(g, jnp.float32))

    def init_state(self, channels: int):
        return ()

    def __call__(self, state, a: jnp.ndarray):
        gain = self.gain if self.gain.ndim == 0 else self.gain[:, None]
        x = a * gain
        s = jnp.sign(x)
        m = jnp.abs(x)
        k, c = self.knee, self.ceiling
        # quadratic y = c - (c-k)*(1 - (m-k)/(2(c-k)))^2 for k < m < 2c-k
        span = 2.0 * (c - k)
        t = jnp.clip((m - k) / span, 0.0, 1.0)
        soft = k + span * (t - 0.5 * t * t)
        y = jnp.where(m <= k, m, soft)
        out = s * jnp.minimum(y, c)
        # drive <= 1 means "clip off" — exact pass-through so per-channel
        # clip settings are pure data (quisk.py:5681 txAudioClip* per mode)
        return state, jnp.where(gain <= 1.0, a, out)


def _env_clip(z: jnp.ndarray, ceiling) -> jnp.ndarray:
    """Scale complex samples whose envelope exceeds `ceiling` back onto it
    (envelope clipping preserves phase, so no AM-to-PM distortion)."""
    mag = jnp.abs(z)
    scale = jnp.minimum(1.0, ceiling / jnp.maximum(mag, 1e-12))
    return z * scale.astype(z.dtype)


@struct.dataclass
class OvershootControl:
    """CESSB overshoot control on the analytic TX signal (parity
    wdsp/osctrl.c, controlled-envelope SSB after D. Hershberger W9GR).

    Envelope-clip -> linear-phase bandpass (confines clip splatter to the
    voice band) -> envelope-clip again: the second clip removes the filter
    overshoot the first stage re-introduced.  Output envelope is bounded by
    ``ceiling`` within ~1%, with in-band distortion far below a single hard
    clipper's splatter.

    State: (fir1 hist, fir2 hist) complex FIR histories.
    """

    fir1: ConvFIR
    fir2: ConvFIR
    ceiling: jnp.ndarray

    @classmethod
    def create(cls, block: int, fs: float,
               band: tuple[float, float] = (300.0, 3000.0),
               ntaps: int = 129, ceiling: float = 1.0):
        from quisk_tpu.ops import design
        taps = design.bandpass_analytic(ntaps, band[0], band[1], fs)
        return cls(fir1=ConvFIR.create(taps, block),
                   fir2=ConvFIR.create(taps, block),
                   ceiling=jnp.float32(ceiling))

    def init_state(self, channels: int):
        return (self.fir1.init_state(channels),
                self.fir2.init_state(channels))

    def __call__(self, state, z: jnp.ndarray):
        h1, h2 = state
        y = _env_clip(z, self.ceiling)
        h1, y = self.fir1(h1, y)
        y = _env_clip(y, self.ceiling)
        h2, y = self.fir2(h2, y)
        # final trim: the second filter's overshoot is small; a last hard
        # envelope clip bounds it without audible artefacts
        y = _env_clip(y, 1.02 * self.ceiling)
        return (h1, h2), y
