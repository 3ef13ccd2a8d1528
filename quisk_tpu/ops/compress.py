"""Speech compressor / soft clipper for the TX path.

Parity: the reference's mic processing clips and then rounds the clip knee
with a quadratic soft compressor (microphone.c:484-518) plus ``CcmPeak``
peak rounding (microphone.c:161, 533).  Here it is one smooth memoryless
transfer curve: unity slope below the knee, quadratic knee, hard ceiling —
applied elementwise over ``[C, B]``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SoftCompressor:
    """Memoryless soft knee: linear below `knee`, quadratic bend reaching
    slope 0 at `ceiling` (so output never exceeds ceiling)."""

    knee: jnp.ndarray
    ceiling: jnp.ndarray
    gain: jnp.ndarray          # input drive gain (the compression amount)

    @classmethod
    def create(cls, drive_db: float = 6.0, knee: float = 0.5,
               ceiling: float = 1.0):
        g = 10.0 ** (drive_db / 20.0)
        return cls(knee=jnp.float32(knee), ceiling=jnp.float32(ceiling),
                   gain=jnp.float32(g))

    def init_state(self, channels: int):
        return ()

    def __call__(self, state, a: jnp.ndarray):
        x = a * self.gain
        s = jnp.sign(x)
        m = jnp.abs(x)
        k, c = self.knee, self.ceiling
        # quadratic y = c - (c-k)*(1 - (m-k)/(2(c-k)))^2 for k < m < 2c-k
        span = 2.0 * (c - k)
        t = jnp.clip((m - k) / span, 0.0, 1.0)
        soft = k + span * (t - 0.5 * t * t)
        y = jnp.where(m <= k, m, soft)
        return state, s * jnp.minimum(y, c)
