"""First-order IIR sections as parallel (associative-scan) recurrences.

The reference sprinkles one-pole filters through the demod chain — AM DC
removal (quisk.c:2002-2025), FM de-emphasis at 300 Hz (quisk.c:2057-2064),
TX pre-emphasis (microphone.c:452-465).  A recurrence
``y[n] = a*y[n-1] + b*x[n]`` is a linear scan, so instead of a sequential
per-sample loop we evaluate it with ``jax.lax.associative_scan`` over the
block axis — O(log B) depth, fully vectorised over channels, and the carried
state is just the last output sample.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _first_order_scan(x: jnp.ndarray, a, b, y_prev: jnp.ndarray) -> jnp.ndarray:
    """All outputs of y[n] = a*y[n-1] + b*x[n] given y[-1] = y_prev.

    x: [C, B]; a, b scalar or [C, 1]; y_prev: [C]. Returns y [C, B].
    """
    A = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape)
    Bv = jnp.asarray(b, x.dtype) * x

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a2 * a1, a2 * b1 + b2

    A_cum, B_cum = jax.lax.associative_scan(combine, (A, Bv), axis=-1)
    return B_cum + A_cum * y_prev[:, None]


@struct.dataclass
class OnePole:
    """y[n] = a*y[n-1] + b*x[n].  Lowpass: a = exp(-2 pi fc / fs), b = 1-a."""

    a: jnp.ndarray
    b: jnp.ndarray

    @classmethod
    def lowpass(cls, fc_hz: float, fs: float, dtype=jnp.float32):
        a = float(np.exp(-2.0 * np.pi * fc_hz / fs))
        return cls(a=jnp.asarray(a, dtype), b=jnp.asarray(1.0 - a, dtype))

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((channels,), dtype=dtype)

    def __call__(self, y_prev: jnp.ndarray, x: jnp.ndarray):
        y = _first_order_scan(x, self.a, self.b, y_prev)
        return y[:, -1], y


@struct.dataclass
class DCBlock:
    """DC blocker y[n] = x[n] - x[n-1] + a*y[n-1] (Lyons; reference AM path).

    State is (x_prev [C], y_prev [C]).
    """

    a: jnp.ndarray

    @classmethod
    def create(cls, pole: float = 0.995, dtype=jnp.float32):
        return cls(a=jnp.asarray(pole, dtype))

    def init_state(self, channels: int, dtype=jnp.float32):
        z = jnp.zeros((channels,), dtype=dtype)
        return z, z

    def __call__(self, state, x: jnp.ndarray):
        x_prev, y_prev = state
        d = x - jnp.concatenate([x_prev[:, None], x[:, :-1]], axis=-1)
        y = _first_order_scan(d, self.a, 1.0, y_prev)
        return (x[:, -1], y[:, -1]), y


@struct.dataclass
class Preemphasis:
    """First-difference pre-emphasis y[n] = x[n] - c*x[n-1] (~6 dB/octave,
    parity: microphone.c:452-465).  State is x_prev [C]."""

    c: jnp.ndarray

    @classmethod
    def create(cls, c: float = 0.97, dtype=jnp.float32):
        return cls(c=jnp.asarray(c, dtype))

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((channels,), dtype=dtype)

    def __call__(self, x_prev: jnp.ndarray, x: jnp.ndarray):
        xm1 = jnp.concatenate([x_prev[:, None], x[:, :-1]], axis=-1)
        return x[:, -1], x - self.c * xm1
