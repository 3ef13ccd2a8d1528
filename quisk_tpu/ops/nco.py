"""Numerically-controlled oscillator / complex mixer.

The reference tunes by multiplying each sample by a rotating phasor that it
renormalises periodically because repeated complex multiplication drifts
(quisk.c:2482-2488 ``rxTuneVector``; SURVEY.md flags this as a pattern NOT to
copy).  Here phase is an exact uint32 integer accumulator: ``2**32`` counts
per turn, per-channel frequency words, wraparound is exact modular
arithmetic, so phase is drift-free across any number of blocks and across
shard boundaries.  The angle is only converted to float for the final
sin/cos, bounding the error at one float32 ulp of [0, 2pi).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

_TWO_PI_OVER_2_32 = np.float32(2.0 * np.pi / 4294967296.0)


def freq_word(freq_hz, sample_rate: float) -> jnp.ndarray:
    """Per-channel uint32 phase increment for freq_hz at sample_rate."""
    f = np.atleast_1d(np.asarray(freq_hz, dtype=np.float64))
    w = np.round((f / sample_rate) * 4294967296.0).astype(np.int64)
    return jnp.asarray(w.astype(np.uint32))


@struct.dataclass
class NCO:
    """Batch of per-channel oscillators.

    ``word`` [C] uint32 phase increments; state is the [C] uint32 phase at
    the start of the next block.
    """

    word: jnp.ndarray                                 # [C] uint32
    block: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, freq_hz, sample_rate: float, block: int, channels: int):
        w = freq_word(freq_hz, sample_rate)
        if w.ndim == 1 and w.shape[0] == 1:
            w = jnp.broadcast_to(w, (channels,))
        assert w.shape == (channels,)
        return cls(word=w, block=block)

    def init_state(self, channels: int) -> jnp.ndarray:
        return jnp.zeros((channels,), dtype=jnp.uint32)

    def phasor(self, phase: jnp.ndarray):
        """(next_phase [C], e^{j theta} [C, block] complex64).

        Direct per-sample sin/cos: measured fastest on TPU — XLA's
        transcendentals are cheap enough that an angle-addition
        outer-product factorization (fewer sin/cos, one extra complex
        multiply) loses to the materialization it forces (measured 5.0 ms
        vs 3.2 ms at [1024, 40960], and 9.8 ms for a reshaped-3D variant).
        """
        import jax

        n = jnp.arange(self.block, dtype=jnp.uint32)
        ph = phase[:, None] + self.word[:, None] * n[None, :]   # uint32 wraps
        ang = ph.astype(jnp.float32) * _TWO_PI_OVER_2_32
        # lax.complex, not cos + 1j*sin: complex literals in HLO are not
        # supported by every TPU runtime (axon), and this avoids them
        z = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        next_phase = phase + self.word * jnp.uint32(self.block)
        return next_phase, z

    def __call__(self, phase: jnp.ndarray, x: jnp.ndarray):
        """Mix x [C, block] down by the NCO frequency: y = x * e^{-j theta}."""
        next_phase, z = self.phasor(phase)
        return next_phase, x * jnp.conj(z)
