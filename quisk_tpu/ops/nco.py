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

        Angle-addition factorization: n = a*Q + b splits the phase word
        exactly (uint32 modular arithmetic), so the phasor is the outer
        product of two short phasor tables, e^{j th(aQ)} * e^{j th(b)} —
        ~Q-fold fewer sin/cos evaluations (the VPU-transcendental cost
        dominated the mixer), one extra complex multiply of rounding.
        """
        import jax

        B = self.block
        Q = 256
        if B % Q:
            Q = 1 << (max(B, 2) - 1).bit_length() // 2   # fallback split
            while B % Q:
                Q //= 2
        A = B // Q

        def cis(ph_u32):
            ang = ph_u32.astype(jnp.float32) * _TWO_PI_OVER_2_32
            # lax.complex, not cos + 1j*sin: complex literals in HLO are
            # not supported by every TPU runtime (axon)
            return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))

        a = jnp.arange(A, dtype=jnp.uint32) * jnp.uint32(Q)
        b = jnp.arange(Q, dtype=jnp.uint32)
        # coarse table carries the running phase offset; fine table is pure
        zc = cis(phase[:, None] + self.word[:, None] * a[None, :])  # [C, A]
        zf = cis(self.word[:, None] * b[None, :])                    # [C, Q]
        z = (zc[:, :, None] * zf[:, None, :]).reshape(phase.shape[0], B)
        next_phase = phase + self.word * jnp.uint32(self.block)
        return next_phase, z

    def __call__(self, phase: jnp.ndarray, x: jnp.ndarray):
        """Mix x [C, block] down by the NCO frequency: y = x * e^{-j theta}."""
        next_phase, z = self.phasor(phase)
        return next_phase, x * jnp.conj(z)
