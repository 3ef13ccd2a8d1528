"""EER / polar transmit split (envelope elimination and restoration).

Parity: wdsp/eer.c (393 LoC) — splits the modulated TX signal into an
envelope path (driving a class-E/D PA's supply modulator) and a constant-
amplitude phase path (driving the PA input), with independent gains, an
envelope delay to match the (slower) supply modulator, and a drive floor
``pgain`` so the phase path never collapses at zero envelope.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EERSplitter:
    """[C, B] complex TX -> (envelope [C, B], phase IQ [C, B]).

    State: delay line for the phase path [C, delay] (the envelope path is
    the reference; the PHASE path is delayed so the envelope, which the
    supply modulator low-passes, arrives aligned — mirroring eer.c's
    ``setdelay``).
    """

    env_gain: jnp.ndarray
    phase_gain: jnp.ndarray
    floor: jnp.ndarray            # minimum envelope for the phase drive
    delay: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, env_gain: float = 1.0, phase_gain: float = 1.0,
               floor: float = 0.02, delay_samples: int = 0):
        return cls(env_gain=jnp.float32(env_gain),
                   phase_gain=jnp.float32(phase_gain),
                   floor=jnp.float32(floor), delay=int(delay_samples))

    def init_state(self, channels: int):
        if self.delay == 0:
            return ()
        # host numpy: complex64 cannot cross the host<->device boundary
        return np.zeros((channels, self.delay), np.complex64)

    def __call__(self, state, x: jnp.ndarray):
        if self.delay:
            ext = jnp.concatenate([state, x], axis=-1)
            xd = ext[:, : x.shape[-1]]
            state = ext[:, ext.shape[-1] - self.delay:]
        else:
            xd = x
        env = jnp.abs(xd)
        # constant-envelope phase drive; below the floor the phase is
        # meaningless, hold amplitude at the floor (eer.c pgain behavior)
        scale = self.phase_gain / jnp.maximum(env, self.floor)
        phase_iq = xd * scale.astype(xd.dtype)
        return state, (self.env_gain * env, phase_iq)
