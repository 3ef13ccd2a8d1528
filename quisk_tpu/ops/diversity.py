"""Diversity reception: phase/gain-weighted combining of receiver pairs.

Parity: wdsp/div.c — a "phase rotator" that combines two coherent RX
streams ``y = x0 + w * x1`` with a complex weight set from GUI gain/phase
knobs, used to steer a null onto local interference.  Here additionally an
adaptive estimator computes the max-SNR (principal-eigenvector) weights
from the 2x2 spatial covariance — batched over channel groups.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiversityCombiner:
    """Combine ``[C, 2, B]`` coherent stream pairs into ``[C, B]``.

    Weights are data (``set_weights``/``steer_null`` return a new combiner
    without recompiling).  Weight convention: y = w0*x0 + w1*x1 with
    |w0|^2+|w1|^2 = 1 (noise-power preserving).
    """

    w_re: jnp.ndarray              # [C, 2]  (complex kept split: a complex
    w_im: jnp.ndarray              # [C, 2]   leaf would cross the boundary)

    @classmethod
    def create(cls, channels: int, gain: float = 1.0, phase_deg: float = 0.0):
        w = np.stack([np.ones(channels, np.complex64),
                      (gain * np.exp(1j * np.deg2rad(phase_deg))
                       * np.ones(channels)).astype(np.complex64)], axis=1)
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        return cls(w_re=jnp.asarray(w.real, jnp.float32),
                   w_im=jnp.asarray(w.imag, jnp.float32))

    def set_weights(self, w: np.ndarray) -> "DiversityCombiner":
        w = np.asarray(w, np.complex128)
        w = w / np.linalg.norm(w, axis=1, keepdims=True)
        return self.replace(w_re=jnp.asarray(w.real, jnp.float32),
                            w_im=jnp.asarray(w.imag, jnp.float32))

    def init_state(self, channels: int):
        return ()

    def __call__(self, state, x: jnp.ndarray):
        """x [C, 2, B] complex -> (state, y [C, B])."""
        w = jax.lax.complex(self.w_re, self.w_im)
        return state, jnp.einsum("cp,cpb->cb", w, x,
                                 precision=jax.lax.Precision.HIGHEST)


def estimate_max_snr_weights(x: np.ndarray) -> np.ndarray:
    """[C, 2] combining weights maximising output power from a signal
    snapshot ``x [C, 2, B]`` — the principal eigenvector of the 2x2 spatial
    covariance per channel (host-side; called occasionally, not per block)."""
    x = np.asarray(x)
    R = np.einsum("cpb,cqb->cpq", x, np.conj(x)) / x.shape[-1]
    vals, vecs = np.linalg.eigh(R)          # ascending eigenvalues
    w = np.conj(vecs[:, :, -1])             # combine = conj of steering vec
    # fix arbitrary phase: make w0 real positive
    ph = w[:, :1] / np.maximum(np.abs(w[:, :1]), 1e-12)
    return (w * np.conj(ph)).astype(np.complex64)


def null_steering_weights(x_interf: np.ndarray) -> np.ndarray:
    """[C, 2] weights placing a null on the interference captured in
    ``x_interf [C, 2, B]`` (minimum-power eigenvector — parity with
    div.c's manual null steering, done adaptively)."""
    x = np.asarray(x_interf)
    R = np.einsum("cpb,cqb->cpq", x, np.conj(x)) / x.shape[-1]
    vals, vecs = np.linalg.eigh(R)
    w = np.conj(vecs[:, :, 0])              # smallest-eigenvalue direction
    ph = w[:, :1] / np.maximum(np.abs(w[:, :1]), 1e-12)
    return (w * np.conj(ph)).astype(np.complex64)
