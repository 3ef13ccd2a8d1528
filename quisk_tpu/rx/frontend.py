"""Raw-IQ front-end conditioning: channel delay, I/Q balance, DC removal,
spectrum inversion.

Parity with the reference's capture-side sample correction, applied to the
raw IQ stream before the noise blanker / tuner:

- one-sample I-or-Q channel delay ``delay_sample`` (sound.c:143-169) for
  sound cards that skew the two rails by one frame;
- amplitude/phase balance ``correct_sample`` (sound.c:171-186):
  ``re' = A*re;  im' = C*re + D*im`` with ``A = 1/(1+ampl)``,
  ``C = -A*tan(phi)``, ``D = 1/cos(phi)`` from the GUI's ampl fraction and
  phase in degrees (sound.c:1565-1581) — the softrock-style image-reject
  trim, saved per band;
- DC removal ``DCremove`` (sound.c:188-253): bw==1 averages the samples
  over 2 s windows (gated off for 1 s after key-down) and subtracts the
  average; bw>1 is the R. G. Lyons one-pole DC blocker
  ``c = x + alpha*dc; y = c - dc; dc = c`` with alpha from the reference's
  half-power formula;
- spectrum inversion (quisk.c:2442-2446): ``x = conj(x)`` for hardware
  whose IF flips the band (e.g. the SDR-8600 plugin).

TPU shape: everything is per-channel *data* (retuning the trim never
recompiles) except the DC mode/bandwidth, which fixes the compiled graph
(the reference also recomputes coefficients on a bandwidth change).  The
balance matrix and inversion compose into one 2x2 per-channel matrix —
inversion negates the second row, and the real per-rail DC filter commutes
with both.  The bw>1 blocker runs as the blocked-matmul ``ew_cumsum``
(ops/ewscan.py), not a per-sample scan: at the raw rate a block is ~40k
samples and scans/cumsums there cost >10 ms (CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from quisk_tpu.ops.ewscan import ew_cumsum


def dc_alpha(bw_hz: int, sample_rate: float) -> float:
    """The reference's DC-blocker pole (sound.c:202-215)."""
    omega = np.pi * bw_hz / (sample_rate / 2.0)
    qsin, qcos = np.sin(omega), np.cos(omega)
    h0 = 1.0 / np.sqrt(2.0)
    x = ((qcos - 1.0) ** 2 + qsin ** 2) / h0 ** 2 - qsin ** 2
    return float(qcos - np.sqrt(x))


def balance_matrix(ampl: float, phase_deg: float, invert: bool):
    """(m00, m10, m11) rows of the composed balance+inversion 2x2."""
    if ampl == 0.0 and phase_deg == 0.0:
        a, c, d = 1.0, 0.0, 1.0
    else:
        g = 1.0 + ampl                       # factor 0.01 -> 1.01
        phi = np.deg2rad(phase_deg)
        a = 1.0 / g
        c = -a * np.tan(phi)
        d = 1.0 / np.cos(phi)
    s = -1.0 if invert else 1.0
    return a, s * c, s * d


@struct.dataclass
class FrontConditioner:
    """delay -> balance (+inversion) -> DC removal on raw [C, B] IQ."""

    channels: int = struct.field(pytree_node=False)
    dc_mode: str = struct.field(pytree_node=False)   # off | avg | hp
    sample_rate: float = struct.field(pytree_node=False)
    dc_a: float = struct.field(pytree_node=False)    # hp-mode pole
    m00: jnp.ndarray                                  # [C, 1]
    m10: jnp.ndarray
    m11: jnp.ndarray
    delay_sel: jnp.ndarray                            # [C, 1] 0/1=I/2=Q

    @classmethod
    def create(cls, channels: int, sample_rate: float,
               ampl: float = 0.0, phase_deg: float = 0.0,
               invert: bool = False, delay: int = 0, dc_bw: int = 0):
        mode = "off" if dc_bw <= 0 else ("avg" if dc_bw == 1 else "hp")
        a = dc_alpha(dc_bw, sample_rate) if mode == "hp" else 0.0
        new = cls(channels=channels, dc_mode=mode, sample_rate=sample_rate,
                  dc_a=a,
                  m00=jnp.ones((channels, 1), jnp.float32),
                  m10=jnp.zeros((channels, 1), jnp.float32),
                  m11=jnp.ones((channels, 1), jnp.float32),
                  delay_sel=jnp.full((channels, 1), int(delay), jnp.int32))
        return new.with_balance(ampl, phase_deg, invert)

    def with_balance(self, ampl, phase_deg, invert=False, channel=None):
        """Data-only update of the trim (all channels or one)."""
        m00, m10, m11 = balance_matrix(ampl, phase_deg, invert)
        if channel is None:
            C = self.channels
            return self.replace(
                m00=jnp.full((C, 1), m00, jnp.float32),
                m10=jnp.full((C, 1), m10, jnp.float32),
                m11=jnp.full((C, 1), m11, jnp.float32))
        return self.replace(
            m00=self.m00.at[channel, 0].set(m00),
            m10=self.m10.at[channel, 0].set(m10),
            m11=self.m11.at[channel, 0].set(m11))

    # --------------------------------------------------------------- state
    def init_state(self, channels: int):
        C = channels
        z = jnp.zeros((C,), jnp.float32)
        st = {"last_i": z, "last_q": z}
        if self.dc_mode == "hp":
            st["dc_re"] = z
            st["dc_im"] = z
        elif self.dc_mode == "avg":
            st["avg_re"] = z
            st["avg_im"] = z
            st["sum_re"] = z
            st["sum_im"] = z
            st["count"] = jnp.zeros((), jnp.int32)
            st["key_delay"] = jnp.zeros((), jnp.int32)
        return st

    # ---------------------------------------------------------------- step
    def __call__(self, state, x: jnp.ndarray, key_down=False):
        st = dict(state)
        re, im = jnp.real(x), jnp.imag(x)
        B = x.shape[-1]

        # one-sample rail delay (sound.c:143): shift the selected rail
        re_d = jnp.concatenate([st["last_i"][:, None], re[:, :-1]], axis=-1)
        im_d = jnp.concatenate([st["last_q"][:, None], im[:, :-1]], axis=-1)
        st["last_i"] = re[:, -1]
        st["last_q"] = im[:, -1]
        re = jnp.where(self.delay_sel == 1, re_d, re)
        im = jnp.where(self.delay_sel == 2, im_d, im)

        # balance + inversion as one per-channel 2x2 (sound.c:180)
        re, im = self.m00 * re, self.m10 * re + self.m11 * im

        if self.dc_mode == "hp":
            # dc[n] = x[n] + alpha*dc[n-1]; y[n] = dc[n] - dc[n-1]
            dre = ew_cumsum(re, self.dc_a, st["dc_re"])
            dim = ew_cumsum(im, self.dc_a, st["dc_im"])
            re = dre - jnp.concatenate(
                [st["dc_re"][:, None], dre[:, :-1]], axis=-1)
            im = dim - jnp.concatenate(
                [st["dc_im"][:, None], dim[:, :-1]], axis=-1)
            st["dc_re"] = dre[:, -1]
            st["dc_im"] = dim[:, -1]
        elif self.dc_mode == "avg":
            # (sound.c:221-244) freeze + reset while key down, hold 1 s,
            # then average 2 s windows; always subtract the current average
            key = jnp.asarray(key_down, bool)
            rate = jnp.int32(self.sample_rate)
            settling = st["key_delay"] < rate
            st["key_delay"] = jnp.where(
                key, 0, jnp.where(settling,
                                  st["key_delay"] + jnp.int32(B),
                                  st["key_delay"]))
            acc = jnp.logical_and(~key, ~settling)
            sum_re = st["sum_re"] + jnp.where(acc, jnp.sum(re, -1), 0.0)
            sum_im = st["sum_im"] + jnp.where(acc, jnp.sum(im, -1), 0.0)
            count = st["count"] + jnp.where(acc, jnp.int32(B), 0)
            full = count > 2 * rate
            st["avg_re"] = jnp.where(full, sum_re / count, st["avg_re"])
            st["avg_im"] = jnp.where(full, sum_im / count, st["avg_im"])
            reset = jnp.logical_or(key, full)
            st["sum_re"] = jnp.where(reset, 0.0, sum_re)
            st["sum_im"] = jnp.where(reset, 0.0, sum_im)
            st["count"] = jnp.where(reset, 0, count)
            re = re - st["avg_re"][:, None]
            im = im - st["avg_im"][:, None]

        return st, jnp.asarray(re + 1j * im, x.dtype)
