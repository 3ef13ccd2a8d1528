"""Delay-line AGC as a parallel scan.

Parity: the reference AGC (quisk.c:2162 ``process_agc``) keeps a ~15 ms
lookahead delay buffer, tracks the max magnitude in the buffer, drops gain
instantly on clip (ramping across the lookahead so the clip never reaches the
output) and releases exponentially over ~1 s (quisk.c:2185).  WDSP's wcpAGC
(wdsp/wcpAGC.c) is the same idea with a hang state.

The per-sample recurrence ``g[n] = min(g[n-1] * release, limit[n])`` is, in
log domain, ``lg[n] = min(lg[n-1] + d, l[n])`` — a composition of functions
``x -> min(x + d, l)`` which is associative, so the whole block evaluates in
O(log B) depth with ``jax.lax.associative_scan``; channels ride the vector
lanes.  The lookahead envelope is a sliding-window maximum computed with the
van Herk two-pass cummax trick (O(B), no reduce_window).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def sliding_max(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """max over x[..., n : n+window] for each n (right-looking), van Herk.

    x: [C, B].  Positions whose window extends past the end use what exists
    (callers append future samples before calling when full lookahead is
    needed).
    """
    C, B = x.shape
    W = window
    nblk = -(-B // W)
    pad = nblk * W - B
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=neg)
    blocks = xp.reshape(C, nblk, W)
    pref = jax.lax.cummax(blocks, axis=2)                     # prefix max
    suff = jax.lax.cummax(blocks[:, :, ::-1], axis=2)[:, :, ::-1]  # suffix max
    pref = pref.reshape(C, nblk * W)
    suff = suff.reshape(C, nblk * W)
    # out[n] = max(suffix_max_of_block_at(n), prefix_max_at(n+W-1))
    idx = jnp.arange(B) + W - 1
    pref_ext = jnp.pad(pref, ((0, 0), (0, W)), constant_values=neg)
    return jnp.maximum(suff[:, :B], pref_ext[:, idx])


def _min_scan(limit: jnp.ndarray, inc, lg0: jnp.ndarray) -> jnp.ndarray:
    """lg[n] = min(lg[n-1] + inc, limit[n]) for all n, associative form."""
    incs = jnp.full_like(limit, inc)

    def combine(a, b):
        i1, m1 = a
        i2, m2 = b
        return i1 + i2, jnp.minimum(m1 + i2, m2)

    I, M = jax.lax.associative_scan(combine, (incs, limit), axis=-1)
    return jnp.minimum(lg0[:, None] + I, M)


@struct.dataclass
class AGC:
    """Lookahead AGC on real audio ``[C, B]`` blocks.

    target: output peak level; max_gain: gain ceiling (the reference's
    ``agcReleaseGain``); release_db_per_s: recovery speed; lookahead:
    delay-buffer length in samples (15 ms at 48 k = 720 in the reference).
    """

    target: jnp.ndarray
    max_lgain: jnp.ndarray          # log of max gain
    release_inc: jnp.ndarray        # log-gain increase per sample
    lookahead: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, target: float = 0.9,
               max_gain_db: float = 80.0, release_db_per_s: float = 60.0,
               lookahead_ms: float = 15.0):
        W = max(1, int(round(lookahead_ms * 1e-3 * sample_rate)))
        inc = np.log(10.0) * release_db_per_s / 20.0 / sample_rate
        return cls(target=jnp.float32(target),
                   max_lgain=jnp.float32(np.log(10.0) * max_gain_db / 20.0),
                   release_inc=jnp.float32(inc), lookahead=W)

    def init_state(self, channels: int):
        delay = jnp.zeros((channels, self.lookahead), jnp.float32)
        lg = jnp.zeros((channels,), jnp.float32)   # start at unity gain
        return delay, lg

    def __call__(self, state, a: jnp.ndarray):
        """a [C, B] float audio -> gain-controlled audio, same shape.

        Output sample n corresponds to input sample n - lookahead: the gain
        applied to it already saw `lookahead` samples of future.
        """
        delay, lg_prev = state
        W = self.lookahead
        ext = jnp.concatenate([delay, a], axis=-1)        # [C, W+B]
        # env[n] over the W samples starting at the delayed output position
        env = sliding_max(jnp.abs(ext), W)[:, : a.shape[-1]]
        limit = jnp.minimum(
            jnp.log(self.target / jnp.maximum(env, 1e-9)), self.max_lgain)
        lg = _min_scan(limit, self.release_inc, lg_prev)
        out = ext[:, : a.shape[-1]] * jnp.exp(lg)
        new_delay = ext[:, ext.shape[-1] - W:]
        return (new_delay, lg[:, -1]), out


@struct.dataclass
class HangAGC:
    """wcpAGC-style AGC with a hang interval (parity wdsp/wcpAGC.c).

    The reference WDSP AGC holds the gain fixed for ``hang_ms`` after a
    peak (the "hang" of its 5-state attack/hang/decay machine) before the
    exponential recovery starts — voice between syllables keeps a steady
    gain instead of pumping.  Realised block-parallel: instantaneous gain
    limit from a lookahead sliding max (attack), then a per-sample scan
    carrying (log-gain, hang counter): gain drops immediately to the
    limit, rises only when the counter has expired.
    """

    target: jnp.ndarray
    max_lgain: jnp.ndarray
    release_inc: jnp.ndarray
    hang_samples: int = struct.field(pytree_node=False)
    lookahead: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, target: float = 0.9,
               max_gain_db: float = 80.0, release_db_per_s: float = 60.0,
               hang_ms: float = 250.0, lookahead_ms: float = 15.0):
        W = max(1, int(round(lookahead_ms * 1e-3 * sample_rate)))
        inc = np.log(10.0) * release_db_per_s / 20.0 / sample_rate
        return cls(target=jnp.float32(target),
                   max_lgain=jnp.float32(np.log(10.0) * max_gain_db / 20.0),
                   release_inc=jnp.float32(inc),
                   hang_samples=max(1, int(hang_ms * 1e-3 * sample_rate)),
                   lookahead=W)

    def init_state(self, channels: int):
        return (jnp.zeros((channels, self.lookahead), jnp.float32),
                jnp.zeros((channels,), jnp.float32),
                jnp.zeros((channels,), jnp.int32))

    def __call__(self, state, a: jnp.ndarray):
        delay, lg0, hang0 = state
        W = self.lookahead
        ext = jnp.concatenate([delay, a], axis=-1)
        env = sliding_max(jnp.abs(ext), W)[:, : a.shape[-1]]
        limit = jnp.minimum(
            jnp.log(self.target / jnp.maximum(env, 1e-9)), self.max_lgain)

        def step(carry, lim):
            lg, hang = carry
            attack = lim < lg                      # must reduce gain now
            lg_new = jnp.where(attack, lim,
                               jnp.where(hang > 0, lg,
                                         jnp.minimum(lg + self.release_inc,
                                                     lim)))
            hang_new = jnp.where(attack, self.hang_samples,
                                 jnp.maximum(hang - 1, 0))
            return (lg_new, hang_new), lg_new

        (lg_f, hang_f), lgs = jax.lax.scan(
            step, (lg0, hang0), jnp.moveaxis(limit, 1, 0))
        lg = jnp.moveaxis(lgs, 0, 1)
        out = ext[:, : a.shape[-1]] * jnp.exp(lg)
        return (ext[:, ext.shape[-1] - W:], lg_f, hang_f), out
