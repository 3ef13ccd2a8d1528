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

        from quisk_tpu.ops.scanutil import unrolled_scan
        (lg_f, hang_f), lgs = unrolled_scan(
            step, (lg0, hang0), jnp.moveaxis(limit, 1, 0))
        lg = jnp.moveaxis(lgs, 0, 1)
        out = ext[:, : a.shape[-1]] * jnp.exp(lg)
        return (ext[:, ext.shape[-1] - W:], lg_f, hang_f), out


@struct.dataclass
class WcpAGC:
    """Conformance-exact WDSP AGC (wdsp/wcpAGC.c:161-342 ``xwcpagc``).

    The full algorithm: attack_buffsize lookahead delay, sliding max of
    the envelope over the attack window, fast and hang back-averages of
    the *output-side* envelope, and the 5-state machine on ``volts``
    (0 attack/track, 1 fast decay after a pop, 2 hang hold, 3 normal
    decay, 4 post-hang decay), finished by the log-slope gain law
    ``mult = (out_target - slope*min(0, log10(volts/max_input)))/volts``.

    Tested sample-for-sample against the float64 oracle
    (quisk_tpu.oracle.wcpagc).  The window max is block-parallel (van
    Herk); only the scalar state machine runs in the per-sample scan, so
    channels ride the vector lanes.
    """

    # derived constants (loadWcpAGC, wcpAGC.c:115-146), all jnp scalars
    attack_mult: jnp.ndarray
    decay_mult: jnp.ndarray
    fast_decay_mult: jnp.ndarray
    fast_backmult: jnp.ndarray
    hang_backmult: jnp.ndarray
    hang_decay_mult: jnp.ndarray
    out_target: jnp.ndarray
    min_volts: jnp.ndarray
    slope_constant: jnp.ndarray
    hang_level: jnp.ndarray
    pop_ratio: jnp.ndarray
    inv_max_input: jnp.ndarray
    hang_samples: int = struct.field(pytree_node=False)
    hang_enable: bool = struct.field(pytree_node=False)
    lookahead: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sample_rate: float, **overrides) -> "WcpAGC":
        from quisk_tpu.oracle.wcpagc import WcpParams

        p = WcpParams(sample_rate=sample_rate, **overrides)
        d = p.derived()
        f = jnp.float32
        return cls(attack_mult=f(d["attack_mult"]),
                   decay_mult=f(d["decay_mult"]),
                   fast_decay_mult=f(d["fast_decay_mult"]),
                   fast_backmult=f(d["fast_backmult"]),
                   hang_backmult=f(d["hang_backmult"]),
                   hang_decay_mult=f(d["hang_decay_mult"]),
                   out_target=f(d["out_target"]),
                   min_volts=f(d["min_volts"]),
                   slope_constant=f(d["slope_constant"]),
                   hang_level=f(d["hang_level"]),
                   pop_ratio=f(p.pop_ratio),
                   inv_max_input=f(1.0 / p.max_input),
                   hang_samples=d["hangtime_samples"],
                   hang_enable=bool(p.hang_enable),
                   lookahead=p.attack_buffsize)

    def init_state(self, channels: int):
        C, A = channels, self.lookahead
        z = lambda: jnp.zeros((C,), jnp.float32)
        return {
            "delay": jnp.zeros((C, A), jnp.float32),     # raw samples
            "volts": z(), "save_volts": z(),
            "fast_ba": z(), "hang_ba": z(),
            "hang_counter": jnp.zeros((C,), jnp.int32),
            "state": jnp.zeros((C,), jnp.int32),
            "decay_type": jnp.zeros((C,), jnp.int32),
        }

    def __call__(self, state, a: jnp.ndarray):
        st = state
        A = self.lookahead
        B = a.shape[-1]
        ext = jnp.concatenate([st["delay"], a], axis=-1)   # [C, A+B]
        env_ext = jnp.abs(ext)
        # trailing attack-window max ending at each input sample: with the
        # A-1 carried samples this is the right-looking window at offset j
        ring_max = sliding_max(env_ext[:, 1:], A)[:, :B]
        out_sample = ext[:, :B]                            # delayed by A
        abs_out = env_ext[:, :B]

        def step(carry, xs):
            volts, save, fba, hba, hc, s, dt = carry
            rm, ao = xs
            fba = self.fast_backmult * ao + (1 - self.fast_backmult) * fba
            hba = self.hang_backmult * ao + (1 - self.hang_backmult) * hba
            hc = jnp.maximum(hc - 1, 0)

            att = volts + (rm - volts) * self.attack_mult
            dec = volts + (rm - volts) * self.decay_mult
            fdec = volts + (rm - volts) * self.fast_decay_mult
            hdec = volts + (rm - volts) * self.hang_decay_mult
            attack = rm >= volts
            hang_ok = self.hang_enable & (hba > self.hang_level)

            # state 0: attack / pop fast-decay / hang entry / decay
            pop = volts > self.pop_ratio * fba
            v0 = jnp.where(attack, att,
                           jnp.where(pop, fdec, jnp.where(hang_ok, volts, dec)))
            s0 = jnp.where(attack, 0, jnp.where(pop, 1, jnp.where(hang_ok, 2, 3)))
            hc0 = jnp.where(~attack & ~pop & hang_ok, self.hang_samples, hc)
            dt0 = jnp.where(attack | pop, dt, jnp.where(hang_ok, 1, 0))

            # state 1: fast decay toward save_volts
            above = volts > save
            v1 = jnp.where(attack, att,
                           jnp.where(above, fdec,
                                     jnp.where(hc > 0, volts,
                                               jnp.where(dt == 0, dec, hdec))))
            s1 = jnp.where(attack, 0,
                           jnp.where(above, 1,
                                     jnp.where(hc > 0, 2,
                                               jnp.where(dt == 0, 3, 4))))

            # state 2: hang hold
            v2 = jnp.where(attack, att, jnp.where(hc == 0, hdec, volts))
            s2 = jnp.where(attack, 0, jnp.where(hc == 0, 4, 2))

            # states 3 / 4: plain decay / post-hang decay
            v3 = jnp.where(attack, att, dec)
            s3 = jnp.where(attack, 0, 3)
            v4 = jnp.where(attack, att, hdec)
            s4 = jnp.where(attack, 0, 4)

            # re-entering attack from 2/3/4 snapshots save_volts
            save_new = jnp.where((s >= 2) & attack, volts, save)

            volts_n = jnp.where(s == 0, v0, jnp.where(s == 1, v1,
                                jnp.where(s == 2, v2,
                                          jnp.where(s == 3, v3, v4))))
            s_n = jnp.where(s == 0, s0, jnp.where(s == 1, s1,
                            jnp.where(s == 2, s2,
                                      jnp.where(s == 3, s3, s4))))
            hc_n = jnp.where(s == 0, hc0, hc)
            dt_n = jnp.where(s == 0, dt0, dt)

            volts_n = jnp.maximum(volts_n, self.min_volts)
            mult = (self.out_target - self.slope_constant
                    * jnp.minimum(0.0, jnp.log10(self.inv_max_input * volts_n))
                    ) / volts_n
            return (volts_n, save_new, fba, hba, hc_n, s_n, dt_n), mult

        carry0 = (st["volts"], st["save_volts"], st["fast_ba"], st["hang_ba"],
                  st["hang_counter"], st["state"], st["decay_type"])
        from quisk_tpu.ops.scanutil import unrolled_scan
        carry, mults = unrolled_scan(
            step, carry0,
            (jnp.moveaxis(ring_max, 1, 0), jnp.moveaxis(abs_out, 1, 0)))
        mult = jnp.moveaxis(mults, 0, 1)
        out = out_sample * mult
        new_st = {
            "delay": ext[:, ext.shape[-1] - A:],
            "volts": carry[0], "save_volts": carry[1],
            "fast_ba": carry[2], "hang_ba": carry[3],
            "hang_counter": carry[4], "state": carry[5],
            "decay_type": carry[6],
        }
        return new_st, out


@struct.dataclass
class TxALC:
    """Conformance TX ALC (microphone.c:270-358 ``process_alc``).

    20 ms lookahead delay; when a sample would clip at the gain it will
    see when it exits, the gain ramps down linearly across the buffer to
    exactly avoid the clip; recovery ramps are bounded by the observed
    clip headroom AND a gain-doubling time of ~5 s; gain is clamped to
    [0.1, 3.0] and remembered PER MODE (``gain_now[rx_mode]``), so
    returning to a mode restores its level.  Levels normalized to 1.0
    full scale (reference works at CLIP16 with a 10-count margin).
    """

    target: jnp.ndarray
    gain_max: jnp.ndarray
    gain_min: jnp.ndarray
    d_limit: jnp.ndarray            # per-sample gain increase bound
    min_magn: jnp.ndarray           # silence floor (ref: 100 counts)
    mode: jnp.ndarray               # [C] int32 active mode per channel
    buf: int = struct.field(pytree_node=False)
    n_modes: int = struct.field(pytree_node=False, default=14)

    @classmethod
    def create(cls, sample_rate: float, mode=0, channels: int = 1,
               buf_ms: float = 20.0, clip_level: float = 1.0,
               gain_max: float = 3.0, gain_min: float = 0.1,
               double_secs: float = 5.0, n_modes: int = 14) -> "TxALC":
        A = int(sample_rate * buf_ms / 1000.0)
        m = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (channels,))
        return cls(target=jnp.float32(clip_level * (32767.0 - 10.0) / 32767.0),
                   gain_max=jnp.float32(gain_max),
                   gain_min=jnp.float32(gain_min),
                   d_limit=jnp.float32(1.0 / (48000.0 * double_secs)),
                   min_magn=jnp.float32(100.0 / 32758.0),
                   mode=m, buf=A, n_modes=n_modes)

    def init_state(self, channels: int):
        C, A = channels, self.buf
        return {
            # raw complex delay line stays host numpy at init (complex64
            # cannot cross the host<->device boundary on axon)
            "buffer": np.zeros((C, A), np.complex64),
            "gain_now": jnp.ones((C, self.n_modes), jnp.float32),
            "gain_change": jnp.zeros((C,), jnp.float32),
            "final_gain": jnp.zeros((C,), jnp.float32),
            "next_change": jnp.full((C,), 1e10, jnp.float32),
            "counter": jnp.zeros((C,), jnp.float32),
            "fault": jnp.zeros((C,), jnp.float32),
            "block_index": jnp.zeros((C,), jnp.int32),
            "index": jnp.zeros((), jnp.int32),
        }

    def __call__(self, state, x: jnp.ndarray):
        st = state
        C, B = x.shape
        A = self.buf
        onehot_mode = jax.nn.one_hot(self.mode, self.n_modes,
                                     dtype=jnp.float32)          # [C, M]
        # Two structural rewrites keep the (inherently sequential,
        # reference-exact) recurrence to O(C) VECTOR ops per sample:
        # 1. the delay line never enters the scan — the output is just the
        #    input delayed by A samples (a static concat+slice) scaled by
        #    the gain trajectory, and the gain recurrence only reads the
        #    CURRENT sample's magnitude;
        # 2. the per-mode gain memory only has its active row touched
        #    inside a block (mode is static data), so the scan carries the
        #    scalar per-channel gain and the one-hot scatter back into
        #    gain_now happens once per block.
        # (The naive port — ring buffer + masked write + one-hot update
        # per sample — cost ~80 ms/block at [256, 2048] on the TPU.)
        ext = jnp.concatenate([jnp.asarray(st["buffer"]), x], axis=-1)
        out_raw = ext[:, :B]                                     # x delayed A
        magn_in = jnp.abs(x)
        g0 = jnp.sum(st["gain_now"] * onehot_mode, axis=-1)      # [C]

        def sample_step(carry, magn):
            g, gc, fg, nc, cnt, flt, bi, idx = carry

            clip = magn * (g + gc * A) > self.target
            # clip branch: down-ramp to land exactly at the safe gain
            gc1 = (self.target / jnp.maximum(magn, 1e-9) - g) / A
            fg1 = jnp.clip(g + gc1 * A, self.gain_min, self.gain_max)
            gc1 = (fg1 - g) / A
            # block-complete branch: recovery ramp from observed headroom,
            # bounded by the gain-doubling time
            blk = bi == idx
            nc2 = jnp.minimum(nc, self.d_limit)
            gc2 = jnp.where(flt < A - 10, nc2, gc)
            fg2 = jnp.clip(g + gc2 * A, self.gain_min, self.gain_max)
            gc2 = (fg2 - g) / A
            # observe branch
            silent = magn < self.min_magn
            cnt3 = cnt + jnp.where(silent, 0.0, 1.0)
            d3 = (self.target / jnp.maximum(magn, 1e-9) - fg) \
                / jnp.maximum(cnt3, 1.0)
            nc3 = jnp.where(silent, nc, jnp.minimum(nc, d3))
            flt3 = flt + jnp.where(silent, 1.0, 0.0)

            gc_n = jnp.where(clip, gc1, jnp.where(blk, gc2, gc))
            fg_n = jnp.where(clip, fg1, jnp.where(blk, fg2, fg))
            nc_n = jnp.where(clip | blk, jnp.float32(1e10), nc3)
            cnt_n = jnp.where(clip | blk, 0.0, cnt3)
            flt_n = jnp.where(clip | blk, 0.0, flt3)
            bi_n = jnp.where(clip, jnp.broadcast_to(idx, bi.shape), bi)

            g_new = g + gc_n
            idx_n = jnp.where(idx + 1 >= A, 0, idx + 1)
            return (g_new, gc_n, fg_n, nc_n, cnt_n, flt_n, bi_n,
                    idx_n), g

        carry0 = (g0, st["gain_change"],
                  st["final_gain"], st["next_change"], st["counter"],
                  st["fault"], st["block_index"], st["index"])
        from quisk_tpu.ops.scanutil import unrolled_scan
        carry, gains = unrolled_scan(
            sample_step, carry0, jnp.moveaxis(magn_in, 1, 0))
        out = out_raw * jnp.moveaxis(gains, 0, 1).astype(out_raw.dtype)
        new_st = dict(zip(("gain_now", "gain_change", "final_gain",
                           "next_change", "counter", "fault", "block_index",
                           "index"), carry))
        new_st["buffer"] = ext[:, ext.shape[-1] - A:]
        new_st["gain_now"] = (st["gain_now"]
                              + (carry[0] - g0)[:, None] * onehot_mode)
        return new_st, out
