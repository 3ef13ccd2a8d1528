"""Demodulators: SSB/CW, AM, FM, and a branch-free mixed-mode batch.

Parity targets in the reference (quisk.c:1848 ``quisk_process_demodulate``):

- SSB/CW (quisk.c:1910-2001): after the analytic channel filter has selected
  one sideband, audio is a fixed linear combination of Re/Im of the filter
  output.  The reference uses Re±Im (a 45-degree phase rotation of the same
  signal); we use 2*Re, identical spectrum and SNR, unity passband gain.
- AM (quisk.c:2002-2025): envelope |x| followed by a one-pole DC blocker
  (Lyons p.553).
- FM (quisk.c:2026-2086): phase-difference discriminator
  arg(x[n] * conj(x[n-1])) followed by one-pole de-emphasis at 300 Hz.

All demods are elementwise over ``[channels, block]`` — the cheap part of the
chain — so the mixed-mode batch simply computes every family and selects per
channel with ``jnp.where`` (branch-free, SURVEY.md §7 "pad-and-select").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from quisk_tpu.modes import Mode
from quisk_tpu.ops.iir import DCBlock, OnePole


@struct.dataclass
class SSBDemod:
    """Analytic-signal SSB/CW demod: audio = 2*Re(x).  Stateless."""

    gain: jnp.ndarray

    @classmethod
    def create(cls, gain: float = 2.0):
        return cls(gain=jnp.asarray(gain, jnp.float32))

    def init_state(self, channels: int):
        return ()

    def __call__(self, state, x: jnp.ndarray):
        return state, self.gain * jnp.real(x)


@struct.dataclass
class AMDemod:
    """Envelope detector with DC removal."""

    dc: DCBlock
    gain: jnp.ndarray

    @classmethod
    def create(cls, gain: float = 2.0, pole: float = 0.995):
        return cls(dc=DCBlock.create(pole), gain=jnp.asarray(gain, jnp.float32))

    def init_state(self, channels: int):
        return self.dc.init_state(channels)

    def __call__(self, state, x: jnp.ndarray):
        env = jnp.abs(x)
        state, audio = self.dc(state, env)
        return state, self.gain * audio

    def envelope(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(x)


@struct.dataclass
class FMDemod:
    """Phase-difference discriminator with de-emphasis.

    ``gain = fs / (2 pi deviation)`` maps full deviation to audio +-1.
    State: (prev complex sample [C], de-emphasis y_prev [C]).
    """

    deemph: OnePole
    gain: jnp.ndarray

    @classmethod
    def create(cls, sample_rate: float, deviation_hz: float = 5000.0,
               deemph_hz: float = 300.0):
        g = sample_rate / (2.0 * np.pi * deviation_hz)
        return cls(deemph=OnePole.lowpass(deemph_hz, sample_rate),
                   gain=jnp.asarray(g, jnp.float32))

    def init_state(self, channels: int):
        # host numpy: complex64 cannot cross the host<->device boundary
        return (np.zeros((channels,), np.complex64),
                self.deemph.init_state(channels))

    def discriminate(self, prev: jnp.ndarray, x: jnp.ndarray):
        xm1 = jnp.concatenate([prev[:, None], x[:, :-1]], axis=-1)
        d = x * jnp.conj(xm1)
        # Gate vanishing magnitudes (filter warmup, dead air): the angle of
        # a ~1e-7 residual is pure numerical noise whose SIGN flips with
        # one-ULP kernel-fusion differences (+/-pi jumps) — emit 0 there so
        # the discriminator is deterministic across eager/jit/sharded
        # executions.  Real signals sit many orders above the gate.
        disc = jnp.where(jnp.abs(d) > 1e-12,
                         jnp.arctan2(jnp.imag(d), jnp.real(d)), 0.0)
        return x[:, -1], disc

    def __call__(self, state, x: jnp.ndarray):
        prev, y_prev = state
        prev, disc = self.discriminate(prev, x)
        y_prev, audio = self.deemph(y_prev, disc * self.gain)
        return (prev, y_prev), audio


@struct.dataclass
class PLLFMDemod:
    """FM discriminator by carrier-tracking PLL (parity wdsp/fmd.c xfmd).

    A second-order loop tracks the instantaneous phase; the demodulated
    audio is the loop's frequency estimate (smoother under noise than the
    phase-difference discriminator, which is why WDSP uses it for NFM).
    Optional CTCSS notch removes the sub-audible tone (fmd.c snotch).

    State: (phase [C], freq [C], deemph y_prev [C], notch state).
    Per-sample loop via lax.scan; channels ride the vector lanes.
    """

    deemph: OnePole
    notch: "object"            # Biquad | None (static None when disabled)
    alpha: jnp.ndarray
    beta: jnp.ndarray
    gain: jnp.ndarray          # audio units per rad/sample
    max_freq: jnp.ndarray

    @classmethod
    def create(cls, sample_rate: float, deviation_hz: float = 5000.0,
               loop_bw_hz: float = 5000.0, deemph_hz: float = 300.0,
               ctcss_hz: float = 0.0, max_offset_hz: float = 10000.0):
        from quisk_tpu.ops.iir import Biquad
        wn = 2.0 * np.pi * loop_bw_hz / sample_rate
        zeta = 0.707
        g = sample_rate / (2.0 * np.pi * deviation_hz)
        notch = (Biquad.notch(ctcss_hz, sample_rate, q=5.0)
                 if ctcss_hz > 0.0 else None)
        return cls(deemph=OnePole.lowpass(deemph_hz, sample_rate),
                   notch=notch,
                   alpha=jnp.float32(2.0 * zeta * wn),
                   beta=jnp.float32(wn * wn),
                   gain=jnp.float32(g),
                   max_freq=jnp.float32(
                       2.0 * np.pi * max_offset_hz / sample_rate))

    def init_state(self, channels: int):
        z = jnp.zeros((channels,), jnp.float32)
        notch_st = (self.notch.init_state(channels)
                    if self.notch is not None else ())
        return (z, z, self.deemph.init_state(channels), notch_st)

    def __call__(self, state, x: jnp.ndarray):
        import jax

        phase0, freq0, de0, notch_st = state

        def step(carry, xt):
            ph, fr = carry
            osc = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
            v = xt * osc
            err = jnp.arctan2(jnp.imag(v), jnp.real(v))
            fr = jnp.clip(fr + self.beta * err, -self.max_freq, self.max_freq)
            ph = ph + fr + self.alpha * err
            ph = jnp.where(ph > np.pi, ph - 2 * np.pi,
                           jnp.where(ph < -np.pi, ph + 2 * np.pi, ph))
            return (ph, fr), fr + self.alpha * err   # inst. freq estimate

        from quisk_tpu.ops.scanutil import unrolled_scan
        (ph, fr), w = unrolled_scan(step, (phase0, freq0),
                                    jnp.moveaxis(x, 1, 0))
        audio = jnp.moveaxis(w, 0, 1) * self.gain
        de0, audio = self.deemph(de0, audio)
        if self.notch is not None:
            notch_st, audio = self.notch(notch_st, audio)
        return (ph, fr, de0, notch_st), audio


# --------------------------------------------------------------- extdemod
# Custom demodulator plugin slot (parity extdemod.c: a user-hackable EXT
# demod compiled into the reference; here a registry of ops).  A custom
# demod is any (state, x[C,B] complex) -> (state, audio[C,B] float) op
# with init_state(channels); channels whose mode is Mode.EXT use it.
_EXT_DEMODS: dict[str, object] = {}


def register_ext_demod(name: str, factory) -> None:
    """factory(sample_rate, channels) -> demod op."""
    _EXT_DEMODS[name] = factory


def get_ext_demod(name: str):
    return _EXT_DEMODS[name]


@struct.dataclass
class MixedDemod:
    """Per-channel mode selection over a shared ``[C, B]`` batch.

    Every family is computed (they are cheap elementwise/scan ops next to the
    FIR work) and the per-channel result selected with masks from the int32
    ``mode`` vector, so one compiled program serves any mode mix — the
    reference's per-mode C switch (quisk.c:1909-2153) with the branches
    turned into data.  An optional EXT plugin demod (extdemod.c parity)
    handles channels set to Mode.EXT.
    """

    ssb: SSBDemod
    am: AMDemod
    fm: FMDemod
    ext: "object"              # custom demod op | None
    mode: jnp.ndarray          # [C] int32
    # static: any channel created as DGT-IQ makes the CHAIN's audio output
    # complex64 — DGT-IQ rows carry the raw filtered IQ (quisk.c:2141-2153
    # pass-through for digital programs), other rows real audio + 0j
    iq_out: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, mode, sample_rate: float, channels: int,
               fm_deviation_hz: float = 5000.0, ext_demod: str | None = None):
        m_np = np.broadcast_to(np.asarray(mode, np.int32), (channels,))
        m = jnp.asarray(m_np)
        ext = (get_ext_demod(ext_demod)(sample_rate, channels)
               if ext_demod else None)
        return cls(ssb=SSBDemod.create(), am=AMDemod.create(),
                   fm=FMDemod.create(sample_rate, fm_deviation_hz),
                   ext=ext, mode=m,
                   iq_out=bool(np.any(m_np == int(Mode.DGT_IQ))))

    def init_state(self, channels: int):
        ext_st = self.ext.init_state(channels) if self.ext is not None else ()
        return (self.am.init_state(channels), self.fm.init_state(channels),
                ext_st)

    def __call__(self, state, x: jnp.ndarray):
        am_st, fm_st, ext_st = state
        _, a_ssb = self.ssb((), x)
        am_st, a_am = self.am(am_st, x)
        fm_st, a_fm = self.fm(fm_st, x)
        m = self.mode[:, None]
        is_am = m == int(Mode.AM)
        is_fm = m == int(Mode.FM)
        audio = jnp.where(is_am, a_am, jnp.where(is_fm, a_fm, a_ssb))
        if self.ext is not None:
            ext_st, a_ext = self.ext(ext_st, x)
            audio = jnp.where(m == int(Mode.EXT), a_ext, audio)
        return (am_st, fm_st, ext_st), audio


@struct.dataclass
class GroupedDemod:
    """Mode demodulation over STATICALLY contiguous per-mode channel runs.

    Where :class:`MixedDemod` computes every demod family on every
    channel and mask-selects (so the mode vector stays retunable DATA),
    this variant slices each contiguous run of same-family channels and
    runs only its own demod — at channelizer scale ([4096, 16384]) the
    mixed path's extra families + selects are each a full pass over a
    268 MB batch.  The grouping is baked at create() (changing the mode
    LAYOUT recompiles), which fits the PFB pipeline where channel->mode
    is a fixed plan; per-channel retuning stays with MixedDemod.
    SURVEY §7 hard-parts: "grouped-by-mode sub-batches likely fastest"
    (reference per-mode switch: quisk.c:1909-2153).
    """

    ssb: SSBDemod
    am: AMDemod
    fm: FMDemod
    runs: tuple = struct.field(pytree_node=False)   # ((family, lo, hi), ...)

    _FAMS = {int(Mode.AM): "am", int(Mode.FM): "fm"}

    @classmethod
    def create(cls, mode, sample_rate: float, channels: int,
               fm_deviation_hz: float = 5000.0):
        m = np.broadcast_to(np.asarray(mode, np.int32), (channels,))
        fam = np.asarray([cls._FAMS.get(int(v), "ssb") for v in m])
        edges = [0] + [i for i in range(1, channels)
                       if fam[i] != fam[i - 1]] + [channels]
        runs = tuple((str(fam[lo]), lo, hi)
                     for lo, hi in zip(edges[:-1], edges[1:]))
        return cls(ssb=SSBDemod.create(), am=AMDemod.create(),
                   fm=FMDemod.create(sample_rate, fm_deviation_hz),
                   runs=runs)

    def init_state(self, channels: int):
        return tuple(getattr(self, f).init_state(hi - lo)
                     for f, lo, hi in self.runs)

    def __call__(self, state, x: jnp.ndarray):
        new_states, outs = [], []
        for st, (f, lo, hi) in zip(state, self.runs):
            st, a = getattr(self, f)(st, x[lo:hi])
            new_states.append(st)
            outs.append(a)
        return tuple(new_states), jnp.concatenate(outs, axis=0)


@struct.dataclass
class GroupedDemodTM:
    """Time-major grouped demod over (re, im) float planes ``[..., T, C]``.

    The channelizer-scale variant of :class:`GroupedDemod`: it consumes
    the PFB IDFT's matmul output IN ITS NATIVE LAYOUT — time on axis -2,
    channels on the lanes, real/imag as separate f32 planes — so the
    pipeline never materializes the [K, T] channel-major complex batch
    that cost the r4 PFB a 536+268 MB HBM round trip (BENCH_DETAIL r4;
    the demod *compute* is <1 ms/family, probe_pfb_demod.py).  Same math
    as GroupedDemod per family (reference per-mode switch
    quisk.c:1909-2153):

    - SSB/CW: audio = gain * re
    - AM: envelope + DC blocker (time-major chunked-MXU one-pole)
    - FM: phase-difference discriminator + 300 Hz de-emphasis

    All state is real f32 (FM's previous sample is carried as an
    (re, im) pair), so nothing complex ever approaches the host<->device
    boundary.  Lead dims (e.g. the stream axis) broadcast through.
    """

    am_dc: "object"            # DCBlock
    fm_deemph: "object"        # OnePole
    ssb_gain: jnp.ndarray
    am_gain: jnp.ndarray
    fm_gain: jnp.ndarray
    runs: tuple = struct.field(pytree_node=False)   # ((family, lo, hi), ...)

    @classmethod
    def create(cls, mode, sample_rate: float, channels: int,
               fm_deviation_hz: float = 5000.0, gain: float = 2.0,
               deemph_hz: float = 300.0, am_pole: float = 0.995):
        from quisk_tpu.ops.iir import DCBlock, OnePole
        m = np.broadcast_to(np.asarray(mode, np.int32), (channels,))
        fam = np.asarray([GroupedDemod._FAMS.get(int(v), "ssb") for v in m])
        edges = [0] + [i for i in range(1, channels)
                       if fam[i] != fam[i - 1]] + [channels]
        runs = tuple((str(fam[lo]), lo, hi)
                     for lo, hi in zip(edges[:-1], edges[1:]))
        g_fm = sample_rate / (2.0 * np.pi * fm_deviation_hz)
        return cls(am_dc=DCBlock.create(am_pole),
                   fm_deemph=OnePole.lowpass(deemph_hz, sample_rate),
                   ssb_gain=jnp.asarray(gain, jnp.float32),
                   am_gain=jnp.asarray(gain, jnp.float32),
                   fm_gain=jnp.asarray(g_fm, jnp.float32),
                   runs=runs)

    def init_state(self, channels: int, lead: tuple = ()):
        sts = []
        for f, lo, hi in self.runs:
            n = hi - lo
            z = np.zeros((*lead, n), np.float32)
            if f == "ssb":
                sts.append(())
            elif f == "am":
                sts.append((z, z.copy()))              # (x_prev, y_prev)
            else:                                       # fm
                sts.append((z, z.copy(), z.copy()))     # (pr, pi, deemph y)
        return tuple(sts)

    def _ssb(self, st, yr, yi):
        return st, self.ssb_gain * yr

    def _am(self, st, yr, yi):
        env = jnp.sqrt(yr * yr + yi * yi)
        st, audio = self.am_dc.apply_tm(st, env)
        return st, self.am_gain * audio

    def _fm(self, st, yr, yi):
        pr, pi, de = st
        # d[t] = y[t] * conj(y[t-1]) along the time axis (rows)
        xr1 = jnp.concatenate([pr[..., None, :], yr[..., :-1, :]], axis=-2)
        xi1 = jnp.concatenate([pi[..., None, :], yi[..., :-1, :]], axis=-2)
        dr = yr * xr1 + yi * xi1
        di = yi * xr1 - yr * xi1
        # same vanishing-magnitude gate as FMDemod.discriminate (|d| on
        # squared magnitudes: 1e-24 is comfortably inside f32 normals)
        disc = jnp.where(dr * dr + di * di > 1e-24,
                         jnp.arctan2(di, dr), 0.0)
        de, audio = self.fm_deemph.apply_tm(de, disc * self.fm_gain)
        return (yr[..., -1, :], yi[..., -1, :], de), audio

    def __call__(self, state, yr: jnp.ndarray, yi: jnp.ndarray):
        """(state, yr, yi) -> (state, audio [..., T, C])."""
        new_states, outs = [], []
        for st, (f, lo, hi) in zip(state, self.runs):
            st, a = getattr(self, "_" + f)(st, yr[..., lo:hi],
                                           yi[..., lo:hi])
            new_states.append(st)
            outs.append(a)
        return tuple(new_states), jnp.concatenate(outs, axis=-1)
