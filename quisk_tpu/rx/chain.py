"""The composed receive chain: tune -> decimate -> filter -> demod -> AGC.

This is the TPU-native equivalent of the reference's per-block RX pipeline
``quisk_process_samples`` (quisk.c:2289): complex tune by NCO (2482-2488),
decimation chain (1673), channel filter + demodulation (1848), fractional
decimation to exactly the audio rate (2654-2659), AGC (2162) — except every
step is batched over a ``[channels, block]`` array, so one step demodulates
thousands of independent receivers (the reference caps at 3 demod banks + 9
sub-receivers, quisk.c:50, quisk.h:21).

All shapes/rates are static (chosen by the planner); all tunables (NCO
frequency words, filter masks, mode ids) are data.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from quisk_tpu.modes import CW_PITCH, DEFAULT_BANDWIDTH, Mode
from quisk_tpu.ops import design
from quisk_tpu.ops.agc import AGC
from quisk_tpu.ops.demod import MixedDemod
from quisk_tpu.ops.fir import ConvFIR, OverlapSaveFIR, make_fir
from quisk_tpu.ops.nco import NCO
from quisk_tpu.ops.noise import AutoNotch, NoiseBlanker
from quisk_tpu.ops.resample import FracDecim
from quisk_tpu.ops.squelch import FMSquelch, SSBSquelch
from quisk_tpu.rx.planner import DecimPlan, plan_block_sizes, plan_decimation


def mode_band(mode: Mode, bandwidth: float | None = None,
              cw_pitch: float = CW_PITCH) -> tuple[float, float]:
    """Audio passband edges (Hz, may be negative) for a mode.

    Mirrors the reference's per-mode filter placement (quisk.py:5405
    MakeFilterCoef: SSB filters start at ~300 Hz from the carrier, CW filters
    center on the pitch, AM/FM/IQ are symmetric about the carrier).
    """
    bw = float(bandwidth if bandwidth is not None else DEFAULT_BANDWIDTH[mode])
    if mode in (Mode.CWU, Mode.CWL):
        lo, hi = cw_pitch - bw / 2.0, cw_pitch + bw / 2.0
        return (-hi, -lo) if mode == Mode.CWL else (lo, hi)
    if mode.is_ssb_like:
        lo, hi = 300.0, 300.0 + bw
        return (-hi, -lo) if mode.is_lower else (lo, hi)
    # AM / FM / DGT_IQ / EXT: symmetric about the carrier
    return (-bw / 2.0, bw / 2.0)


def _cw_rit(modes: np.ndarray, cw_pitch: float) -> np.ndarray:
    """Per-channel RIT offset: CW filters center on +-cw_pitch, so the NCO
    must land a carrier at the dial frequency on the pitch, not DC (the
    reference applies RIT = -+cwTone on CW mode changes, quisk.py:6175-6177).
    """
    return np.where(modes == int(Mode.CWU), -cw_pitch,
                    np.where(modes == int(Mode.CWL), cw_pitch, 0.0))


@dataclasses.dataclass(frozen=True)
class RxChainConfig:
    """Static configuration of a receive chain (shapes/rates/plan)."""

    sample_rate: float                   # input IQ rate
    channels: int
    audio_rate: float = 48000.0
    audio_block: int = 2048              # requested; actual from planner
    filter_taps: int = 1025              # channel-filter length
    agc: bool = True
    # "delay": the fast block-parallel lookahead AGC (quisk.c:2162 parity);
    # "wcp": the conformance-exact WDSP 5-state AGC (wdsp/wcpAGC.c)
    agc_profile: str = "delay"
    fm_deviation_hz: float = 5000.0
    cw_pitch: float = CW_PITCH
    decim_atten_db: float = 100.0
    # optional processing stages (parity: the reference inserts these into
    # its RX path — NB on raw IQ quisk.c:2449, auto-notch quisk.c:794,
    # WDSP NR/ANF on audio, squelch muting quisk.c:2711)
    noise_blanker: int = 0               # 0=off, 1/2/3 = level
    auto_notch: bool = False
    nr: bool = False                     # spectral noise reduction (NR2)
    anf: bool = False                    # LMS auto-notch
    squelch: bool = False
    squelch_threshold: float = 1.2
    fm_squelch: bool = False             # RF-level squelch (quisk.c:2076)
    fm_squelch_db: float = -60.0
    ext_demod: str | None = None         # registered custom demod for EXT
    # STFT/FDAF ops (NR2, auto-notch, ANF) run their rfft/irfft as MXU
    # matmuls instead of the TPU FFT unit (ops/mxdft: single-stage below
    # 1024 pts, Cooley-Tukey above; A/B at featured shapes: NR2
    # 1.54 -> 1.05 ms/block, more in BENCH_DETAIL).  ~1e-5 relative.
    mxu_stft: bool = True
    # fuse NCO mix + first decimation stage into one Pallas kernel
    # (needs channels % 128 == 0 and a real-tap decim-2+ first stage)
    fused_frontend: bool = False
    # raw-IQ conditioning (rx/frontend.py): one-sample rail delay + I/Q
    # balance trim + spectrum inversion (sound.c:143-186, quisk.c:2442)
    # and DC removal (sound.c:188-253; 0 off, 1 window-average, >1 the
    # Lyons highpass at that bandwidth).  The trim itself is chain DATA
    # (cond.with_balance); these flags fix the compiled graph.
    front_cond: bool = False
    dc_remove_bw: int = 0


@struct.dataclass
class RxChain:
    """The jit-able chain. Build with :meth:`create`; tunables are data."""

    nco: NCO
    cond: "object"                        # FrontConditioner | None, raw IQ
    front: "object"                       # FusedTuneDecimate | None
    stages: tuple                         # ConvFIR decimator stages
    bp: OverlapSaveFIR                    # per-channel analytic bandpass
    frac: FracDecim | None
    demod: MixedDemod
    agc: AGC | None
    nb: NoiseBlanker | None               # on raw IQ, pre-tune
    notch: AutoNotch | None               # on audio
    nr: "object"                          # SpectralNR | None, on audio
    anf: "object"                         # BlockLMS | None, on audio
    squelch: SSBSquelch | None            # last: mutes audio
    fm_sq: FMSquelch | None               # RF-measured squelch
    # per-stage runtime enables (the reference's NB/Notch/NR2/AGC/Sqlch
    # buttons, quisk.py:4917-4960): [C, 1] f32 blend weights, 1 = stage
    # output, 0 = exact pass-through — toggling is DATA, the compiled
    # program never changes (keys exist only for stages that were built)
    ons: dict
    tune_base: jnp.ndarray                # [C] dial frequency (pre-RIT), data
    # static metadata
    channels: int = struct.field(pytree_node=False)
    block_in: int = struct.field(pytree_node=False)
    block_audio: int = struct.field(pytree_node=False)
    fs_audio: float = struct.field(pytree_node=False)

    # ---------------------------------------------------------------- build
    @classmethod
    def create(cls, config: RxChainConfig,
               tune_hz: Sequence[float] | float = 0.0,
               mode: Sequence[int] | int = Mode.USB,
               bandwidth_hz: Sequence[float] | None = None) -> "RxChain":
        C = config.channels
        plan = plan_decimation(config.sample_rate, config.audio_rate)
        blocks = plan_block_sizes(plan, config.audio_block)
        B_in, B_mid, B_audio = blocks["input"], blocks["mid"], blocks["audio"]

        modes = np.broadcast_to(np.asarray(mode, np.int32), (C,))
        base = np.broadcast_to(np.atleast_1d(
            np.asarray(tune_hz, np.float64)), (C,))
        tune_eff = base + _cw_rit(modes, config.cw_pitch)
        nco = NCO.create(tune_eff, config.sample_rate, B_in, C)

        stage_specs = []
        for d, fs_stage in zip(plan.stages, plan.stage_rates()):
            if d == 2:
                taps = design.halfband(45)
            else:
                taps = design.decimator(d, fs_stage,
                                        atten_db=config.decim_atten_db)
            stage_specs.append((np.asarray(taps, np.float64), d))

        # Fuse the longest leading run of decimators into the Pallas
        # tune+decimate front end via the cascade identity
        #   decim_d2(h2 * decim_d1(h1 * x)) = decim_d1d2((h1 * up_d1(h2)) * x)
        # — for the flagship /20 plan the WHOLE cascade fuses (tune + /2 +
        # /2 + /5 in one VMEM pass), removing two [C, B/d] intermediate HBM
        # round-trips and ~27% of the MXU patch work (K shrinks from
        # 300+300+962 summed partial windows to one 3980-deep dot).
        # Constraints per fused prefix: output block 128-aligned and the
        # kernel's TN=1 live set (two in-place-mixed scratch windows + the
        # [W, 128] tap matrix + NCO chunk temporaries) fits the 16 MB
        # scoped-VMEM stack — same model as FusedTuneDecimate's TN chooser.
        nb = (NoiseBlanker.create(config.sample_rate, config.noise_blanker)
              if config.noise_blanker else None)
        # blanker gain fuses into the front kernel when it runs on the
        # 16:1 coarse grid (wideband rates) — see FusedTuneDecimate
        nb_gain = nb is not None and nb.pool == 16
        front = None
        fuse_k = 0
        if config.fused_frontend and C % 128 == 0:
            comb, d_tot = None, 1
            for taps, d in stage_specs:
                if comb is None:
                    cand, cand_d = taps, d
                else:
                    up = np.zeros((len(taps) - 1) * d_tot + 1)
                    up[::d_tot] = taps
                    cand, cand_d = np.convolve(comb, up), d_tot * d
                W = 128 * cand_d + len(cand) - 1
                if nb_gain:
                    # fused NB detection (call_nb): gain slab + window
                    # halos + coarse stats + interp/one-hot matrices
                    # (mirrors FusedTuneDecimate.create's nb_plan model)
                    gain_vmem = ((-(-(W // 16 + 66) // 128) * 128) * 128 * 4
                                 + 66 * 1024 * 4
                                 + 2 * 1280 * 128 * 8 // 2   # LB+LA halos
                                 + 2 * 768 * 128 * 4         # S/X stats
                                 + 2 * 512 * 32 * 4)         # G16/Sel
                else:
                    gain_vmem = 0
                if ((B_in // cand_d) % 128
                        or (W * 128 * 8 + W * 128 * 4
                            + 6 * 128 * 1024 * 4 + gain_vmem) > (14 << 20)):
                    break
                comb, d_tot = cand, cand_d
                fuse_k += 1
            if fuse_k:
                from quisk_tpu.ops.pallas_kernels import FusedTuneDecimate
                front = FusedTuneDecimate.create(
                    comb, tune_eff, config.sample_rate, B_in, d_tot, C,
                    nb_detect=({"avg_win": nb.avg_win,
                                "kwidth": nb.kwidth} if nb_gain else None))

        stages = []
        b = B_in if front is None else B_in // front.decim
        for taps, d in stage_specs[fuse_k:]:
            # real-tap decimators run as MXU matmuls (MatmulFIR)
            stages.append(make_fir(taps, b, decim=d))
            b //= d
        assert b == B_mid

        if bandwidth_hz is None:
            bands = [mode_band(Mode(int(m)), None, config.cw_pitch)
                     for m in modes]
        else:
            bws = np.broadcast_to(np.asarray(bandwidth_hz, np.float64), (C,))
            bands = [mode_band(Mode(int(m)), bw, config.cw_pitch)
                     for m, bw in zip(modes, bws)]
        # channel filter runs at fs_mid (before the fractional stage), so
        # design the taps at that rate; dedupe identical bands (design cost
        # is per unique filter, not per channel)
        cache: dict[tuple, np.ndarray] = {}
        for lo, hi in set(bands):
            cache[(lo, hi)] = design.bandpass_analytic(
                config.filter_taps, lo, hi, plan.fs_mid)
        taps = np.stack([cache[b] for b in bands])
        bp = OverlapSaveFIR.create(taps, B_mid)

        frac = FracDecim.create(plan.frac, B_mid) if plan.frac else None

        demod = MixedDemod.create(modes, plan.fs_out, C,
                                  config.fm_deviation_hz,
                                  ext_demod=config.ext_demod)
        if not config.agc:
            agc = None
        elif config.agc_profile == "wcp":
            from quisk_tpu.ops.agc import WcpAGC
            agc = WcpAGC.create(plan.fs_out)
        else:
            agc = AGC.create(plan.fs_out)
        cond = None
        if config.front_cond or config.dc_remove_bw > 0:
            from quisk_tpu.rx.frontend import FrontConditioner
            cond = FrontConditioner.create(C, config.sample_rate,
                                           dc_bw=config.dc_remove_bw)
        notch = (AutoNotch.create(B_audio, mxu_dft=config.mxu_stft)
                 if config.auto_notch else None)
        nr = None
        if config.nr:
            from quisk_tpu.ops.nr import SpectralNR
            nr = SpectralNR.create(B_audio, mxu_dft=config.mxu_stft)
        anf = None
        if config.anf:
            from quisk_tpu.ops.nr import BlockLMS
            anf = BlockLMS.create(B_audio, notch=True,
                                  mxu_dft=config.mxu_stft)
        squelch = (SSBSquelch.create(plan.fs_out, B_audio,
                                     config.squelch_threshold)
                   if config.squelch else None)
        fm_sq = (FMSquelch.create(plan.fs_out, B_audio,
                                  config.fm_squelch_db)
                 if config.fm_squelch else None)
        ons = {name: jnp.ones((C, 1), jnp.float32)
               for name, op in (("nb", nb), ("notch", notch), ("nr", nr),
                                ("anf", anf), ("agc", agc),
                                ("squelch", squelch), ("fm_sq", fm_sq))
               if op is not None}
        return cls(nco=nco, cond=cond, front=front, stages=tuple(stages),
                   bp=bp,
                   frac=frac, demod=demod, agc=agc, nb=nb, notch=notch,
                   nr=nr, anf=anf, squelch=squelch, fm_sq=fm_sq, ons=ons,
                   tune_base=jnp.asarray(base, jnp.float32), channels=C,
                   block_in=B_in, block_audio=B_audio, fs_audio=plan.fs_out)

    # --------------------------------------------------------------- retune
    def retune(self, config: RxChainConfig,
               tune_hz: Sequence[float] | float | None = None,
               mode: Sequence[int] | int | None = None,
               bandwidth_hz: Sequence[float] | None = None,
               notches_hz=None) -> "RxChain":
        """New chain with updated tunables (NCO words, filter masks, mode
        vector) — every changed quantity is data with unchanged shapes, so
        stepping the new chain reuses the compiled program and the carried
        state (the reference's click-free retune property, firmin.c
        double-buffered masks; use ``bp.retune_crossfade`` for an audible
        crossfade over a few blocks)."""
        C = self.channels
        new = self
        modes = np.broadcast_to(
            np.asarray(mode if mode is not None
                       else np.asarray(self.demod.mode), np.int32), (C,))
        if tune_hz is not None or mode is not None:
            base = (np.broadcast_to(np.atleast_1d(
                        np.asarray(tune_hz, np.float64)), (C,))
                    if tune_hz is not None
                    else np.asarray(self.tune_base, np.float64))
            tune_eff = base + _cw_rit(modes, config.cw_pitch)
            new = new.replace(tune_base=jnp.asarray(base, jnp.float32))
            if new.front is not None:
                from quisk_tpu.ops.nco import freq_word
                w = freq_word(tune_eff, config.sample_rate)
                new = new.replace(front=new.front.replace(word=w))
            else:
                new = new.replace(nco=NCO.create(
                    tune_eff, config.sample_rate, self.block_in, C))
        if mode is not None or bandwidth_hz is not None or notches_hz is not None:
            if bandwidth_hz is None:
                bands = [mode_band(Mode(int(m)), None, config.cw_pitch)
                         for m in modes]
            else:
                bws = np.broadcast_to(np.asarray(bandwidth_hz, np.float64),
                                      (C,))
                bands = [mode_band(Mode(int(m)), bw, config.cw_pitch)
                         for m, bw in zip(modes, bws)]
            # per-channel manual notches (wdsp/nbp.c notch-bank bandpass):
            # baseband (f_center, width) pairs carved out of the channel
            # filter at design time — still pure data, no recompile
            if notches_hz is None:
                nlists = [()] * C
            elif notches_hz and isinstance(notches_hz[0], (int, float)):
                raise ValueError("notches_hz: per-channel sequences of "
                                 "(center_hz, width_hz) pairs")
            elif len(notches_hz) and (
                    not len(notches_hz[0])
                    or isinstance(notches_hz[0][0], (tuple, list))):
                nlists = [tuple(map(tuple, nl)) for nl in notches_hz]
                if len(nlists) == 1:
                    nlists = nlists * C
            else:                        # one flat list of pairs: broadcast
                nlists = [tuple(map(tuple, notches_hz))] * C
            plan = plan_decimation(config.sample_rate, config.audio_rate)
            cache: dict[tuple, np.ndarray] = {}
            for band, nl in set(zip(bands, nlists)):
                lo, hi = band
                cache[(band, nl)] = design.bandpass_with_notches(
                    config.filter_taps, lo, hi, plan.fs_mid, nl)
            taps = np.stack([cache[(b, nl)]
                             for b, nl in zip(bands, nlists)])
            new = new.replace(bp=new.bp.retuned(taps))
            if mode is not None:
                new = new.replace(demod=new.demod.replace(
                    mode=jnp.asarray(modes)))
        return new

    # ---------------------------------------------------------------- state
    # ------------------------------------------------- runtime stage toggles
    def set_stage(self, name: str, on, channel: int | None = None
                  ) -> "RxChain":
        """Turn an optional stage on/off at runtime — pure data, the
        compiled program is reused (the reference's NB/Notch/NR2/AGC/
        Sqlch buttons toggle the same flags live, quisk.py:4917-4960).
        ``name`` in {'nb','notch','nr','anf','agc','squelch','fm_sq'};
        per-channel with ``channel``, all channels otherwise.  Off is an
        exact pass-through: output matches a chain built without the
        stage."""
        if name not in self.ons:
            raise KeyError(f"stage {name!r} not built into this chain "
                           f"(have {sorted(self.ons)})")
        if channel is None:
            arr = jnp.full((self.channels, 1), 1.0 if on else 0.0,
                           jnp.float32)
        else:
            arr = self.ons[name].at[channel, 0].set(1.0 if on else 0.0)
        return self.replace(ons={**self.ons, name: arr})

    def stage_on(self, name: str) -> bool:
        """True if the stage exists and channel 0 has it enabled."""
        return name in self.ons and bool(np.asarray(self.ons[name])[0, 0])

    def set_nb_level(self, level: int) -> "RxChain":
        """Noise-blanker threshold level 1/2/3 (the reference's NB cycle
        button, quisk.c:716-727 limits 6.0/4.0/2.5) — data only."""
        if self.nb is None:
            raise KeyError("chain built without a noise blanker")
        limit = {1: 6.0, 2: 4.0, 3: 2.5}[int(level)]
        return self.replace(nb=self.nb.replace(limit=jnp.float32(limit)))

    @property
    def _nb_fused(self) -> bool:
        """True when blanker detection + gain run inside the front
        kernel (FusedTuneDecimate.call_nb)."""
        return (self.front is not None and self.nb is not None
                and getattr(self.front, "nbspec", None) is not None
                and self.nb.pool == 16)

    def init_state(self):
        C = self.channels

        def st(op):
            return op.init_state(C) if op is not None else ()

        if self._nb_fused:
            # coarse blanker-gain history covering the front's raw FIR
            # history samples (gain 1 = nothing blanked before the stream)
            nbg = np.ones((C, self.front.gain_hist_groups), np.float32)
        else:
            nbg = ()
        return {
            "nbg": nbg,
            "nco": self.nco.init_state(C) if self.front is None else (),
            "cond": st(self.cond),
            "front": st(self.front),
            "stages": tuple(s.init_state(C) for s in self.stages),
            "bp": self.bp.init_state(C),
            "frac": self.frac.init_state(C) if self.frac else (),
            "demod": self.demod.init_state(C),
            "agc": st(self.agc),
            "nb": st(self.nb),
            "notch": st(self.notch),
            "nr": st(self.nr),
            "anf": st(self.anf),
            "squelch": st(self.squelch),
            "fm_sq": st(self.fm_sq),
        }

    # ----------------------------------------------------------------- step
    def step(self, state, x: jnp.ndarray, key_down=False):
        """One block: x [C, block_in] complex IQ -> audio [C, block_audio].

        Stage order mirrors the reference RX path (quisk.c:2289): raw-IQ
        conditioning first (sound.c capture path: rail delay, I/Q balance,
        DC removal, inversion), blanker on raw IQ, tune, decimate, channel
        filter, demodulate, then the audio processors (notch/ANF/NR before
        AGC, squelch muting last).  ``key_down`` gates the window-average
        DC mode (sound.c:221-229).
        """
        st = dict(state)

        def blend(name, wet, dry):
            # runtime stage enable as DATA: 1 -> stage output, 0 -> exact
            # pass-through (identical to a chain built without the stage,
            # since downstream sees the untouched signal)
            g = self.ons[name]
            return wet * g + dry * (1.0 - g)

        if self.cond is not None:
            st["cond"], x = self.cond(st["cond"], x, key_down=key_down)
        if self.nb is not None and self._nb_fused:
            # detection AND gain both run inside the Pallas front kernel
            # (VERDICT r3 item 1): the blanker adds NO full-rate HBM pass
            # — group stats come from the window already in VMEM, the
            # stage toggle and threshold ride in as data, and the coarse
            # gain comes back out as next block's history carry
            st["front"], y, gout = self.front.call_nb(
                st["front"], x, st["nbg"], self.ons["nb"], self.nb.limit)
            st["nbg"] = gout[:, -self.front.gain_hist_groups:]
        else:
            if self.nb is not None:
                st["nb"], xb = self.nb(st["nb"], x)
                x = blend("nb", xb, x)
            if self.front is not None:
                st["front"], y = self.front(st["front"], x)
            else:
                st["nco"], y = self.nco(st["nco"], x)
        new_stage_states = []
        for op, s in zip(self.stages, st["stages"]):
            s, y = op(s, y)
            new_stage_states.append(s)
        st["stages"] = tuple(new_stage_states)
        st["bp"], y = self.bp(st["bp"], y)
        if self.frac is not None:
            st["frac"], y = self.frac(st["frac"], y)
        if self.fm_sq is not None:
            rf_db = self.fm_sq.measure(y)      # pre-demod carrier power
        y_filtered = y                          # audio-rate filtered IQ
        st["demod"], audio = self.demod(st["demod"], y)
        if self.notch is not None:
            st["notch"], a2 = self.notch(st["notch"], audio)
            audio = blend("notch", a2, audio)
        if self.anf is not None:
            st["anf"], a2 = self.anf(st["anf"], audio)
            audio = blend("anf", a2, audio)
        if self.nr is not None:
            st["nr"], a2 = self.nr(st["nr"], audio)
            audio = blend("nr", a2, audio)
        if self.agc is not None:
            st["agc"], a2 = self.agc(st["agc"], audio)
            audio = blend("agc", a2, audio)
        if self.squelch is not None:
            st["squelch"], a2 = self.squelch(st["squelch"], audio)
            audio = blend("squelch", a2, audio)
        if self.fm_sq is not None:
            st["fm_sq"], a2 = self.fm_sq(st["fm_sq"], audio, rf_db)
            audio = blend("fm_sq", a2, audio)
        if self.demod.iq_out:
            # DGT-IQ pass-through (quisk.c:2141-2153): those channels emit
            # the raw channel-filtered IQ for external digital programs;
            # the whole block becomes complex64 (real audio rides Re)
            is_iq = (self.demod.mode == int(Mode.DGT_IQ))[:, None]
            audio = jnp.where(is_iq, y_filtered,
                              audio.astype(jnp.complex64))
        return st, audio

    def step_blocks(self, state, iq: jnp.ndarray, nblocks: int):
        """``nblocks`` consecutive blocks in ONE dispatch: iq [C,
        nblocks*block_in] -> audio [C, nblocks*block_audio].

        The loop is Python-unrolled inside the jitted program (NOT
        lax.scan — scanning around the Pallas front-end hangs Mosaic
        compilation, see CLAUDE.md), trading compile time for amortizing
        the per-dispatch overhead across blocks.  Bit-identical to
        ``nblocks`` successive :meth:`step` calls."""
        C = iq.shape[0]
        outs = []
        for i in range(nblocks):
            state, a = self.step(
                state, jax.lax.slice_in_dim(
                    iq, i * self.block_in, (i + 1) * self.block_in, axis=-1))
            outs.append(a)
        return state, jnp.concatenate(outs, axis=-1)

    def process(self, state, iq: jnp.ndarray):
        """Many blocks: iq [C, N] -> audio [C, N_audio].

        lax.scan over blocks — except when the Pallas fused front is
        active: scanning around a pallas_call hangs Mosaic compilation
        (CLAUDE.md), so that path streams block-by-block from the host
        (the per-block program is compiled once and reused)."""
        C, N = iq.shape
        nblk = N // self.block_in
        xb = iq[:, : nblk * self.block_in]
        if self.front is not None:
            outs = []
            for k in range(nblk):
                state, a = self.step(
                    state, jax.lax.slice_in_dim(
                        xb, k * self.block_in, (k + 1) * self.block_in,
                        axis=-1))
                outs.append(a)
            return state, jnp.concatenate(outs, axis=-1)
        xb = xb.reshape(C, nblk, self.block_in).transpose(1, 0, 2)

        def body(st, blk):
            return self.step(st, blk)

        state, audio = jax.lax.scan(body, state, xb)
        return state, audio.transpose(1, 0, 2).reshape(C, -1)
