"""Transmit chain: mic audio -> processed -> modulated IQ at the TX rate.

Parity: the reference's ``quisk_process_microphone`` (microphone.c:1092) and
``tx_filter`` (microphone.c:372): mic bandpass 300-2700, pre-emphasis
(~6 dB/oct, microphone.c:452-465), mic AGC, clip + quadratic soft compressor
(484-518), analytic (Hilbert-by-tuned-FIR) I/Q split (469), ALC with 20 ms
lookahead (270), per-mode modulators (1226-1278): SSB = the analytic signal,
AM = 0.5 + audio/2 (1238-1240), FM = **phase modulation of the tx_filter'ed
audio** ``e^{j(audio_scale*x + ctcss_scale*sin)}`` ("phase modulation == FM
and 6 dB/octave preemphasis", microphone.c:1253-1258), with the CTCSS phase
amplitude scaled for 15% of total deviation (microphone.c:1247), then
interpolation to the TX sample rate (1307-1336).

Batched ``[channels, block]``; the CTCSS oscillator phase is carried across
blocks (wrapped mod 2 pi each block so float32 never loses precision).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from quisk_tpu.modes import Mode
from quisk_tpu.ops import design
from quisk_tpu.ops.agc import TxALC
from quisk_tpu.ops.compress import OvershootControl, SoftCompressor
from quisk_tpu.ops.fir import OverlapSaveFIR
from quisk_tpu.ops.iir import Preemphasis
from quisk_tpu.ops.resample import Interpolator

TWO_PI = 2.0 * np.pi


@dataclasses.dataclass(frozen=True)
class TxChainConfig:
    channels: int
    audio_rate: float = 48000.0
    tx_rate: float = 48000.0            # must be audio_rate * integer
    audio_block: int = 2048
    mic_band: tuple[float, float] = (300.0, 2700.0)
    filter_taps: int = 513
    preemphasis: float = 0.0            # 0..1, first-difference coefficient
    compress_db: float = 0.0            # 0 = off
    alc: bool = True
    fm_deviation_hz: float = 2500.0
    ctcss_hz: float = 0.0
    am_carrier: float = 0.5             # carrier fraction (ref: (x+CLIP16)/2)
    cessb: bool = False                 # CESSB overshoot control (osctrl.c)
    predistort: bool = False            # PureSignal correction slot (iqc.c)
    phase_rotator: bool = False         # WDSP phrot (iir.c:557, TXA.c:562)


@struct.dataclass
class TxChain:
    analytic: OverlapSaveFIR            # 300-2700 analytic bandpass (USB)
    phrot: "object"                     # PhaseRotator | None, on mic audio
    preemph: Preemphasis | None
    comp: SoftCompressor | None
    alc: TxALC | None
    cessb: OvershootControl | None
    predist: "object"                   # Predistorter | None
    interp: Interpolator | None
    mode: jnp.ndarray                   # [C] int32
    # TX I/Q balance trim (sound.c:735-741: the is_tx=1 arm of
    # quisk_set_ampl_phase corrects the outgoing stream with the same
    # A/C/D 2x2); identity by default, pure data — see set_ampl_phase
    trim: tuple                         # (m00, m10, m11) each [C, 1]
    # Spot button (microphone.c:1218-1221 transmit_mic_carrier): >= 0
    # replaces the TX output with a plain carrier at that amplitude
    # (reference level 0..1000 -> 0..1.0); -1 = off.  Pure data.
    spot: jnp.ndarray                   # [C, 1] f32
    # TX baseband tune (sound.c:708/1118: tx_mic_phase rotates the
    # outgoing IQ by tx_tune_freq at the playback rate) — used when the
    # hardware cannot place TX itself (soundcard radios, split TX); the
    # uint32 NCO word is pure data so retunes/split never recompile
    tune: "object"                      # NCO at the TX rate, word 0 = off
    pm_gain: jnp.ndarray                # rad per unit *bandpassed* audio
    ctcss_word: jnp.ndarray             # rad/sample CTCSS increment
    ctcss_amp: jnp.ndarray              # rad CTCSS phase amplitude
    am_carrier: jnp.ndarray
    channels: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    block_tx: int = struct.field(pytree_node=False)
    audio_rate: float = struct.field(pytree_node=False, default=48000.0)

    @classmethod
    def create(cls, config: TxChainConfig,
               mode: Sequence[int] | int = Mode.USB) -> "TxChain":
        C = config.channels
        B = config.audio_block
        lo, hi = config.mic_band
        # per-channel TX filters: voice modes get the mic bandpass,
        # digital modes a wide flat filter (parity microphone.c:605
        # tx_filter_digital — a wider tuned FIR so data tones pass flat)
        m_arr = np.broadcast_to(np.asarray(mode, np.int32), (C,))
        voice_taps = design.bandpass_analytic(config.filter_taps, lo, hi,
                                              config.audio_rate)
        dgt_modes = {int(Mode.DGT_U), int(Mode.DGT_L), int(Mode.DGT_IQ),
                     int(Mode.DGT_FDV), int(Mode.FDV_U), int(Mode.FDV_L)}
        if any(int(mm) in dgt_modes for mm in m_arr):
            dgt_taps = design.bandpass_analytic(
                config.filter_taps, 50.0, 3050.0, config.audio_rate)
            taps = np.stack([dgt_taps if int(mm) in dgt_modes else voice_taps
                             for mm in m_arr])
        else:
            taps = voice_taps
        analytic = OverlapSaveFIR.create(taps, B)
        # always instantiated: coefficient 0 / drive 0 dB are exact
        # pass-throughs, so per-mode clip/preemph settings (quisk.py:3716
        # txAudioClip*/txAudioPreemph*) are pure data — switching TX mode
        # audio processing never recompiles (see set_audio_settings)
        pre = Preemphasis.create(config.preemphasis)
        comp = SoftCompressor.create(config.compress_db)
        # conformance process_alc (microphone.c:270): 20 ms lookahead,
        # clip-safe down-ramp, 5 s gain-doubling recovery, per-mode gain
        # memory — applied to the MODULATED IQ like the reference
        alc = (TxALC.create(config.audio_rate, mode=m_arr, channels=C)
               if config.alc else None)
        ratio = config.tx_rate / config.audio_rate
        L = int(round(ratio))
        if abs(ratio - L) > 1e-9:
            raise ValueError("tx_rate must be an integer multiple of audio_rate")
        interp = (Interpolator.create(L, B, fs_out=config.tx_rate)
                  if L > 1 else None)
        cessb = (OvershootControl.create(B, config.audio_rate,
                                         band=config.mic_band)
                 if config.cessb else None)
        predist = None
        if config.predistort:
            from quisk_tpu.tx.puresignal import Predistorter
            predist = Predistorter.identity()
        m = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (C,))
        # FM is phase modulation of the bandpassed audio: a modulation index
        # beta rad per full-scale unit reaches fm_deviation_hz at the band
        # edge (deviation of PM = beta * f_audio).  The reference anchors
        # "total deviation" the same way (microphone.c:1242-1262: audio_scale
        # = modulation_index/CLIP16, scaled x0.85 when CTCSS is on; the CTCSS
        # phase amplitude 450*mi/f_ctcss is 15% of the 3000*mi total).  The
        # factor 2 compensates the analytic filter's 0.5x real-part gain.
        beta = config.fm_deviation_hz / config.mic_band[1]
        if config.ctcss_hz > 9.0:
            pm_gain = 2.0 * 0.85 * beta
            ct_amp = 0.15 * config.fm_deviation_hz / config.ctcss_hz
        else:
            pm_gain = 2.0 * beta
            ct_amp = 0.0
        ct_w = TWO_PI * config.ctcss_hz / config.audio_rate
        phrot = None
        if config.phase_rotator:
            from quisk_tpu.ops.iir import PhaseRotator
            phrot = PhaseRotator.create(fs=config.audio_rate)
        trim = (jnp.ones((C, 1), jnp.float32),
                jnp.zeros((C, 1), jnp.float32),
                jnp.ones((C, 1), jnp.float32))
        from quisk_tpu.ops.nco import NCO
        tune = NCO.create(np.zeros(C), config.tx_rate, B * L, C)
        return cls(analytic=analytic, phrot=phrot, trim=trim, tune=tune,
                   spot=jnp.full((C, 1), -1.0, jnp.float32),
                   preemph=pre, comp=comp, alc=alc,
                   cessb=cessb, predist=predist, interp=interp, mode=m,
                   pm_gain=jnp.float32(pm_gain), ctcss_word=jnp.float32(ct_w),
                   ctcss_amp=jnp.float32(ct_amp),
                   am_carrier=jnp.float32(config.am_carrier),
                   channels=C, block=B, block_tx=B * L,
                   audio_rate=config.audio_rate)

    def set_audio_settings(self, clip_db=None, preemph=None) -> "TxChain":
        """New chain with per-channel TX audio clip (dB of compressor
        drive, 0 = off) and/or preemphasis coefficient (0..1, 0 = off) —
        data-only, shapes unchanged (parity quisk.py:5681-5695: the
        per-mode txAudioClip*/txAudioPreemph* sliders)."""
        new = self
        if clip_db is not None:
            arr = np.broadcast_to(np.asarray(clip_db, np.float32),
                                  (self.channels,))
            new = new.replace(comp=SoftCompressor.create(arr))
        if preemph is not None:
            arr = np.broadcast_to(np.asarray(preemph, np.float32),
                                  (self.channels,))
            new = new.replace(preemph=new.preemph.replace(
                c=jnp.asarray(arr, jnp.float32)))
        return new

    def init_state(self):
        C = self.channels
        return {
            "imd_phase": jnp.zeros((C, 2), jnp.float32),
            "analytic": self.analytic.init_state(C),
            "phrot": self.phrot.init_state(C) if self.phrot else (),
            "preemph": self.preemph.init_state(C) if self.preemph else (),
            "alc": self.alc.init_state(C) if self.alc else (),
            "ctcss_phase": jnp.zeros((C,), jnp.float32),
            "tune_phase": self.tune.init_state(C),
            "interp": self.interp.init_state(C) if self.interp else (),
            "cessb": self.cessb.init_state(C) if self.cessb else (),
        }

    def step(self, state, audio: jnp.ndarray):
        """audio [C, block] float -> (state, iq [C, block_tx] complex64)."""
        st = dict(state)
        a = audio
        # IMD mode: replace the mic with the standard two-tone test signal
        # (700 + 1900 Hz, parity microphone.c:140-159, 1070-1091)
        m0 = self.mode[:, None]
        is_imd = m0 == int(Mode.IMD)
        n = jnp.arange(self.block, dtype=jnp.float32)[None, :] + 1.0
        w1 = TWO_PI * 700.0 / self.audio_rate
        w2 = TWO_PI * 1900.0 / self.audio_rate
        ph1 = st["imd_phase"][:, 0:1] + w1 * n
        ph2 = st["imd_phase"][:, 1:2] + w2 * n
        two_tone = 0.5 * (jnp.sin(ph1) + jnp.sin(ph2))
        st["imd_phase"] = jnp.stack(
            [jnp.mod(ph1[:, -1], TWO_PI), jnp.mod(ph2[:, -1], TWO_PI)],
            axis=-1)
        a = jnp.where(is_imd, two_tone, a)
        # phase rotator first, like the WDSP TX graph (xphrot right after
        # the mic panel, TXA.c:562) — disperses speech phase to cut the
        # peak-to-average ratio before any clipping stage
        if self.phrot is not None:
            st["phrot"], a = self.phrot(st["phrot"], a)
        if self.preemph is not None:
            st["preemph"], a = self.preemph(st["preemph"], a)
        if self.comp is not None:
            _, a = self.comp((), a)

        # SSB/CW-style: analytic bandpass of the (real) audio -> one-sided IQ
        st["analytic"], z = self.analytic(
            st["analytic"], a.astype(jnp.complex64))
        m = self.mode[:, None]
        # CW: the "audio" input is the key envelope (shape it with
        # quisk_tpu.app.cw.KeyEnvelope for click-free 5 ms edges); TX is
        # the keyed carrier at the TX center frequency
        is_cw = (m == int(Mode.CWU)) | (m == int(Mode.CWL))
        iq_cw = audio.astype(jnp.complex64)
        lower = ((m == int(Mode.LSB)) | (m == int(Mode.CWL))
                 | (m == int(Mode.DGT_L)) | (m == int(Mode.FDV_L)))
        iq_ssb = jnp.where(lower, jnp.conj(z), z)

        # AM: carrier + audio envelope (uses the bandpassed real audio)
        env = self.am_carrier + (1.0 - self.am_carrier) * jnp.real(z)
        iq_am = env.astype(jnp.complex64)

        # FM: phase-modulate the bandpassed audio (memoryless, == FM with
        # 6 dB/oct preemphasis), add the CTCSS tone at 15% of total
        # deviation (microphone.c:1245-1258)
        n = jnp.arange(self.block, dtype=jnp.float32)[None, :] + 1.0
        ct = st["ctcss_phase"][:, None] + self.ctcss_word * n
        total = self.pm_gain * jnp.real(z) + self.ctcss_amp * jnp.sin(ct)
        import jax
        iq_fm = jax.lax.complex(jnp.cos(total), jnp.sin(total))
        st["ctcss_phase"] = jnp.mod(ct[:, -1], TWO_PI)

        is_am = m == int(Mode.AM)
        is_fm = m == int(Mode.FM)
        iq = jnp.where(is_am, iq_am, jnp.where(is_fm, iq_fm,
                                               jnp.where(is_cw, iq_cw,
                                                         iq_ssb)))
        # ALC runs on the modulated samples (microphone.c:1233/1240/1261:
        # process_alc(cSamples) after each modulator)
        if self.alc is not None:
            st["alc"], iq = self.alc(st["alc"], iq)

        if self.cessb is not None:
            # overshoot control applies to the SSB envelope path only
            st["cessb"], iq_c = self.cessb(st["cessb"], iq)
            iq = jnp.where(is_am | is_fm, iq, iq_c)
        if self.predist is not None:
            _, iq = self.predist((), iq)

        if self.interp is not None:
            st["interp"], iq = self.interp(st["interp"], iq)
        # Spot: replace the output with a plain tuning carrier when set
        # (microphone.c:1218 transmit_mic_carrier at the full TX rate)
        iq = jnp.where(self.spot >= 0.0,
                       self.spot.astype(jnp.complex64), iq)
        # TX baseband tune (sound.c:708/1118): rotate the outgoing IQ up
        # to the TX offset.  The RX front end mixes DOWN by x*conj(z)
        # (ops/nco.py), so multiplying by z places the signal at +f where
        # the RX tuned to +f recovers it; the spot carrier rides the same
        # rotation, appearing at the TX frequency like the reference's
        # tuneVector carrier.  word==0 is an exact identity.
        st["tune_phase"], ztune = self.tune.phasor(st["tune_phase"])
        iq = iq * ztune
        # last: TX I/Q balance trim at the device boundary (sound.c:735)
        m00, m10, m11 = self.trim
        re, im = jnp.real(iq), jnp.imag(iq)
        iq = jnp.asarray(m00 * re + 1j * (m10 * re + m11 * im), iq.dtype)
        return st, iq

    def set_ctcss(self, tone_hz: float, deviation_hz: float,
                  band_hi: float) -> "TxChain":
        """Retune/enable/disable the CTCSS tone — data only (the
        reference's QS.set_ctcss on FM-repeater key-down, quisk.py:6684;
        scaling per microphone.c:1242-1262, see create())."""
        beta = deviation_hz / band_hi
        if tone_hz > 9.0:
            pm_gain, ct_amp = 2.0 * 0.85 * beta, 0.15 * deviation_hz / tone_hz
        else:
            pm_gain, ct_amp = 2.0 * beta, 0.0
        return self.replace(
            pm_gain=jnp.float32(pm_gain),
            ctcss_word=jnp.float32(TWO_PI * tone_hz / self.audio_rate),
            ctcss_amp=jnp.float32(ct_amp))

    def set_tune(self, offset_hz, channel=None) -> "TxChain":
        """New chain transmitting at ``offset_hz`` from the hardware TX
        center (sound.c:708: tx_mic_phase from quisk_tx_tune_freq; set by
        QS.set_tune with the VFO-relative txFreq, quisk.py:5781) — pure
        data: the uint32 NCO word swap never recompiles."""
        from quisk_tpu.ops.nco import freq_word
        rate = self.audio_rate * (self.block_tx / self.block)
        if channel is None:
            word = freq_word(np.full(self.channels, float(offset_hz)), rate)
        else:
            word = self.tune.word.at[channel].set(
                freq_word(float(offset_hz), rate)[0])
        return self.replace(tune=self.tune.replace(word=word))

    def set_spot(self, level: float, channel=None) -> "TxChain":
        """Spot button (microphone.c:1218): ``level`` 0..1 transmits a
        plain carrier at that amplitude; negative turns Spot off."""
        if channel is None:
            spot = jnp.full((self.channels, 1), float(level), jnp.float32)
        else:
            spot = self.spot.at[channel, 0].set(float(level))
        return self.replace(spot=spot)

    def set_ampl_phase(self, ampl: float, phase_deg: float,
                       channel=None) -> "TxChain":
        """New chain with the TX I/Q balance trim (the is_tx=1 arm of
        quisk_set_ampl_phase, sound.c:1565-1581) — data only."""
        from quisk_tpu.rx.frontend import balance_matrix
        m00, m10, m11 = balance_matrix(ampl, phase_deg, invert=False)
        if channel is None:
            C = self.channels
            trim = (jnp.full((C, 1), m00, jnp.float32),
                    jnp.full((C, 1), m10, jnp.float32),
                    jnp.full((C, 1), m11, jnp.float32))
        else:
            trim = (self.trim[0].at[channel, 0].set(m00),
                    self.trim[1].at[channel, 0].set(m10),
                    self.trim[2].at[channel, 0].set(m11))
        return self.replace(trim=trim)
