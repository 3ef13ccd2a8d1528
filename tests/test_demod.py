"""Demodulators vs oracle + semantic audio-recovery checks."""

import numpy as np

from quisk_tpu.modes import Mode
from quisk_tpu.io import sources
from quisk_tpu.ops import design
from quisk_tpu.ops.demod import AMDemod, FMDemod, MixedDemod, SSBDemod
from quisk_tpu.ops.fir import OverlapSaveFIR
from quisk_tpu.oracle import dsp

FS = 48000.0
B = 2048


def _blocks(x, b=B):
    n = len(x) // b
    return x[: n * b].reshape(1, n, b)


def _stream(op, x2d):
    st = op.init_state(x2d.shape[0])
    outs = []
    nblk = x2d.shape[1] // B
    for i in range(nblk):
        st, y = op(st, x2d[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_ssb_demod_recovers_audio():
    audio = sources.voice_like(FS, 8 * B)
    iq = sources.ssb_signal(audio, FS).astype(np.complex64)
    # analytic bandpass selecting USB, then Re
    taps = design.bandpass_analytic(1025, 100.0, 3000.0, FS)
    bp = OverlapSaveFIR.create(taps, B)
    y = _stream(bp, iq[None, :])
    dem = SSBDemod.create(gain=1.0)  # hilbert analytic already has 2x energy
    _, a = dem((), y)
    a = np.asarray(a)[0]
    # For analytic input z and analytic filter h, Re(z*h) == audio * 2Re(h):
    # the exact expected audio is the voice convolved with the equivalent
    # real bandpass.  Transition-band energy outside the filter is not error.
    _, ref = dsp.fir_stream(audio, 2.0 * np.real(taps))
    snr = dsp.snr_db(ref, a, skip=2 * B)
    assert snr > 55, snr
    # and it still resembles the raw audio (loose semantic check)
    assert dsp.align_and_snr(audio, a, max_lag=1024, skip=2 * B) > 14


def test_am_demod_matches_oracle_and_recovers():
    audio = sources.voice_like(FS, 8 * B)
    audio = audio / np.max(np.abs(audio))   # AM depth is peak-relative
    iq = sources.am_signal(audio, FS, depth=0.5).astype(np.complex64)
    dem = AMDemod.create(gain=1.0)
    st = dem.init_state(1)
    st, a = dem(st, iq[None, :])
    a = np.asarray(a)[0]
    ref = dsp.am_demod(iq.astype(np.complex128), gain=1.0)
    assert dsp.snr_db(ref, a, skip=100) > 60
    snr = dsp.align_and_snr(audio, a, max_lag=4, skip=2 * B)
    assert snr > 25, snr


def test_fm_demod_matches_oracle_and_recovers():
    audio = sources.voice_like(FS, 8 * B)
    iq = sources.fm_signal(audio, FS, deviation_hz=5000.0).astype(np.complex64)
    dem = FMDemod.create(FS, deviation_hz=5000.0)
    y = _stream_fm(dem, iq)
    ref = dsp.fm_demod(iq.astype(np.complex128), FS, 5000.0)
    assert dsp.snr_db(ref, y, skip=100) > 60
    # semantically, output == de-emphasized audio (disc gain maps deviation
    # to unit audio, then the 300 Hz one-pole)
    a_de = dsp.one_pole(audio, np.exp(-2 * np.pi * 300.0 / FS),
                        1 - np.exp(-2 * np.pi * 300.0 / FS))
    snr = dsp.align_and_snr(a_de, y, max_lag=4, skip=2 * B)
    assert snr > 40, snr


def _stream_fm(dem, iq):
    st = dem.init_state(1)
    outs = []
    for i in range(len(iq) // B):
        st, a = dem(st, iq[None, i * B:(i + 1) * B])
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=-1)[0]


def test_mixed_demod_selects_per_channel():
    audio = sources.voice_like(FS, 4 * B)
    iq_ssb = sources.ssb_signal(audio, FS)
    iq_am = sources.am_signal(audio, FS, depth=0.5)
    iq_fm = sources.fm_signal(audio, FS, 5000.0)
    x = np.stack([iq_ssb, iq_am, iq_fm]).astype(np.complex64)
    modes = [int(Mode.USB), int(Mode.AM), int(Mode.FM)]
    dem = MixedDemod.create(modes, FS, channels=3)
    st = dem.init_state(3)
    st, a = dem(st, x)
    a = np.asarray(a)

    ssb_ref = dsp.ssb_demod(iq_ssb)
    am_ref = dsp.am_demod(iq_am)
    fm_ref = dsp.fm_demod(iq_fm, FS, 5000.0)
    assert dsp.snr_db(ssb_ref, a[0], skip=64) > 60
    assert dsp.snr_db(am_ref, a[1], skip=64) > 60
    assert dsp.snr_db(fm_ref, a[2], skip=64) > 60


def test_grouped_demod_matches_mixed():
    """GroupedDemod on contiguous mode runs == MixedDemod masks,
    streaming state included."""
    import jax.numpy as jnp
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.demod import GroupedDemod, MixedDemod

    C, B = 16, 1024
    modes = ([int(Mode.USB)] * 4 + [int(Mode.AM)] * 4
             + [int(Mode.FM)] * 4 + [int(Mode.LSB)] * 4)
    g = GroupedDemod.create(modes, 96000.0, C)
    m = MixedDemod.create(modes, 96000.0, C)
    rng = np.random.default_rng(5)
    sg, sm = g.init_state(C), m.init_state(C)
    for _ in range(3):
        x = jnp.asarray((rng.standard_normal((C, B))
                         + 1j * rng.standard_normal((C, B))
                         ).astype(np.complex64))
        sg, yg = g(sg, x)
        sm, ym = m(sm, x)
        assert np.max(np.abs(np.asarray(yg) - np.asarray(ym))) < 1e-5
