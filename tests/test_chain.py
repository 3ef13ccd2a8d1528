"""End-to-end RX chain: planner + full pipelines at reference rate configs.

These mirror BASELINE.json configs 1-3: 48 k SSB, 960 k -> 48 k decimate+SSB,
192 k NFM.
"""

from fractions import Fraction

import numpy as np
import pytest

from quisk_tpu.modes import Mode
from quisk_tpu.io import sources
from quisk_tpu.oracle import dsp
from quisk_tpu.rx import RxChain, RxChainConfig, plan_decimation
from quisk_tpu.rx.planner import plan_block_sizes


# ------------------------------------------------------------------ planner
def test_planner_integer_rates():
    p = plan_decimation(960000.0)
    assert p.frac is None and p.int_decim == 20 and p.fs_out == 48000.0
    assert sorted(p.stages) == [2, 2, 5]
    p = plan_decimation(192000.0)
    assert p.stages == (2, 2) and p.frac is None
    p = plan_decimation(48000.0)
    assert p.stages == () and p.frac is None


def test_planner_fractional_rates():
    p = plan_decimation(50000.0)   # reference's 24/25 case (quisk.c:1658)
    assert p.int_decim == 1 and p.frac == Fraction(25, 24)
    p = plan_decimation(1333333.0)  # SDR-IQ max rate (reference uses /24)
    assert p.int_decim == 27        # planner finds the larger 3^3 divisor
    assert abs(p.fs_out - 48000.0) / 48000.0 < 1e-3
    blocks = plan_block_sizes(p, 2048)
    assert blocks["input"] % p.int_decim == 0


@pytest.mark.parametrize("fs", [48000., 50000., 96000., 111111., 192000.,
                                240000., 370370., 480000., 960000., 1333333.])
def test_planner_all_reference_rates(fs):
    p = plan_decimation(fs)
    assert abs(p.fs_out - 48000.0) / 48000.0 < 2e-3
    blocks = plan_block_sizes(p, 2048)
    assert blocks["input"] == blocks["mid"] * p.int_decim


# ------------------------------------------------------------ config 1: SSB
def test_chain_ssb_48k():
    fs = 48000.0
    cfg = RxChainConfig(sample_rate=fs, channels=2, agc=False)
    chain = RxChain.create(cfg, tune_hz=[7000.0, -5000.0],
                           mode=[int(Mode.USB), int(Mode.LSB)])
    n = 8 * chain.block_in
    voice = sources.voice_like(fs, n)
    iq = (sources.ssb_signal(voice, fs, carrier_hz=7000.0)
          + sources.ssb_signal(voice, fs, carrier_hz=-5000.0, lower=True))
    x = np.broadcast_to(iq.astype(np.complex64), (2, n))
    st = chain.init_state()
    st, audio = chain.process(st, x)
    audio = np.asarray(audio)
    for c in range(2):
        snr = dsp.align_and_snr(voice, audio[c], max_lag=1024,
                                skip=2 * chain.block_audio)
        assert snr > 14, (c, snr)   # voice band wider than SSB filter


# --------------------------------------------- config 2: 960 k -> 48 k SSB
def test_chain_wideband_decimate_ssb():
    fs = 960000.0
    cfg = RxChainConfig(sample_rate=fs, channels=1, agc=False)
    chain = RxChain.create(cfg, tune_hz=[123456.0], mode=int(Mode.USB))
    assert chain.block_in == 20 * chain.block_audio
    n48 = 16 * chain.block_audio
    # strictly band-limited voice inside the USB filter (steep FIR edges)
    from scipy import signal as sig
    from quisk_tpu.ops import design
    raw = sources.voice_like(48000.0, n48, band=(500.0, 2300.0), seed=5)
    steep = design.kaiser_lowpass(2500.0, 48000.0, atten_db=100.0)
    voice48 = np.convolve(raw - np.mean(raw), steep, mode="same")
    voice960 = sig.resample_poly(voice48, 20, 1)
    iq = sources.ssb_signal(voice960, fs, carrier_hz=123456.0)
    iq = sources.awgn(iq, 40.0).astype(np.complex64)[None]
    st = chain.init_state()
    st, audio = chain.process(st, iq)
    audio = np.asarray(audio)[0]
    snr = dsp.frac_align_snr(voice48[: len(audio)], audio,
                             skip=4 * chain.block_audio)
    assert snr > 38, snr   # ~53 dB clean; noise at 40 dB leaves margin


# ------------------------------------------------------- config 3: 192k NFM
def test_chain_nfm_192k():
    fs = 192000.0
    # standard NFM pairing: 2.5 kHz deviation in a 12.5 kHz channel (Carson)
    cfg = RxChainConfig(sample_rate=fs, channels=1, agc=False,
                        fm_deviation_hz=2500.0)
    chain = RxChain.create(cfg, tune_hz=[50000.0], mode=int(Mode.FM))
    n = 8 * chain.block_in
    voice = sources.voice_like(fs, n, band=(300.0, 2700.0), seed=9)
    iq = sources.fm_signal(voice, fs, deviation_hz=2500.0, carrier_hz=50000.0)
    iq = sources.awgn(iq, 30.0).astype(np.complex64)[None]
    st = chain.init_state()
    st, audio = chain.process(st, iq)
    audio = np.asarray(audio)[0]
    # compare against de-emphasized voice at 48 k
    from scipy import signal as sig
    a = np.exp(-2 * np.pi * 300.0 / 48000.0)
    ref = dsp.one_pole(sig.resample_poly(voice, 1, 4), a, 1 - a)
    snr = dsp.frac_align_snr(ref, audio, skip=4 * chain.block_audio)
    assert snr > 20, snr   # ~29 dB clean; FM truncation + 30 dB CNR noise


# ------------------------------------------------------ streaming invariance
def test_chain_step_equals_process():
    fs = 192000.0
    cfg = RxChainConfig(sample_rate=fs, channels=1, agc=True)
    chain = RxChain.create(cfg, tune_hz=[10000.0], mode=int(Mode.USB))
    rng = np.random.default_rng(3)
    n = 3 * chain.block_in
    iq = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
          ).astype(np.complex64)
    st = chain.init_state()
    st, a_scan = chain.process(st, iq)
    st2 = chain.init_state()
    outs = []
    for i in range(3):
        st2, a = chain.step(st2, iq[:, i * chain.block_in:(i + 1) * chain.block_in])
        outs.append(np.asarray(a))
    a_steps = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(a_scan), a_steps, atol=1e-5)


@pytest.mark.slow
def test_step_blocks_matches_sequential_steps():
    """step_blocks (multi-block single dispatch) must be bit-identical to
    successive step() calls — same carried state, concatenated audio."""
    import jax
    import numpy as np
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig

    cfg = RxChainConfig(sample_rate=192000.0, channels=4, audio_block=512)
    chain = RxChain.create(cfg, tune_hz=[1000.0, -2000.0, 0.0, 500.0],
                           mode=[int(Mode.USB), int(Mode.LSB),
                                 int(Mode.AM), int(Mode.FM)])
    rng = np.random.default_rng(7)
    N = 3
    xall = (rng.standard_normal((4, (N + 1) * chain.block_in))
            + 1j * rng.standard_normal((4, (N + 1) * chain.block_in))
            ).astype(np.complex64)
    # The FM channel gets a real FM signal, not raw noise, and both paths
    # start from a WARMED state (one block processed first): the FM
    # phase-difference discriminator is sign-unstable at the +/-pi
    # boundary, so demodulating noise or the filter ring-in transient
    # amplifies one-ULP kernel-fusion differences (eager step vs jitted
    # step_blocks) into +/-2pi output flips.  With a carrier and a warm
    # filter the phase increments stay far from the wrap and the two
    # paths agree to float32 roundoff.
    from quisk_tpu.io import sources
    audio_fm = sources.voice_like(192000.0, (N + 1) * chain.block_in)
    xall[3] = sources.fm_signal(audio_fm, 192000.0, deviation_hz=2500.0,
                                carrier_hz=500.0).astype(np.complex64)
    warm, x = xall[:, : chain.block_in], xall[:, chain.block_in:]
    st0, _ = chain.step(chain.init_state(), warm)

    st_a = st0
    outs = []
    for i in range(N):
        st_a, a = chain.step(
            st_a, x[:, i * chain.block_in:(i + 1) * chain.block_in])
        outs.append(np.asarray(a))
    seq = np.concatenate(outs, axis=-1)

    st_b, multi = jax.jit(chain.step_blocks, static_argnums=2)(st0, x, N)
    np.testing.assert_allclose(np.asarray(multi), seq, rtol=0, atol=1e-6)
    for la, lb in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=0, atol=1e-6)


@pytest.mark.parametrize("fs", [53000., 111111., 133333., 185185.,
                                370370., 740740., 1333333.])
@pytest.mark.slow
def test_chain_runs_at_sdriq_rates(fs):
    """End-to-end smoke at the reference's SDR-IQ family rates
    (quisk.c:1731-1768 hardcoded chains; here the planner generalizes):
    a USB tone 1 kHz above the tune lands at 1 kHz in the audio."""
    import jax.numpy as jnp

    cfg = RxChainConfig(sample_rate=fs, channels=1, agc=False,
                        audio_block=512)
    tune = fs / 8.0
    chain = RxChain.create(cfg, tune_hz=tune, mode=int(Mode.USB))
    n = 6 * chain.block_in
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * (tune + 1000.0) * t).astype(np.complex64)
    st = chain.init_state()
    outs = []
    nblk = n // chain.block_in
    for i in range(nblk):
        st, a = chain.step(st, jnp.asarray(
            iq[None, i * chain.block_in:(i + 1) * chain.block_in]))
        outs.append(np.asarray(a))
    audio = np.concatenate(outs, axis=-1)[0]
    seg = audio[len(audio) // 2:]
    F = np.fft.rfftfreq(len(seg), 1.0 / chain.fs_audio)
    P = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    pk = F[np.argmax(P)]
    assert abs(pk - 1000.0) < 30.0, (fs, pk)
    # the tone dominates: peak at least 20 dB over the median bin
    assert P.max() > 100 * np.median(P), fs
