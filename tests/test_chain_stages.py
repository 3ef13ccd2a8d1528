"""The optional RX chain stages (NB/notch/NR/ANF/squelch) wired end-to-end."""

import numpy as np
import pytest

from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 48000.0


def _run(chain, iq, nblk):
    st = chain.init_state()
    outs = []
    B = chain.block_in
    for i in range(nblk):
        st, a = chain.step(st, np.asarray(iq[:, i * B:(i + 1) * B],
                                          np.complex64))
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=-1)


def _ssb_capture(n, tone_audio_hz=0.0):
    voice = sources.voice_like(FS, n)
    if tone_audio_hz:
        voice = voice + 2.0 * np.sin(2 * np.pi * tone_audio_hz
                                     * np.arange(n) / FS)
    return sources.ssb_signal(voice, FS)[None]


@pytest.mark.slow
def test_full_stage_chain_runs_and_is_finite():
    cfg = RxChainConfig(sample_rate=FS, channels=2, audio_block=2048,
                        agc=True, noise_blanker=2, auto_notch=True,
                        nr=True, anf=True, squelch=True)
    chain = RxChain.create(cfg, tune_hz=0.0, mode=int(Mode.USB))
    iq = np.concatenate([_ssb_capture(16 * chain.block_in)] * 2, axis=0)
    audio = _run(chain, iq, 16)
    assert audio.shape == (2, 16 * chain.block_audio)
    assert np.all(np.isfinite(audio))
    assert np.sqrt(np.mean(audio[:, -4 * chain.block_audio:] ** 2)) > 1e-4


def test_anf_stage_removes_carrier_from_audio():
    n_in = 24 * 2048
    iq = _ssb_capture(n_in, tone_audio_hz=1500.0)
    base = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, audio_block=2048, agc=False),
        tune_hz=0.0, mode=int(Mode.USB))
    with_anf = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, audio_block=2048, agc=False,
                      anf=True),
        tune_hz=0.0, mode=int(Mode.USB))
    a0 = _run(base, iq, 24)[0]
    a1 = _run(with_anf, iq, 24)[0]
    seg = slice(16 * 2048, 24 * 2048)
    f = np.fft.rfftfreq(8 * 2048, 1 / FS)
    kt = np.argmin(np.abs(f - 1500.0))
    t0 = np.abs(np.fft.rfft(a0[seg]))[kt]
    t1 = np.abs(np.fft.rfft(a1[seg]))[kt]
    assert 20 * np.log10(t1 / t0) < -15.0


def test_squelch_stage_mutes_noise_only_channel():
    rng = np.random.default_rng(7)
    n_in = 16 * 2048
    noise = 0.05 * (rng.standard_normal(n_in)
                    + 1j * rng.standard_normal(n_in))
    cfg = RxChainConfig(sample_rate=FS, channels=1, audio_block=2048,
                        agc=False, squelch=True, squelch_threshold=1.2)
    chain = RxChain.create(cfg, tune_hz=0.0, mode=int(Mode.USB))
    audio = _run(chain, noise[None], 16)[0]
    tail = audio[-4 * chain.block_audio:]
    # noise-only input: squelch closes, audio muted
    assert np.sqrt(np.mean(tail ** 2)) < 1e-3


def test_nfm_chain_with_fm_squelch():
    """BASELINE config #3: 192k NFM -> decimate -> discriminator ->
    de-emphasis -> RF squelch -> audio."""
    from quisk_tpu.io import sources
    FS2 = 192000.0
    cfg = RxChainConfig(sample_rate=FS2, channels=1, audio_block=2048,
                        agc=False, fm_squelch=True, fm_squelch_db=-40.0)
    chain = RxChain.create(cfg, tune_hz=0.0, mode=int(Mode.FM))
    n_in = 24 * chain.block_in
    t48 = np.arange(n_in // 4) / 48000.0
    audio_t = 0.8 * np.sin(2 * np.pi * 1000.0 * t48)
    iq48 = sources.fm_signal(audio_t, deviation_hz=5000.0, fs=48000.0)
    iq = np.repeat(iq48, 4)[:n_in]          # crude 4x upsample: NFM is narrow
    # first half: carrier present; second half: noise only — the squelch
    # closes after its 0.2 s hold (5 audio blocks)
    rng = np.random.default_rng(3)
    noise = 1e-4 * (rng.standard_normal(n_in) + 1j * rng.standard_normal(n_in))
    x = np.where(np.arange(n_in) < n_in // 2, iq, 0.0) + noise
    audio = _run(chain, x[None].astype(np.complex64), 24)[0]
    Ba = chain.block_audio
    carrier_seg = audio[4 * Ba:7 * Ba]
    quiet_seg = audio[-3 * Ba:]
    assert np.sqrt(np.mean(carrier_seg ** 2)) > 0.05   # audio comes through
    assert np.sqrt(np.mean(quiet_seg ** 2)) < 1e-3     # squelch closed
