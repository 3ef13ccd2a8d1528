"""End-to-end featured chain: every optional RX stage enabled at once.

Pins the composition the bench calls the "featured chain" (noise blanker
on raw IQ -> auto-notch -> ANF -> NR2 -> squelches) against a realistic
scene: SSB voice + in-passband tone interferer + broadband impulses +
white noise.  The individual ops have their own conformance tests; this
asserts they still work THROUGH the composed RxChain (stage order
quisk.c:2289) and that the feature set actually beats the plain chain.
"""

import numpy as np
import jax.numpy as jnp

from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 192000.0
NBLK = 12


def _scene(n: int):
    rng = np.random.default_rng(7)
    voice = sources.voice_like(48000.0, n // 4)
    voice = np.repeat(voice, 4)[:n]                 # envelope at 192 k
    iq = sources.ssb_signal(voice, FS, carrier_hz=30000.0)
    t = np.arange(n) / FS
    iq = iq + 0.8 * np.exp(2j * np.pi * 31500.0 * t)   # tone 1.5 kHz in-band
    imp = np.zeros(n, np.complex64)
    for p in rng.integers(0, n - 4, 60):
        imp[p: p + 4] += 25.0 * (1 + 1j)
    noise = 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return (iq + imp + noise).astype(np.complex64)


def _run(chain, iq):
    st = chain.init_state()
    outs = []
    for i in range(NBLK):
        st, a = chain.step(
            st, jnp.asarray(iq[None, i * chain.block_in:
                               (i + 1) * chain.block_in]))
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=-1)[0]


def _tone_to_voice_db(seg):
    F = np.fft.rfftfreq(len(seg), 1 / 48000.0)
    P = np.abs(np.fft.rfft(seg)) ** 2
    tone = P[(F > 1400) & (F < 1600)].sum()
    voice = (P[(F > 300) & (F < 1300)].sum()
             + P[(F > 1700) & (F < 2700)].sum())
    return 10 * np.log10(tone / voice)


def test_featured_chain_beats_plain_chain():
    featured = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, audio_block=2048,
                      agc=True, noise_blanker=2, auto_notch=True, nr=True),
        tune_hz=30000.0, mode=int(Mode.USB))
    plain = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=1, audio_block=2048,
                      agc=True),
        tune_hz=30000.0, mode=int(Mode.USB))
    iq = _scene(NBLK * featured.block_in)

    a_feat = _run(featured, iq)
    a_plain = _run(plain, iq)
    half = len(a_feat) // 2
    r_feat = _tone_to_voice_db(a_feat[half:])
    r_plain = _tone_to_voice_db(a_plain[half:])

    assert np.isfinite(a_feat).all()
    assert np.std(a_feat[half:]) > 0.01           # voice survives
    # the auto-notch must crush the interferer relative to the plain chain
    assert r_feat < r_plain - 10.0, (r_feat, r_plain)
    assert r_feat < -10.0, r_feat


def test_featured_chain_all_stages_run():
    """Every flag on at once (incl. ANF + squelches): finite, shaped, and
    streaming (state round-trips through repeated steps)."""
    chain = RxChain.create(
        RxChainConfig(sample_rate=FS, channels=2, audio_block=2048,
                      agc=True, noise_blanker=2, auto_notch=True, nr=True,
                      anf=True, squelch=True, fm_squelch=True),
        tune_hz=[30000.0, -20000.0], mode=[int(Mode.USB), int(Mode.FM)])
    iq = _scene(4 * chain.block_in)
    st = chain.init_state()
    for i in range(4):
        st, a = chain.step(
            st, jnp.asarray(np.stack([
                iq[i * chain.block_in:(i + 1) * chain.block_in]] * 2)))
        assert a.shape == (2, chain.block_audio)
        assert np.isfinite(np.asarray(a)).all()
