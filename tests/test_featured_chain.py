"""End-to-end featured chain: every optional RX stage enabled at once.

Pins the composition the bench calls the "featured chain" (noise blanker
on raw IQ -> auto-notch -> ANF -> NR2 -> squelches) against a realistic
scene: SSB voice + in-passband tone interferer + broadband impulses +
white noise.  The individual ops have their own conformance tests; this
asserts they still work THROUGH the composed RxChain (stage order
quisk.c:2289) and that the feature set actually beats the plain chain.
"""

import numpy as np
import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_featured_chain_sharded_matches_unsharded():
    # every optional stage (NB, auto-notch, ANF, NR2, squelches) under
    # channel sharding on the 8-device mesh must reproduce the unsharded
    # chain — the STFT/FDAF/banded-matmul internals all ride the time
    # axis, so the channel mesh cannot change the math
    import jax

    from quisk_tpu.parallel import make_mesh, shard_over_channels
    from quisk_tpu.parallel.multihost import make_global_iq

    FS = 192000.0
    C, nblk = 16, 3
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=512,
                        agc=True, noise_blanker=2, auto_notch=True,
                        nr=True, anf=True, squelch=True, fm_squelch=True)
    modes = [int(Mode.USB), int(Mode.AM), int(Mode.FM), int(Mode.LSB)]
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C))
                      for i in range(C)],
        mode=[modes[i % 4] for i in range(C)])
    # real modulated stations, not raw noise: on pure noise the AGC's
    # clip detection and the squelch gates flip on one-ULP fusion
    # differences between the sharded and unsharded programs (binary
    # decisions amplify ~1e-7 into ~1e-2); with actual signals every
    # decision is far from threshold and the runs agree tightly
    n = nblk * chain.block_in
    tunes = np.asarray(chain.tune_base)
    mvec = np.asarray(chain.demod.mode)
    iq = np.stack([sources.station_iq(mvec[c], FS, n, float(tunes[c]),
                                      seed=c) for c in range(C)])
    rng = np.random.default_rng(11)
    iq = (iq + 0.001 * (rng.standard_normal(iq.shape)
                        + 1j * rng.standard_normal(iq.shape))
          ).astype(np.complex64)

    st = chain.init_state()
    ref = []
    for i in range(nblk):
        st, a = chain.step(st, jnp.asarray(
            iq[:, i * chain.block_in:(i + 1) * chain.block_in]))
        ref.append(np.asarray(a))
    ref = np.concatenate(ref, axis=-1)

    mesh = make_mesh()
    chain_s = shard_over_channels(chain, mesh, C)
    state_s = shard_over_channels(chain.init_state(), mesh, C)

    @jax.jit
    def step(ch, s, xx):
        return ch.step(s, xx)

    outs = []
    for i in range(nblk):
        x = make_global_iq(np.ascontiguousarray(
            iq[:, i * chain.block_in:(i + 1) * chain.block_in]), mesh)
        state_s, a = step(chain_s, state_s, x)
        outs.append(np.asarray(a))
    got = np.concatenate(outs, axis=-1)
    # Steady state (first audio block skipped: filter histories are
    # filling and FM sees near-zero amplitude there).  Non-FM channels
    # must agree samplewise.  FM channels CANNOT be asserted samplewise:
    # during warm-up the discriminator is noise-dominated, one-ULP
    # fusion differences between the two compiled programs pick
    # different +-2pi branches (CLAUDE.md FM note), and the adaptive
    # stages (ANF/NR) seed their state from that chaos and carry it
    # forward — two equally valid executions.  Assert behavioral
    # equivalence (RMS) for FM instead.
    B = chain.block_audio
    g2, r2 = got[:, B:], ref[:, B:]
    fm = np.asarray(chain.demod.mode) == int(Mode.FM)
    scale = np.abs(r2).max() + 1e-12
    err = np.abs(g2[~fm] - r2[~fm]).max() / scale
    assert err < 1e-3, err
    assert np.all(np.isfinite(g2))
    rms_ratio = np.sqrt((g2[fm] ** 2).mean() / (r2[fm] ** 2).mean())
    assert 0.85 < rms_ratio < 1.15, rms_ratio
