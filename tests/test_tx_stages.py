"""Optional TX stages (CESSB, predistorter slot) wired into TxChain."""

import numpy as np
import pytest

from quisk_tpu.modes import Mode
from quisk_tpu.io import sources
from quisk_tpu.tx import TxChain, TxChainConfig

FS = 48000.0


def test_tx_chain_with_cessb_bounds_envelope():
    tx = TxChain.create(TxChainConfig(channels=1, compress_db=14.0,
                                      cessb=True, alc=False),
                        mode=int(Mode.USB))
    n = 16 * tx.block
    voice = sources.voice_like(FS, n).astype(np.float32)
    voice = (2.5 * voice / np.max(np.abs(voice)))[None]
    st = tx.init_state()
    outs = []
    for i in range(16):
        st, iq = tx.step(st, voice[:, i * tx.block:(i + 1) * tx.block])
        outs.append(np.asarray(iq))
    iq = np.concatenate(outs, axis=-1)[0]
    env = np.abs(iq[4 * tx.block:])
    assert np.max(env) < 1.15, np.max(env)
    assert np.sqrt(np.mean(env ** 2)) > 0.05


def test_tx_chain_predistort_slot_identity():
    tx = TxChain.create(TxChainConfig(channels=1, predistort=True),
                        mode=int(Mode.USB))
    tx0 = TxChain.create(TxChainConfig(channels=1), mode=int(Mode.USB))
    n = 4 * tx.block
    voice = 0.3 * sources.voice_like(FS, n).astype(np.float32)[None]
    st, st0 = tx.init_state(), tx0.init_state()
    for i in range(4):
        blk = voice[:, i * tx.block:(i + 1) * tx.block]
        st, a = tx.step(st, blk)
        st0, b = tx0.step(st0, blk)
    # identity predistorter changes nothing
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ptt_vox_and_timeout():
    from quisk_tpu.tx.ptt import PttController, VoxControl
    FS_, B_ = 48000.0, 2048
    vox = VoxControl(FS_, B_, threshold=0.05, hold_secs=0.2)
    loud = 0.3 * np.ones(B_)
    quiet = 0.001 * np.ones(B_)
    assert vox.process(loud) is True
    hold = 0
    while vox.process(quiet):
        hold += 1
    assert 3 <= hold <= 6                    # ~0.2 s at 2048/48k blocks

    ptt = PttController(FS_, B_, max_tx_secs=0.2, repeater_hold_secs=0.1)
    # timeout forces TX off after ~5 blocks, latched until release
    on = [ptt.process(ptt=True) for _ in range(10)]
    assert on[0] and not on[-1]
    assert ptt.process(ptt=True) is False    # still latched
    ptt.process(ptt=False)                   # release clears the latch
    assert ptt.process(ptt=True) is True
    # tx_inhibit vetoes everything
    ptt2 = PttController(FS_, B_)
    ptt2.tx_inhibit = True
    assert ptt2.process(ptt=True, cw_key=True, vox=True) is False
    # repeater hold keeps TX up after key release
    ptt3 = PttController(FS_, B_, repeater_hold_secs=0.1)
    ptt3.process(ptt=True)
    tail = 0
    while ptt3.process(ptt=False):
        tail += 1
    assert 1 <= tail <= 4


def test_imd_mode_generates_two_tone():
    from quisk_tpu.tx.puresignal import two_tone_imd_db
    tx = TxChain.create(TxChainConfig(channels=1, alc=False),
                        mode=int(Mode.IMD))
    st = tx.init_state()
    outs = []
    silent = np.zeros((1, tx.block), np.float32)
    for _ in range(8):
        st, iq = tx.step(st, silent)         # mic ignored in IMD mode
        outs.append(np.asarray(iq))
    iq = np.concatenate(outs, axis=-1)[0][2 * tx.block:]
    S = np.abs(np.fft.fft(iq * np.hanning(len(iq))))
    f = np.fft.fftfreq(len(iq), 1 / 48000.0)
    k1 = np.argmin(np.abs(f - 700.0))
    k2 = np.argmin(np.abs(f - 1900.0))
    floor = np.median(S)
    assert S[k1 - 2:k1 + 3].max() > 100 * floor
    assert S[k2 - 2:k2 + 3].max() > 100 * floor


def test_cw_tx_keyed_carrier_is_click_free():
    from quisk_tpu.app.cw import KeyEnvelope, text_to_key_samples
    tx = TxChain.create(TxChainConfig(channels=1, alc=False),
                        mode=int(Mode.CWU))
    key = text_to_key_samples("paris", 25.0, FS)
    n = (len(key) // tx.block + 1) * tx.block
    key = np.resize(key, n)
    env = KeyEnvelope(FS, rise_ms=5.0).process(key)[None].astype(np.float32)
    st = tx.init_state()
    outs = []
    for i in range(n // tx.block):
        st, iq = tx.step(st, env[:, i * tx.block:(i + 1) * tx.block])
        outs.append(np.asarray(iq))
    iq = np.concatenate(outs, axis=-1)[0]
    # keyed envelope reproduced on the carrier
    assert np.max(np.abs(iq)) <= 1.01 and np.max(np.abs(iq)) > 0.9
    # click-free: keying sidebands beyond +-250 Hz are far below carrier
    S = np.abs(np.fft.fft(iq * np.hanning(len(iq)))) ** 2
    f = np.fft.fftfreq(len(iq), 1 / FS)
    carrier = S[np.abs(f) < 100.0].sum()
    splatter = S[np.abs(f) > 250.0].sum()
    assert 10 * np.log10(carrier / (splatter + 1e-12)) > 35.0


def test_dgt_tx_uses_wide_flat_filter():
    """Digital modes pass tones outside the voice band (tx_filter_digital
    parity): a 2900 Hz tone survives DGT_U but not USB."""
    t = np.arange(16 * 2048) / FS
    tone = (0.5 * np.sin(2 * np.pi * 2900.0 * t)).astype(np.float32)

    def run(mode):
        tx = TxChain.create(TxChainConfig(channels=1, alc=False),
                            mode=int(mode))
        st = tx.init_state()
        outs = []
        for i in range(16):
            st, iq = tx.step(st, tone[None, i * tx.block:(i + 1) * tx.block])
            outs.append(np.asarray(iq))
        return np.concatenate(outs, axis=-1)[0][8 * 2048:]

    p_dgt = np.mean(np.abs(run(Mode.DGT_U)) ** 2)
    p_usb = np.mean(np.abs(run(Mode.USB)) ** 2)
    assert p_dgt > 10.0 * p_usb, (p_dgt, p_usb)


def test_per_mode_tx_audio_settings_are_data():
    """txAudioClip*/txAudioPreemph* parity (quisk.py:3716, 5681-5695):
    per-mode clip/preemph settings apply as data (no shape change) and the
    0 settings are exact pass-throughs."""
    import numpy as np
    import jax
    from quisk_tpu.modes import Mode
    from quisk_tpu.tx import TxChain, TxChainConfig

    # alc off: its 20 ms lookahead would delay the first block to zeros
    tx = TxChain.create(TxChainConfig(channels=2, audio_block=2048,
                                      alc=False),
                        mode=[int(Mode.USB), int(Mode.USB)])
    rng = np.random.default_rng(3)
    a = (0.9 * rng.standard_normal((2, 2048))).astype(np.float32)

    _, iq0 = tx.step(tx.init_state(), a)
    tx_hot = tx.set_audio_settings(clip_db=[12.0, 0.0], preemph=[0.5, 0.0])
    # same pytree structure: stepping reuses the compiled program
    assert (jax.tree_util.tree_structure(tx)
            == jax.tree_util.tree_structure(tx_hot))
    _, iq1 = tx_hot.step(tx.init_state(), a)
    iq0, iq1 = np.asarray(iq0), np.asarray(iq1)
    # channel 1 kept the zero settings: bit-identical to the original
    np.testing.assert_array_equal(iq1[1], iq0[1])
    # channel 0 is processed differently (clipped + preemphasized)
    assert np.max(np.abs(iq1[0] - iq0[0])) > 1e-3


def test_radio_remembers_tx_audio_per_mode_family():
    import numpy as np
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio

    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=1000.0)
    r = Radio(cfg, hardware="sim")
    r.open()
    try:
        r.enable_tx(compress_db=3.0)
        # seeded from the config for every family
        assert r.tx_audio["Fm"]["clip_db"] == 3.0
        r.set_tx_audio(clip_db=15.0, preemph=0.6)      # USB family
        assert r.tx_audio["Usb"] == {"clip_db": 15.0, "preemph": 0.6}
        r.set_mode("FM")
        assert float(np.max(np.asarray(r.tx.comp.gain))) == pytest.approx(
            10 ** (3 / 20), rel=1e-6)
        r.set_mode("LSB")                              # back to Usb family
        assert float(np.max(np.asarray(r.tx.comp.gain))) == pytest.approx(
            10 ** (15 / 20), rel=1e-6)
        assert float(np.max(np.asarray(r.tx.preemph.c))) == pytest.approx(
            0.6, rel=1e-6)
    finally:
        r.close()


def test_spot_button_transmits_plain_carrier():
    # microphone.c:1218-1221: Spot >= 0 replaces TX output with a carrier
    # at level/1000 amplitude; data-only on/off, no recompile
    import jax
    import jax.numpy as jnp
    from quisk_tpu.tx.chain import TxChain, TxChainConfig

    fs, B = 48000.0, 2048
    tx = TxChain.create(TxChainConfig(channels=2, alc=False), mode=2)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, B)).astype(np.float32) * 0.3

    @jax.jit
    def step(ch, st, aa):
        return ch.step(st, aa)

    st = tx.init_state()
    _, iq_mod = step(tx, st, jnp.asarray(a))

    tx_spot = tx.set_spot(0.5)
    _, iq_spot = step(tx_spot, st, jnp.asarray(a))  # same compiled program
    assert np.allclose(np.asarray(iq_spot), 0.5 + 0.0j, atol=1e-6)
    assert not np.allclose(np.asarray(iq_mod), 0.5 + 0.0j, atol=1e-3)

    # per-channel: spot only channel 1
    tx_one = tx.set_spot(0.3, channel=1)
    _, iq_one = step(tx_one, st, jnp.asarray(a))
    got = np.asarray(iq_one)
    assert np.allclose(got[1], 0.3 + 0.0j, atol=1e-6)
    assert not np.allclose(got[0], 0.3 + 0.0j, atol=1e-3)
