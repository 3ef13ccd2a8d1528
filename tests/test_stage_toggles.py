"""Runtime DSP stage toggles as data (the reference's NB/Notch/NR2/AGC/
Sqlch main-screen buttons, quisk.py:4917-4960): switching a stage off is
an exact pass-through — samplewise equal to a chain built without the
stage — and toggling reuses the compiled program (no recompile)."""

import numpy as np
import pytest

from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 48000.0
C = 2


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    voice = sources.voice_like(FS, n, band=(300.0, 2400.0))
    voice *= 0.4 / np.abs(voice).max()
    iq = sources.ssb_signal(voice, FS, carrier_hz=7000.0)
    iq = iq + 0.02 * (rng.standard_normal(n)
                      + 1j * rng.standard_normal(n))
    return np.broadcast_to(iq.astype(np.complex64), (C, n))


def _run(chain, x):
    st = chain.init_state()
    outs = []
    B = chain.block_in
    for k in range(x.shape[-1] // B):
        st, a = chain.step(st, x[:, k * B:(k + 1) * B])
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("stage,flag", [
    ("nb", dict(noise_blanker=2)),
    ("notch", dict(auto_notch=True)),
    ("nr", dict(nr=True)),
    ("anf", dict(anf=True)),
    ("agc", dict(agc=True)),
    ("squelch", dict(squelch=True)),
])
def test_stage_off_equals_chain_without_stage(stage, flag):
    base = dict(sample_rate=FS, channels=C, audio_block=1024, agc=False)
    base_no_agc = dict(base)
    cfg_with = RxChainConfig(**{**base, **flag})
    if stage == "agc":
        cfg_without = RxChainConfig(**{**base_no_agc, "agc": False})
    else:
        cfg_without = RxChainConfig(**base_no_agc)
    with_stage = RxChain.create(cfg_with, tune_hz=7000.0,
                                mode=int(Mode.USB))
    without = RxChain.create(cfg_without, tune_hz=7000.0,
                             mode=int(Mode.USB))
    off = with_stage.set_stage(stage, False)
    n = 6 * with_stage.block_in
    x = _sig(n)
    a_off = _run(off, x)
    a_without = _run(without, x)
    assert np.allclose(a_off, a_without, atol=1e-6), stage
    # and ON differs (the stage actually does something on this signal)
    a_on = _run(with_stage, x)
    assert not np.allclose(a_on, a_without, atol=1e-6), stage


def test_toggle_reuses_compiled_program():
    import jax

    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=1024,
                        agc=True, nr=True)
    chain = RxChain.create(cfg, tune_hz=7000.0, mode=int(Mode.USB))
    step = jax.jit(lambda ch, st, xx: ch.step(st, xx))
    x = _sig(2 * chain.block_in)[:, :chain.block_in]
    st = chain.init_state()
    step(chain, st, x)
    n0 = step._cache_size()
    for on in (False, True, False):
        chain = chain.set_stage("nr", on).set_stage("agc", not on)
        step(chain, st, x)
    assert step._cache_size() == n0     # data-only: no retrace


def test_per_channel_toggle_and_nb_level():
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=1024,
                        agc=True, noise_blanker=1)
    chain = RxChain.create(cfg, tune_hz=7000.0, mode=int(Mode.USB))
    # channel 1 AGC off, channel 0 on
    chain2 = chain.set_stage("agc", False, channel=1)
    x = _sig(4 * chain.block_in)
    a = _run(chain, x)
    b = _run(chain2, x)
    assert np.allclose(a[0], b[0], atol=1e-7)        # ch 0 untouched
    assert not np.allclose(a[1], b[1], atol=1e-6)    # ch 1 un-AGC'd
    # NB level is data (limits 6.0/4.0/2.5, quisk.c:716-727)
    assert float(chain.nb.limit) == 6.0
    l3 = chain.set_nb_level(3)
    assert float(l3.nb.limit) == 2.5
    assert chain.stage_on("nb") and l3.stage_on("nb")


def test_radio_stage_buttons_and_webui():
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.app.webui import WebUIServer
    from quisk_tpu.hw.base import Hardware

    class HW(Hardware):
        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=True,
                          nr=True, auto_notch=True), hardware=HW())
    assert r.stage_states() == {"notch": True, "nr": True, "agc": True}
    srv = WebUIServer(r)
    srv.on_command('{"cmd":"stage","name":"nr","on":false}')
    assert r.stage_states()["nr"] is False
    st = srv.state_dict()
    assert st["stages"]["nr"] is False and st["stages"]["agc"] is True
    # unknown stage is dropped, socket survives
    srv.on_command('{"cmd":"stage","name":"bogus","on":true}')
    # widget panel grew the stage buttons
    names = [w["name"] for w in st["widgets"]]
    assert "NR2" in names and "Notch" in names and "AGC" in names


def test_level_sliders_are_data():
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.hw.base import Hardware

    class HW(Hardware):
        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=True,
                          squelch=True, squelch_threshold=1.2),
              hardware=HW())
    r.set_squelch_level(2.5)
    assert float(r.chain.squelch.threshold) == 2.5
    r.set_agc_level(max_gain_db=40.0, target=0.5)
    assert abs(float(r.chain.agc.max_lgain)
               - 40.0 * np.log(10.0) / 20.0) < 1e-6
    assert float(r.chain.agc.target) == 0.5
    r.enable_tx()
    r.set_fdx(True)
    assert r.tx_monitor
    r.set_sidetone(0.7)
    assert r.sidetone.level == 0.7
    # fm-squelch-only chain routes the same slider to threshold_db
    r2 = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False,
                           fm_squelch=True, mode="FM"), hardware=HW())
    r2.set_squelch_level(-50.0)
    assert float(r2.chain.fm_sq.threshold_db) == -50.0
    import pytest as _p
    r3 = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
               hardware=HW())
    with _p.raises(KeyError):
        r3.set_squelch_level(1.0)


def test_set_bandwidth_narrows_filter_live():
    """The filter-button row (quisk.py:5095): live per-channel width
    change, data-only; a 2.2 kHz audio tone inside the default USB
    passband disappears when the width narrows to 1.5 kHz."""
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.hw.base import Hardware
    from quisk_tpu.io import sources

    class HW(Hardware):
        def __init__(self):
            super().__init__()
            self.t = 0

        def read_samples(self, n):
            iq = 0.3 * np.exp(2j * np.pi * 9200.0
                              * (np.arange(n) + self.t) / FS)
            self.t += n
            return iq[None].astype(np.complex64)

    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7000.0, agc=False),
              hardware=HW())

    def tone_rms(blocks=6):
        a = np.concatenate([np.asarray(r.run_once())[0]
                            for _ in range(blocks)])
        return float(np.sqrt(np.mean(a[-4096:] ** 2)))

    wide = tone_rms()                       # 2.2 kHz audio in 2.8k default
    r.set_bandwidth(1500.0)                 # passband now 300..1800
    narrow = tone_rms()
    assert wide > 0.05 and narrow < wide * 0.02, (wide, narrow)
    r.set_bandwidth(None)                   # restore the mode default
    assert tone_rms() > 0.05
