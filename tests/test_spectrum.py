"""Spectrum analyzer: tone levels, S-meter, frequency measurement."""

import numpy as np

from quisk_tpu.io import sources
from quisk_tpu.ops.spectrum import SpectrumAnalyzer, measure_frequency

FS = 48000.0


def test_tone_reads_full_scale():
    B, F = 8192, 1024
    sa = SpectrumAnalyzer.create(F, B)
    x = sources.tone(6000.0, FS, B).astype(np.complex64)[None]
    st = sa.init_state(1)
    st, _ = sa.accumulate(st, x)
    db = np.asarray(sa.graph_db(st))[0]
    f = sa.freqs(FS)
    k = np.argmin(np.abs(f - 6000.0))
    assert abs(db[k]) < 1.0, db[k]          # 0 dBFS tone
    far = np.abs(f - 6000.0) > 2000.0
    assert db[far].max() < -80              # low leakage far away


def test_smeter_tone_power():
    B, F = 8192, 1024
    sa = SpectrumAnalyzer.create(F, B)
    amp = 0.5
    x = sources.tone(-3000.0, FS, 4 * B, amplitude=amp).astype(np.complex64)[None]
    st = sa.init_state(1)
    for i in range(4):
        st, _ = sa.accumulate(st, x[:, i * B:(i + 1) * B])
    p = float(np.asarray(sa.smeter_power(st, FS, -4000.0, -2000.0))[0])
    assert abs(10 * np.log10(p) - 10 * np.log10(amp ** 2)) < 0.5


def test_per_channel_smeter_bands():
    B, F = 4096, 512
    sa = SpectrumAnalyzer.create(F, B)
    x = np.stack([
        sources.tone(5000.0, FS, B),
        sources.tone(-8000.0, FS, B),
    ]).astype(np.complex64)
    st = sa.init_state(2)
    st, _ = sa.accumulate(st, x)
    p = np.asarray(sa.smeter_power(st, FS, [4000.0, -9000.0], [6000.0, -7000.0]))
    assert np.all(np.abs(10 * np.log10(p)) < 1.0)


def test_measure_frequency():
    x = np.stack([
        sources.tone(1234.5, FS, 4096),
        sources.tone(-7777.7, FS, 4096),
    ]).astype(np.complex64)
    f = np.asarray(measure_frequency(x, FS))
    assert abs(f[0] - 1234.5) < 2.0
    assert abs(f[1] + 7777.7) < 2.0


def test_window_choices_tone_level_and_smeter_correction():
    """Every analyzer window reads a full-scale tone at 0 dBFS on the
    graph AND 0 dB on the S-meter: the graph normalisation is the
    window's coherent gain, the S-meter divides by its ENBW — the
    per-window generalisation of the reference's fixed +4.26 dB Hann
    passband correction (quisk.c:5212, 5311; wdsp/analyzer.c windows)."""
    from quisk_tpu.ops.spectrum import make_window, _enbw_bins

    B, F = 8192, 1024
    for win in ("rect", "hann", "hamming", "blackman",
                "blackman-harris", "flat-top"):
        sa = SpectrumAnalyzer.create(F, B, window=win)
        # tone exactly on a bin center: coherent sum, no scalloping
        x = sources.tone(FS * 16 / F, FS, B).astype(np.complex64)[None]
        st = sa.init_state(1)
        st, _ = sa.accumulate(st, x)
        db = np.asarray(sa.graph_db(st))[0]
        assert abs(db.max()) < 0.1, (win, db.max())
        p = float(np.asarray(sa.smeter_power(st, FS, 0.0, 4000.0))[0])
        assert abs(10 * np.log10(p)) < 0.05, (win, 10 * np.log10(p))


def test_window_enbw_constants():
    from quisk_tpu.ops.spectrum import make_window, _enbw_bins

    assert abs(_enbw_bins(make_window("rect", 4096)) - 1.0) < 1e-9
    assert abs(_enbw_bins(make_window("hann", 4096)) - 1.5) < 1e-3
    # Hann ENBW correction is 10*log10(1.5) = 1.76 dB; the reference's
    # 4.26 dB constant additionally folds its display normalisation
    assert abs(_enbw_bins(make_window("blackman-harris", 4096)) - 2.0) < 0.05
    assert abs(_enbw_bins(make_window("flat-top", 4096)) - 3.77) < 0.05


def test_with_window_swaps_live_state_shapes():
    B, F = 4096, 512
    sa = SpectrumAnalyzer.create(F, B)                 # hann
    sb = sa.with_window("blackman-harris")
    # same pytree structure and shapes: the swap never recompiles
    import jax
    la, lb = jax.tree.leaves(sa), jax.tree.leaves(sb)
    assert [x.shape for x in la] == [x.shape for x in lb]
    x = sources.tone(3000.0, FS, B).astype(np.complex64)[None]
    st = sb.init_state(1)
    st, _ = sb.accumulate(st, x)
    assert abs(float(np.asarray(sb.graph_db(st))[0].max())) < 0.1


def test_graph_service_and_radio_window_switch(tmp_path):
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio

    cfg = RadioConfig(sample_rate=48000.0, tune_hz=10000.0,
                      graph_window="blackman-harris")
    r = Radio(cfg, hardware="sim", rigctl_port=None)
    r.hw.tone_hz = 10000.0
    r.hw.amplitude = 1.0
    r.open()
    try:
        r.run(blocks=r.graph.blocks_per_refresh + 1)
        s1 = r.smeter_db()
        assert abs(s1) < 0.5, s1              # full-scale tone, BH window
        r.set_graph_window("flat-top")        # live switch, state resets
        r.run(blocks=r.graph.blocks_per_refresh + 1)
        s2 = r.smeter_db()
        assert abs(s2) < 0.5, s2              # correction follows window
    finally:
        r.close()
