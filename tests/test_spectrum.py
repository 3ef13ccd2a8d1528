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


# ---------------------------------------------------------- r5: overlap
def test_overlap_matches_numpy_stft_and_streams():
    """50%-overlap capture == a numpy hop-L/2 STFT power average, and
    streaming over 2 blocks == one big block (history carry exact)."""
    import jax.numpy as jnp
    from quisk_tpu.ops.spectrum import SpectrumAnalyzer, make_window

    L, B, C = 256, 1024, 2
    an = SpectrumAnalyzer.create(L, B, window="hann", overlap=0.5)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, 2 * B))
         + 1j * rng.standard_normal((C, 2 * B))).astype(np.complex64)

    st = an.init_state(C)
    for b in range(2):
        st, _ = an.accumulate(st, jnp.asarray(x[:, b * B:(b + 1) * B]))
    got = np.asarray(an.power(st))

    # numpy oracle: frames at hop L/2 over [hist | x] with zero history
    w = make_window("hann", L)
    w = w / w.sum()
    ext = np.concatenate([np.zeros((C, L // 2)), x], axis=-1)
    hop = L // 2
    nfr = (ext.shape[-1] - L) // hop + 1
    acc = np.zeros((C, L))
    for f in range(nfr):
        X = np.fft.fft(ext[:, f * hop:f * hop + L] * w, axis=-1)
        acc += np.abs(X) ** 2
    # analyzer averages per-frame within each block then over blocks
    ref = np.fft.fftshift(acc / nfr, axes=-1)
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-8)

    # streaming == one shot (same total frames, same average)
    an1 = SpectrumAnalyzer.create(L, 2 * B, window="hann", overlap=0.5)
    st1 = an1.init_state(C)
    st1, _ = an1.accumulate(st1, jnp.asarray(x))
    assert np.allclose(got, np.asarray(an1.power(st1)), rtol=1e-4)


def test_overlap_tone_reads_0dbfs_and_smeter_exact():
    """Window normalization and the ENBW S-meter correction survive the
    overlapped path: a full-scale tone reads ~0 dBFS and its bin-summed
    power ~1.0 for 0%, 50% and 75% overlap."""
    import jax.numpy as jnp
    from quisk_tpu.io import sources
    from quisk_tpu.ops.spectrum import SpectrumAnalyzer

    L, B = 512, 4096
    FS = 48000.0
    x = sources.tone(6000.0, FS, B).astype(np.complex64)[None]
    for ov in (0.0, 0.5, 0.75):
        an = SpectrumAnalyzer.create(L, B, window="hann", overlap=ov)
        st = an.init_state(1)
        st, _ = an.accumulate(st, jnp.asarray(x))
        db = np.asarray(an.graph_db(st))[0]
        assert abs(db.max() - 0.0) < 1.0, (ov, db.max())
        pw = float(np.asarray(an.smeter_power(st, FS, 5000.0, 7000.0))[0])
        assert abs(pw - 1.0) < 0.05, (ov, pw)


def test_zoom_spectrum_resolves_sub_bin_tones():
    """Two tones 3x closer than the base FFT's bin width: pixel zoom on
    the base capture cannot separate them; ZoomSpectrum (decim=16
    re-capture) shows two distinct peaks at the right frequencies."""
    import jax.numpy as jnp
    from quisk_tpu.io import sources
    from quisk_tpu.ops.spectrum import SpectrumAnalyzer, ZoomSpectrum

    FS = 256000.0
    L, B = 256, 8192
    base_bin = FS / L                       # 1000 Hz
    f1, f2 = 20000.0, 20000.0 + base_bin / 3.0
    n = 8 * B
    x = (sources.tone(f1, FS, n) + sources.tone(f2, FS, n)
         ).astype(np.complex64)[None]

    base = SpectrumAnalyzer.create(L, B, window="hann")
    zm = ZoomSpectrum.create(L, B, center_hz=20000.0, sample_rate=FS,
                             decim=16, overlap=0.5)
    st_b, st_z = base.init_state(1), zm.init_state(1)
    for b in range(8):
        xb = jnp.asarray(x[:, b * B:(b + 1) * B])
        st_b, _ = base.accumulate(st_b, xb)
        st_z, _ = zm.accumulate(st_z, xb)

    def n_peaks(p):
        p = p / p.max()
        return int(np.sum((p[1:-1] > p[:-2]) & (p[1:-1] >= p[2:])
                          & (p[1:-1] > 0.05)))

    p_base = np.asarray(base.power(st_b))[0]
    assert n_peaks(p_base) == 1            # merged in one base bin pair
    p_zoom = np.asarray(zm.power(st_z))[0]
    assert n_peaks(p_zoom) == 2, n_peaks(p_zoom)
    # absolute frequency mapping: the two zoomed peaks sit at f1 and f2
    fz = zm.freqs(FS, center_hz=20000.0)
    zoom_bin = FS / 16 / L
    top2 = sorted(fz[i] for i in np.argsort(p_zoom)[-2:])
    assert abs(top2[0] - f1) < zoom_bin and abs(top2[1] - f2) < zoom_bin
