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
