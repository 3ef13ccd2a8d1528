"""Noise reduction ops: spectral NR, block-LMS ANF/ANR, synchronous AM."""

import numpy as np
import pytest

from quisk_tpu.io import sources
from quisk_tpu.oracle import dsp
from quisk_tpu.ops.nr import BlockLMS, SpectralNR, SyncAMDemod

FS = 48000.0
B = 2048


def _stream(op, x, nblk):
    st = op.init_state(x.shape[0])
    outs = []
    for i in range(nblk):
        st, y = op(st, x[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


@pytest.mark.slow
def test_spectral_nr_improves_snr():
    n = 24 * B
    t = np.arange(n) / FS
    voice = sum(np.sin(2 * np.pi * 250.0 * k * t + 1.3 * k) / k
                for k in range(1, 10)).astype(np.float32)
    rng = np.random.default_rng(0)
    noise = 0.3 * rng.standard_normal(n).astype(np.float32)
    noisy = voice + noise
    nr = SpectralNR.create(B)
    y = _stream(nr, noisy[None], 24)[0]
    # STFT latency: half fft; measure SNR improvement in the steady state
    seg = slice(8 * B, 23 * B)
    snr_in = dsp.snr_db(voice[seg], noisy[seg])
    snr_out = dsp.frac_align_snr(voice[seg], y[seg], max_lag=1024)
    assert snr_out > snr_in + 5.0, (snr_in, snr_out)


@pytest.mark.slow
def test_spectral_nr_passes_clean_voice():
    n = 16 * B
    t = np.arange(n) / FS
    voice = sum(np.sin(2 * np.pi * 230.0 * k * t) / k
                for k in range(1, 10)).astype(np.float32)
    nr = SpectralNR.create(B)
    y = _stream(nr, voice[None], 16)[0]
    seg = slice(8 * B, 15 * B)
    snr = dsp.frac_align_snr(voice[seg], y[seg], max_lag=1024)
    assert snr > 15, snr


def test_blocklms_anf_removes_tone():
    n = 24 * B
    rng = np.random.default_rng(1)
    voice = sources.voice_like(FS, n).astype(np.float32)
    tone = 1.5 * np.sin(2 * np.pi * 1500.0 / FS * np.arange(n)).astype(np.float32)
    x = (voice + tone)[None]
    anf = BlockLMS.create(B, notch=True)
    y = _stream(anf, x, 24)[0]
    seg = slice(16 * B, 24 * B)
    f = np.fft.rfftfreq(8 * B, 1 / FS)
    kt = np.argmin(np.abs(f - 1500.0))
    before = np.abs(np.fft.rfft(x[0][seg]))[kt]
    after = np.abs(np.fft.rfft(y[seg]))[kt]
    assert 20 * np.log10(after / before) < -20
    # voice passband survives
    keep = (np.abs(f - 1500.0) > 150) & (f > 300) & (f < 2700)
    Pv = np.abs(np.fft.rfft(voice[seg]))[keep]
    Py = np.abs(np.fft.rfft(y[seg]))[keep]
    assert 0.6 < np.mean(Py / (Pv + 1e-12)) < 1.4


def test_blocklms_anr_keeps_tone_drops_noise():
    n = 24 * B
    rng = np.random.default_rng(2)
    tone = np.sin(2 * np.pi * 800.0 / FS * np.arange(n)).astype(np.float32)
    noise = 1.0 * rng.standard_normal(n).astype(np.float32)
    x = (tone + noise)[None]
    anr = BlockLMS.create(B, notch=False)
    y = _stream(anr, x, 24)[0]
    seg = slice(16 * B, 24 * B)
    snr_in = dsp.snr_db(tone[seg], x[0][seg])
    snr_out = dsp.frac_align_snr(tone[seg], y[seg], max_lag=256)
    assert snr_out > snr_in + 6.0, (snr_in, snr_out)


@pytest.mark.slow
def test_sync_am_locks_and_demodulates():
    n = 16 * B
    audio = sources.voice_like(FS, n, band=(300.0, 2500.0))
    audio = 0.8 * audio / np.max(np.abs(audio))
    # AM with a 40 Hz carrier offset + phase: envelope detector would be
    # fine, but sync AM must lock and track
    iq = sources.am_signal(audio, FS, carrier_hz=40.0, depth=0.5)
    dem = SyncAMDemod.create(FS, bw_hz=150.0)
    y = _stream(dem, iq[None].astype(np.complex64), 16)[0]
    seg = slice(8 * B, 16 * B)
    snr = dsp.frac_align_snr(audio[seg], y[seg], max_lag=64)
    assert snr > 20, snr


def test_blocklms_fdaf_matches_time_domain():
    """The frequency-domain (overlap-save FDAF) path is the SAME update as
    the time-domain window-matmul path — agreement to f32 roundoff."""
    rng = np.random.default_rng(3)
    C = 3
    x = (rng.standard_normal((C, 6 * B)).astype(np.float32)
         + 1.5 * np.sin(2 * np.pi * 1500 / FS * np.arange(6 * B)
                        ).astype(np.float32))
    for sub in (128, 512):
        td = BlockLMS.create(B, notch=True, sub=sub, fdaf=False)
        fd = BlockLMS.create(B, notch=True, sub=sub, fdaf=True)
        st_t, st_f = td.init_state(C), fd.init_state(C)
        for i in range(6):
            blk = x[:, i * B:(i + 1) * B]
            st_t, yt = td(st_t, blk)
            st_f, yf = fd(st_f, blk)
            assert np.max(np.abs(np.asarray(yt) - np.asarray(yf))) < 1e-4
