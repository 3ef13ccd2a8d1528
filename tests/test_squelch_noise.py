"""Squelch + noise blanker + auto-notch behavioral tests."""

import numpy as np

from quisk_tpu.io import sources
from quisk_tpu.ops.noise import AutoNotch, NoiseBlanker
from quisk_tpu.ops.squelch import FMSquelch, SSBSquelch
from quisk_tpu.oracle import dsp

FS = 48000.0
B = 2048


def test_ssb_squelch_opens_on_voice_closes_on_noise(rng):
    sq = SSBSquelch.create(FS, B, threshold=0.8)
    # voice = harmonic-rich (vowel-like): spectrally peaky, unlike noise
    t = np.arange(8 * B) / FS
    voice = sum(np.sin(2 * np.pi * 200.0 * k * t + k) / k
                for k in range(1, 12)).astype(np.float32)
    noise = rng.standard_normal(8 * B).astype(np.float32)
    st = sq.init_state(2)
    outs = []
    for i in range(8):
        blk = np.stack([voice[i * B:(i + 1) * B], noise[i * B:(i + 1) * B]])
        st, y = sq(st, blk)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    # voice channel passes (later blocks, after open)
    assert np.std(y[0][4 * B:]) > 0.5 * np.std(voice[4 * B:])
    # noise channel muted
    assert np.std(y[1][4 * B:]) < 0.05 * np.std(noise[4 * B:])


def test_fm_squelch(rng):
    sq = FMSquelch.create(FS, B, threshold_db=-30.0)
    audio = rng.standard_normal((2, 2 * B)).astype(np.float32)
    strong = np.full((1, 2 * B), 1.0, np.complex64)
    weak = np.full((1, 2 * B), 1e-3, np.complex64)
    rf = np.concatenate([strong, weak])
    st = sq.init_state(2)
    for i in range(2):
        rf_db = sq.measure(rf[:, i * B:(i + 1) * B])
        st, y = sq(st, audio[:, i * B:(i + 1) * B], rf_db)
    y = np.asarray(y)
    assert np.std(y[0]) > 0.5 * np.std(audio[0])
    assert np.std(y[1]) < 0.05


def test_noise_blanker_kills_impulses(rng):
    nb = NoiseBlanker.create(FS, level=2)
    x = (0.1 * (rng.standard_normal(4 * B) + 1j * rng.standard_normal(4 * B))
         ).astype(np.complex64)
    clean = x.copy()
    for pos in (3000, 4096, 7000):
        x[pos: pos + 5] += 30.0 * (1 + 1j)
    st = nb.init_state(1)
    outs = []
    for i in range(4):
        st, y = nb(st, x[None, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0]
    # impulses crushed
    for pos in (3000, 4096, 7000):
        assert np.abs(y[pos: pos + 5]).max() < 1.0
    # bulk signal mostly untouched
    mask = np.ones(len(x), bool)
    for pos in (3000, 4096, 7000):
        mask[pos - 100: pos + 105] = False
    assert dsp.snr_db(clean[mask], y[mask]) > 20


def test_auto_notch_removes_tone_keeps_voice():
    an = AutoNotch.create(B)
    voice = sources.voice_like(FS, 16 * B).astype(np.float32)
    tone = 2.0 * np.sin(2 * np.pi * 1500.0 / FS * np.arange(16 * B)).astype(np.float32)
    a = (voice + tone)[None]
    st = an.init_state(1)
    outs = []
    for i in range(16):
        st, y = an(st, a[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0]
    # measure tone power before/after in the last half
    seg = slice(8 * B, 16 * B)
    f = np.fft.rfftfreq(8 * B, 1 / FS)
    kt = np.argmin(np.abs(f - 1500.0))
    before = np.abs(np.fft.rfft(a[0][seg]))[kt]
    after = np.abs(np.fft.rfft(y[seg]))[kt]
    assert 20 * np.log10(after / before) < -25
    # voice elsewhere survives: compare out-of-notch spectrum
    Pv = np.abs(np.fft.rfft(voice[seg]))
    Py = np.abs(np.fft.rfft(y[seg]))
    keep = (np.abs(f - 1500.0) > 200) & (f > 300) & (f < 2700)
    ratio = np.mean(Py[keep] / (Pv[keep] + 1e-12))
    assert 0.7 < ratio < 1.3


def test_noise_blanker_coarse_matches_exact_wideband(rng):
    """At wideband rates the blanker runs detection/widening on a 16:1
    coarse grid (HBM economics, ops/noise.py); pin that path against the
    exact per-sample formulation: identical pulse kills (including across
    a block join) and near-identical audio elsewhere."""
    fs, blk = 960000.0, 40960
    nb = NoiseBlanker.create(fs, level=2)
    assert nb.pool == 16
    exact = nb.replace(pool=1)

    # bounded (uniform) noise: |x| can never cross limit*avg on its own,
    # so the detection set is exactly the injected pulses on both paths
    # (gaussian tails produce borderline false positives that flip either
    # way between the per-sample and group-max compares — real but
    # behaviorally irrelevant blanking of ~1 ms of noise)
    x = (0.1 * (rng.uniform(-1, 1, (2, 2 * blk))
                + 1j * rng.uniform(-1, 1, (2, 2 * blk)))).astype(np.complex64)
    for pos in (5000, blk - 3, 70001):   # one straddles the block join
        x[:, pos: pos + 6] += 25.0 * (1 + 1j)

    def run(op):
        st = op.init_state(2)
        outs = []
        for i in range(2):
            st, y = op(st, x[:, i * blk:(i + 1) * blk])
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    yc, ye = run(nb), run(exact)
    for pos in (5000, blk - 3, 70001):
        assert np.abs(yc[:, pos: pos + 6]).max() < 1.0
    # coarse and exact agree closely overall (differences live in the
    # raised-cosine skirts, ~3% envelope error at 16-sample granularity)
    assert dsp.snr_db(ye.ravel(), yc.ravel()) > 20
    # away from the blanking skirts (and the stream warm-up, where the
    # filling average makes the exact path blank the first ~avg_win
    # samples) the two paths are identical: gain is exactly 1
    mask = np.ones(2 * blk, bool)
    half = nb.kwidth // 2
    for pos in (5000, blk - 3, 70001):
        mask[max(0, pos - 2 * half): pos + 6 + 2 * half] = False
    mask[: 2 * half + nb.avg_win] = False
    assert dsp.snr_db(ye[:, mask].ravel(), yc[:, mask].ravel()) > 60
