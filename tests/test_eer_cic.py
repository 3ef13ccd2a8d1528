"""Tests: EER polar split and CIC droop compensation design."""

import numpy as np
from scipy import signal as sig

from quisk_tpu.io import sources
from quisk_tpu.ops import design
from quisk_tpu.tx.eer import EERSplitter

FS = 48000.0
B = 2048


def test_eer_split_reconstructs_signal():
    n = 8 * B
    voice = sources.voice_like(FS, n)
    z = sig.hilbert(0.8 * voice / np.max(np.abs(voice)))
    x = z[None].astype(np.complex64)
    eer = EERSplitter.create(floor=0.01)
    _, (env, ph) = eer((), x)
    env, ph = np.asarray(env)[0], np.asarray(ph)[0]
    # phase path is constant-envelope (where above the floor)
    mask = env > 0.05
    assert np.max(np.abs(np.abs(ph[mask]) - 1.0)) < 1e-3
    # envelope x phase reconstructs the original
    recon = env * ph
    err = recon[mask] - z[mask]
    assert np.sqrt(np.mean(np.abs(err) ** 2)) < 1e-3


def test_eer_delay_alignment():
    eer = EERSplitter.create(delay_samples=16)
    st = eer.init_state(1)
    t = np.arange(2 * B)
    x = np.exp(2j * np.pi * 0.01 * t)[None].astype(np.complex64)
    st, (env1, ph1) = eer(st, x[:, :B])
    st, (env2, ph2) = eer(st, x[:, B:])
    ph = np.concatenate([np.asarray(ph1), np.asarray(ph2)], axis=-1)[0]
    # the phase path is the input delayed by 16 samples
    assert np.max(np.abs(ph[16:B] - x[0, :B - 16])) < 1e-5


def test_cic_compensator_flattens_droop():
    decim, stages = 8, 4
    fs_out = 96000.0
    h = design.cic_compensator(255, stages, decim, fs_out)
    f, H = sig.freqz(h, worN=2048, fs=fs_out)
    fin = fs_out * decim
    cic = np.abs(np.sin(np.pi * f * decim / fin)
                 / (decim * np.sin(np.pi * np.maximum(f, 1e-9) / fin))) ** stages
    cic[0] = 1.0
    combined = np.abs(H) * cic
    pb = f <= 0.38 * fs_out
    ripple_db = 20 * np.log10(combined[pb].max() / combined[pb].min())
    # CIC alone droops several dB across the passband; compensated < 0.5 dB
    droop_db = -20 * np.log10(cic[pb].min())
    assert droop_db > 3.0
    assert ripple_db < 0.5, ripple_db
