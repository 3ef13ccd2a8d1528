"""First-order IIR via associative scan vs sequential float64 oracle."""

import numpy as np

from quisk_tpu.ops.iir import DCBlock, OnePole, Preemphasis
from quisk_tpu.oracle import dsp


def test_one_pole_matches_oracle(rng):
    fs, B = 48000.0, 2048
    op = OnePole.lowpass(300.0, fs)
    x = rng.standard_normal((3, 2 * B)).astype(np.float32)
    st = op.init_state(3)
    ys = []
    for i in range(2):
        st, y = op(st, x[:, i * B:(i + 1) * B])
        ys.append(np.asarray(y))
    y = np.concatenate(ys, axis=-1)
    a = np.exp(-2 * np.pi * 300.0 / fs)
    for c in range(3):
        ref = dsp.one_pole(x[c].astype(np.float64), a, 1 - a)
        assert dsp.snr_db(ref, y[c]) > 90


def test_dcblock_removes_dc(rng):
    op = DCBlock.create(0.995)
    x = (rng.standard_normal((1, 8192)) + 5.0).astype(np.float32)
    st = op.init_state(1)
    st, y = op(st, x)
    y = np.asarray(y)[0]
    assert abs(np.mean(y[2000:])) < 0.05          # DC gone
    hp = x[0] - np.mean(x[0])
    assert np.std(y[2000:]) > 0.8 * np.std(hp)    # AC preserved


def test_preemphasis(rng):
    op = Preemphasis.create(0.97)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    st = op.init_state(2)
    st, y = op(st, x)
    ref = x[:, :] - 0.97 * np.concatenate([np.zeros((2, 1)), x[:, :-1]], axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
