"""AGC: scan form vs sequential oracle + hard no-overshoot guarantee."""

import numpy as np

from quisk_tpu.ops.agc import AGC, sliding_max
from quisk_tpu.oracle import dsp

FS = 48000.0


def test_sliding_max(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    for W in (3, 16, 720):
        got = np.asarray(sliding_max(x, W))
        for c in range(2):
            ref = np.array([x[c, n: n + W].max() for n in range(1000)])
            np.testing.assert_allclose(got[c], ref, atol=1e-6)


def test_agc_matches_oracle(rng):
    B = 2048
    a = (rng.standard_normal((1, 4 * B)) * 0.01).astype(np.float32)
    a[0, 3000:3400] *= 300.0        # loud burst
    a[0, 6000:6010] = 5.0           # impulse
    op = AGC.create(FS)
    st = op.init_state(1)
    outs = []
    for i in range(4):
        st, y = op(st, a[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0]
    ref = dsp.agc(a[0].astype(np.float64), FS)
    assert dsp.snr_db(ref, y, skip=10) > 60


def test_agc_never_overshoots(rng):
    B = 2048
    a = (rng.standard_normal((3, 8 * B)) * 10.0).astype(np.float32)
    op = AGC.create(FS, target=0.9)
    st = op.init_state(3)
    for i in range(8):
        st, y = op(st, a[:, i * B:(i + 1) * B])
        assert float(jnp_abs_max(y)) <= 0.9 * 1.001


def jnp_abs_max(y):
    import jax.numpy as jnp
    return jnp.max(jnp.abs(y))


def test_agc_brings_quiet_signal_up(rng):
    B = 2048
    a = (np.sin(2 * np.pi * 1000 / FS * np.arange(32 * B)) * 1e-3
         ).astype(np.float32)[None]
    op = AGC.create(FS, target=0.9, max_gain_db=80.0)
    st = op.init_state(1)
    last = None
    # needs log10(0.9/1e-3)*20 = 59 dB of gain at 60 dB/s release -> ~1 s
    for i in range(32):
        st, last = op(st, a[:, i * B:(i + 1) * B])
    peak = float(np.max(np.abs(np.asarray(last))))
    assert peak > 0.7  # gained up toward target


def test_hang_agc_holds_gain_between_peaks():
    from quisk_tpu.ops.agc import HangAGC
    FS_, B_ = 48000.0, 2048
    agc = HangAGC.create(FS_, hang_ms=100.0, release_db_per_s=200.0)
    # loud burst, then silence shorter than the hang, then quiet voice
    n = 8 * B_
    x = np.zeros((1, n), np.float32)
    x[0, :B_] = 2.0 * np.sin(2 * np.pi * 500 / FS_ * np.arange(B_))
    x[0, 2 * B_:] = 0.05 * np.sin(2 * np.pi * 500 / FS_ * np.arange(6 * B_))
    st = agc.init_state(1)
    outs = []
    gains = []
    for i in range(8):
        st, y = agc(st, x[:, i * B_:(i + 1) * B_])
        outs.append(np.asarray(y))
        gains.append(float(np.asarray(st[1])[0]))
    y = np.concatenate(outs, axis=-1)[0]
    # burst is limited to ~target
    assert np.max(np.abs(y[:2 * B_])) < 1.0
    # during the hang (right after the burst) the gain stays put: the
    # quiet signal right after is NOT yet pumped up...
    early_rms = np.sqrt(np.mean(y[2 * B_ + 256: 3 * B_] ** 2))
    # ...but after the hang expires the release recovers gain
    late_rms = np.sqrt(np.mean(y[6 * B_:] ** 2))
    assert late_rms > 3.0 * early_rms, (early_rms, late_rms)
    # gain trace is monotone through the release
    assert gains[-1] > gains[2]


def test_hang_agc_streaming_invariance():
    from quisk_tpu.ops.agc import HangAGC
    FS_, B_ = 48000.0, 1024
    agc = HangAGC.create(FS_)
    rng = np.random.default_rng(5)
    x = (0.3 * rng.standard_normal((2, 4 * B_))).astype(np.float32)
    st = agc.init_state(2)
    outs = []
    for i in range(4):
        st, y = agc(st, x[:, i * B_:(i + 1) * B_])
        outs.append(np.asarray(y))
    y_blocks = np.concatenate(outs, axis=-1)
    agc2 = HangAGC.create(FS_)
    st2 = agc2.init_state(2)
    # one big block (4*B) — same op params, block size only affects shapes
    st2, y_once = agc2(st2, x)
    assert np.allclose(y_blocks, np.asarray(y_once), atol=1e-5)
