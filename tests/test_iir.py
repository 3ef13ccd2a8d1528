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


def test_first_order_chunked_matches_scan():
    """The chunked MXU formulation (B >= 2048, scalar a) is the same
    recurrence as the associative scan to f32 roundoff — including the
    carry across blocks."""
    import jax.numpy as jnp
    from quisk_tpu.ops.iir import (_first_order_chunked,
                                   _first_order_scan)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    y0 = rng.standard_normal(4).astype(np.float32)
    for a, b in ((0.995, 1.0), (0.9806, 0.0194)):
        yc = np.asarray(_first_order_chunked(
            jnp.asarray(x), jnp.float32(a), b, jnp.asarray(y0)))
        # reference: the associative scan on a SHORT block (forced by
        # slicing under the chunked threshold) streamed in 4 pieces
        ys = []
        prev = jnp.asarray(y0)
        for k in range(4):
            seg = jnp.asarray(x[:, k * 1024:(k + 1) * 1024])
            y = _first_order_scan(seg, jnp.float32(a), b, prev)
            prev = y[:, -1]
            ys.append(np.asarray(y))
        ys = np.concatenate(ys, axis=-1)
        err = np.max(np.abs(yc - ys)) / max(1e-9, np.max(np.abs(ys)))
        assert err < 5e-6, (a, err)


def test_first_order_time_major_matches_channel_major():
    """_first_order_scan_tm == _first_order_scan transposed, on both the
    chunked-MXU path (T >= 2048) and the associative-scan path."""
    import jax.numpy as jnp
    from quisk_tpu.ops.iir import _first_order_scan, _first_order_scan_tm

    rng = np.random.default_rng(0)
    for T in (2048, 384):                 # chunked and scan paths
        x = rng.standard_normal((8, T)).astype(np.float32)
        y0 = rng.standard_normal(8).astype(np.float32)
        a, b = 0.97, 0.03
        ref = _first_order_scan(jnp.asarray(x), a, b, jnp.asarray(y0))
        tm = _first_order_scan_tm(jnp.asarray(x.T), a, b, jnp.asarray(y0))
        assert np.allclose(np.asarray(tm).T, np.asarray(ref), atol=2e-4)


def test_onepole_dcblock_time_major_with_lead_dims():
    """apply_tm handles leading batch dims and carries state across
    blocks identically to the channel-major form."""
    import jax.numpy as jnp
    from quisk_tpu.ops.iir import DCBlock, OnePole

    rng = np.random.default_rng(1)
    op = OnePole.lowpass(300.0, 48000.0)
    dc = DCBlock.create(0.995)
    S, C, B = 2, 4, 256
    x = rng.standard_normal((S, C, 2 * B)).astype(np.float32)
    for s in range(S):
        st_cm = op.init_state(C)
        st_tm = jnp.zeros((C,), jnp.float32)
        dcs_cm = dc.init_state(C)
        dcs_tm = (jnp.zeros((C,)), jnp.zeros((C,)))
        for blk in range(2):
            xb = jnp.asarray(x[s, :, blk * B:(blk + 1) * B])
            st_cm, y_cm = op(st_cm, xb)
            st_tm, y_tm = op.apply_tm(st_tm, xb.T)
            assert np.allclose(np.asarray(y_tm).T, np.asarray(y_cm),
                               atol=1e-5)
            dcs_cm, d_cm = dc(dcs_cm, xb)
            dcs_tm, d_tm = dc.apply_tm(dcs_tm, xb.T)
            assert np.allclose(np.asarray(d_tm).T, np.asarray(d_cm),
                               atol=1e-5)


def test_biquad_matches_scipy_lfilter():
    """Direct Biquad oracle test (the associative 2x2 matrix scan must
    equal scipy's sequential DF evaluation): notch, peak and highpass
    sections, streaming state across blocks.  (Added after a refactor
    silently swapped the Biquad's matrix combinator for the scalar
    first-order one — nothing had pinned the biquad math directly.)"""
    from scipy import signal as sig

    import jax.numpy as jnp
    from quisk_tpu.ops.iir import Biquad

    rng = np.random.default_rng(3)
    fs = 48000.0
    for bq, name in ((Biquad.notch(1000.0, fs, q=10.0), "notch"),
                     (Biquad.peak(2000.0, fs, q=5.0, gain_db=6.0), "peak"),
                     (Biquad.highpass(300.0, fs), "highpass")):
        b = [float(bq.b0), float(bq.b1), float(bq.b2)]
        a = [1.0, float(bq.a1), float(bq.a2)]
        x = rng.standard_normal((2, 1024)).astype(np.float32)
        want = sig.lfilter(b, a, x.astype(np.float64), axis=-1)
        st = bq.init_state(2)
        got = []
        for k in range(4):
            st, y = bq(st, jnp.asarray(x[:, k * 256:(k + 1) * 256]))
            got.append(np.asarray(y))
        got = np.concatenate(got, axis=-1)
        err = np.max(np.abs(got - want))
        assert err < 1e-3, (name, err)
