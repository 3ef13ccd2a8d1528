"""FIR engines vs the float64 oracle + streaming invariance."""

import numpy as np
import pytest

from quisk_tpu.ops import design
from quisk_tpu.ops.fir import ConvFIR, OverlapSaveFIR, make_fir
from quisk_tpu.oracle import dsp

C, B = 4, 1024


def _run_blocks(op, x, nblocks):
    state = op.init_state(x.shape[0])
    outs = []
    for i in range(nblocks):
        state, y = op(state, x[:, i * op.block:(i + 1) * op.block])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def _make_iq(rng, c, n):
    return (rng.standard_normal((c, n)) + 1j * rng.standard_normal((c, n))
            ).astype(np.complex64)


@pytest.mark.parametrize("engine", ["ols", "conv"])
@pytest.mark.parametrize("complex_taps", [False, True])
def test_fir_matches_oracle(rng, engine, complex_taps):
    if complex_taps:
        taps = design.bandpass_analytic(201, 300.0, 3100.0, 48000.0)
    else:
        taps = design.lowpass(201, 3000.0, 48000.0)
    x = _make_iq(rng, C, 3 * B)
    op = make_fir(taps, B, method=engine)
    y = _run_blocks(op, x, 3)
    for c in range(C):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps)
        assert dsp.snr_db(ref, y[c]) > 100, f"channel {c}"


@pytest.mark.parametrize("engine", ["ols", "conv"])
@pytest.mark.parametrize("decim", [2, 4, 8])
def test_fir_decimating(rng, engine, decim):
    taps = design.decimator(decim, 48000.0 * decim, atten_db=90.0)
    x = _make_iq(rng, C, 2 * B)
    if engine == "ols":
        op = OverlapSaveFIR.create(taps, B, decim=decim)
    else:
        op = ConvFIR.create(taps, B, decim=decim)
    y = _run_blocks(op, x, 2)
    assert y.shape == (C, 2 * B // decim)
    for c in range(C):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps, decim=decim)
        assert dsp.snr_db(ref, y[c]) > 100


@pytest.mark.parametrize("engine", ["ols", "conv"])
def test_streaming_invariance(rng, engine):
    """Filtering block-by-block == filtering with a different block split."""
    taps = design.lowpass(101, 3000.0, 48000.0)
    x = _make_iq(rng, C, 4 * 512)
    small = make_fir(taps, 512, method=engine)
    big = make_fir(taps, 2048, method=engine)
    y_small = _run_blocks(small, x, 4)
    y_big = _run_blocks(big, x, 1)
    np.testing.assert_allclose(y_small, y_big, rtol=0, atol=2e-5)


def test_per_channel_masks(rng):
    """OLS supports a distinct filter per channel via a [C, nfft] mask."""
    fs = 48000.0
    taps = np.stack([
        design.bandpass_analytic(201, 300.0, 3100.0, fs),
        design.bandpass_analytic(201, -3100.0, -300.0, fs),
        design.bandpass_analytic(201, 300.0, 800.0, fs),
        design.lowpass(201, 5000.0, fs).astype(np.complex128),
    ])
    x = _make_iq(rng, 4, 2 * B)
    op = OverlapSaveFIR.create(taps, B)
    y = _run_blocks(op, x, 2)
    for c in range(4):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps[c])
        assert dsp.snr_db(ref, y[c]) > 100


def test_retune_is_data_only(rng):
    fs = 48000.0
    op = OverlapSaveFIR.create(design.bandpass_analytic(201, 300., 3100., fs), B)
    op2 = op.retuned(design.bandpass_analytic(201, 300., 800., fs))
    assert op2.mask.shape == op.mask.shape
    x = _make_iq(rng, 1, B)
    _, y = op2(op2.init_state(1), x)
    _, ref = dsp.fir_stream(x[0].astype(np.complex128),
                            design.bandpass_analytic(201, 300., 800., fs))
    assert dsp.snr_db(ref, np.asarray(y)[0]) > 100


def test_halfband_polyphase_matches_matmul(rng):
    """HalfbandFIR (polyphase /2, zero taps skipped) vs MatmulFIR: the
    same exact sum, so agreement to f32 roundoff; auto-selected by
    make_fir for half-band tap sets."""
    from quisk_tpu.ops.fir import HalfbandFIR, MatmulFIR

    h = design.halfband(45)
    assert HalfbandFIR.is_halfband(h)
    assert not HalfbandFIR.is_halfband(design.decimator(5, 240000.0))
    op = make_fir(h, B, decim=2)
    assert isinstance(op, HalfbandFIR)
    ref = MatmulFIR.create(h, B, 2)
    x = _make_iq(rng, C, 4 * B)
    ya = _run_blocks(op, x, 4)
    yb = _run_blocks(ref, x, 4)
    assert np.max(np.abs(ya - yb)) < 1e-5 * max(1.0, np.max(np.abs(yb)))
    # real path too
    opr = make_fir(h, B, decim=2, complex_state=False)
    refr = MatmulFIR.create(h, B, 2, complex_state=False)
    xr = rng.standard_normal((C, 4 * B)).astype(np.float32)
    assert np.max(np.abs(_run_blocks(opr, xr, 4)
                         - _run_blocks(refr, xr, 4))) < 1e-5


# ------------------------------------------------- r5: partitioned OLS
def test_partitioned_ols_matches_single_partition():
    """PartitionedOLS == OverlapSaveFIR streaming for a 10001-tap filter
    at a 512-sample block (FIRCORE low-latency case: 20 partitions,
    1024-pt FFT/block vs the single-partition 16384-pt)."""
    import jax.numpy as jnp
    from quisk_tpu.ops.design import bandpass_analytic
    from quisk_tpu.ops.fir import OverlapSaveFIR, PartitionedOLS

    B, T, C = 512, 10001, 2
    taps = bandpass_analytic(T, 300.0, 2800.0, 48000.0)
    a = OverlapSaveFIR.create(taps, B)
    b = PartitionedOLS.create(taps, B)
    assert b.P == 20 and b.nfft == 1024 and a.nfft >= B + T - 1
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, 24 * B))
         + 1j * rng.standard_normal((C, 24 * B))).astype(np.complex64)
    sa, sb = a.init_state(C), b.init_state(C)
    for k in range(24):
        xb = jnp.asarray(x[:, k * B:(k + 1) * B])
        sa, ya = a(sa, xb)
        sb, yb = b(sb, xb)
        err = float(jnp.max(jnp.abs(ya - yb)))
        assert err < 1e-4, (k, err)


def test_partitioned_ols_decim_and_retune():
    """Decimating variant matches, and retuned() swaps the response
    (shape-stable masks, no recompile) with one-block latency."""
    import jax.numpy as jnp
    from quisk_tpu.ops.design import kaiser_lowpass
    from quisk_tpu.ops.fir import OverlapSaveFIR, PartitionedOLS

    B, C = 256, 1
    t1 = kaiser_lowpass(3000.0, 48000.0, atten_db=60.0)
    t1 = np.pad(t1, (0, (-len(t1)) % 1 or 0))
    a = OverlapSaveFIR.create(t1, B, decim=4)
    b = PartitionedOLS.create(t1, B, decim=4)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((C, 8 * B))
         + 1j * rng.standard_normal((C, 8 * B))).astype(np.complex64)
    sa, sb = a.init_state(C), b.init_state(C)
    for k in range(8):
        xb = jnp.asarray(x[:, k * B:(k + 1) * B])
        sa, ya = a(sa, xb)
        sb, yb = b(sb, xb)
        assert float(jnp.max(jnp.abs(ya - yb))) < 1e-4
    # retune to a wider filter: next block's output tracks the new taps
    t2 = kaiser_lowpass(6000.0, 48000.0, atten_db=60.0)
    t2 = np.resize(t2, len(t1))
    b2 = b.retuned(t2)
    a2 = a.retuned(t2)
    assert b2.H.shape == b.H.shape
    sb2, sa2 = sb, sa
    for k in range(3):   # flush P partitions' mixed history
        xb = jnp.asarray(x[:, k * B:(k + 1) * B])
        sa2, ya = a2(sa2, xb)
        sb2, yb = b2(sb2, xb)
    assert float(jnp.max(jnp.abs(ya - yb))) < 1e-4
