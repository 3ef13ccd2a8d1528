"""Matmul (MXU) DFT: numerical parity with the FFT and the PFB A/B.

ops/mxdft.py replaces jnp.fft on the TPU's weak FFT unit with two
HIGHEST-precision matmul stages (VERDICT r3 item 3); these tests pin the
math on CPU — the perf A/B lives in bench.py / BENCH_DETAIL.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quisk_tpu.ops.channelizer import OversampledPFB, PFBChannelizer
from quisk_tpu.ops.mxdft import MatmulDFT, plan_split

_apply = jax.jit(lambda d, v: d(v))


@pytest.mark.parametrize("K", [16, 64, 120, 512, 4096])
@pytest.mark.parametrize("inverse", [True, False])
def test_matmul_dft_matches_fft(K, inverse, rng):
    v = (rng.standard_normal((3, 5, K))
         + 1j * rng.standard_normal((3, 5, K))).astype(np.complex64)
    d = MatmulDFT.create(K, inverse=inverse)
    got = np.asarray(_apply(d, jnp.asarray(v)))
    ref = np.fft.ifft(v, axis=-1) * K if inverse else np.fft.fft(v, axis=-1)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 2e-5, (K, inverse, err)


def test_plan_split_balanced():
    assert plan_split(4096) == (64, 64)
    assert plan_split(512) == (16, 32)
    assert plan_split(120) == (10, 12)
    with pytest.raises(ValueError):
        plan_split(13)                     # prime: no nontrivial split


@pytest.mark.parametrize("cls", [PFBChannelizer, OversampledPFB])
def test_pfb_mxu_dft_matches_fft_path(cls, rng):
    K, P, block = 64, 8, 64 * 8
    fft_pfb = cls.create(K, block, taps_per_branch=P)
    mxu_pfb = cls.create(K, block, taps_per_branch=P, mxu_dft=True)
    x = (rng.standard_normal((2, 3 * block))
         + 1j * rng.standard_normal((2, 3 * block))).astype(np.complex64)
    step = jax.jit(lambda p, h, xb: p(h, xb))
    h1, h2 = fft_pfb.init_state(2), mxu_pfb.init_state(2)
    for k in range(3):
        xb = jnp.asarray(x[:, k * block:(k + 1) * block])
        h1, y1 = step(fft_pfb, h1, xb)
        h2, y2 = step(mxu_pfb, h2, xb)
        err = np.max(np.abs(np.asarray(y1) - np.asarray(y2)))
        scale = max(1e-9, float(np.max(np.abs(np.asarray(y1)))))
        assert err / scale < 2e-5, (cls.__name__, k, err / scale)


@pytest.mark.parametrize("N", [64, 256, 512])
def test_matmul_rdft_matches_numpy(N, rng):
    from quisk_tpu.ops.mxdft import MatmulRDFT

    x = rng.standard_normal((3, 7, N)).astype(np.float32)
    d = MatmulRDFT.create(N)
    Xr, Xi = jax.jit(lambda dd, xx: dd.rfft_ri(xx))(d, jnp.asarray(x))
    ref = np.fft.rfft(x, axis=-1)
    err = np.max(np.abs((np.asarray(Xr) + 1j * np.asarray(Xi)) - ref))
    assert err / np.max(np.abs(ref)) < 2e-6
    y = jax.jit(lambda dd, a, b: dd.irfft_ri(a, b))(d, Xr, Xi)
    err2 = np.max(np.abs(np.asarray(y) - x))
    assert err2 < 2e-5


@pytest.mark.parametrize("N,split", [(1024, None), (4096, None),
                                     (4096, (32, 128))])
def test_ct_rdft_matches_numpy(N, split, rng):
    from quisk_tpu.ops.mxdft import CTRDFT

    x = rng.standard_normal((5, N)).astype(np.float32)
    d = CTRDFT.create(N, split=split)
    Xr, Xi = jax.jit(lambda dd, xx: dd.rfft_ri(xx))(d, jnp.asarray(x))
    ref = np.fft.rfft(x, axis=-1)
    err = np.max(np.abs((np.asarray(Xr) + 1j * np.asarray(Xi)) - ref))
    assert err / np.max(np.abs(ref)) < 2e-6
    y = jax.jit(lambda dd, a, b: dd.irfft_ri(a, b))(d, Xr, Xi)
    err2 = np.max(np.abs(np.asarray(y) - x))
    assert err2 < 5e-5


@pytest.mark.parametrize("which", ["nr", "snb", "notch", "anf"])
def test_stft_ops_mxu_dft_matches_fft_path(which, rng):
    from quisk_tpu.ops.noise import AutoNotch, SpectralNoiseBlanker
    from quisk_tpu.ops.nr import BlockLMS, SpectralNR

    C, B = 4, 2048
    if which == "nr":
        a = SpectralNR.create(B)
        b = SpectralNR.create(B, mxu_dft=True)
    elif which == "notch":
        a = AutoNotch.create(B)
        b = AutoNotch.create(B, mxu_dft=True)
    elif which == "anf":
        a = BlockLMS.create(B, notch=True)
        b = BlockLMS.create(B, notch=True, mxu_dft=True)
    else:
        a = SpectralNoiseBlanker.create(B)
        b = SpectralNoiseBlanker.create(B, mxu_dft=True)
    x = rng.standard_normal((C, 4 * B)).astype(np.float32)
    x[1, 3000:3004] += 25.0                   # an impulse for the SNB
    # a persistent tone so the auto-notch/ANF actually engage
    x += 2.0 * np.sin(2 * np.pi * 1500.0 / 48000.0
                      * np.arange(4 * B)).astype(np.float32)
    sa, sb = a.init_state(C), b.init_state(C)
    step = jax.jit(lambda op, s, xx: op(s, xx))
    for k in range(4):
        xb = jnp.asarray(x[:, k * B:(k + 1) * B])
        sa, ya = step(a, sa, xb)
        sb, yb = step(b, sb, xb)
        err = float(jnp.max(jnp.abs(ya - yb)))
        scale = max(1e-9, float(jnp.max(jnp.abs(ya))))
        assert err / scale < 5e-5, (which, k, err / scale)
