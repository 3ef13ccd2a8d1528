"""A/B probe: 512-pt STFT ops (SpectralNR, SpectralNoiseBlanker) with
jnp.fft vs MXU matmul rDFT, on the real TPU at featured-chain shapes.

Run: python probe_stft_ab.py
"""
import time

import numpy as np

import bench

bench.enable_compile_cache()

import jax
import jax.numpy as jnp

from quisk_tpu.ops.nr import SpectralNR
from quisk_tpu.ops.noise import SpectralNoiseBlanker


def timed(op, C=1024, B=2048, iters=30, nblk=16):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nblk, C, B)).astype(np.float32)
    st = jax.device_put(op.init_state(C))
    px = jax.device_put(jnp.asarray(x))

    def many(o, s, xx):
        def body(c, xb):
            c2, yb = o(c, xb)
            return c2, jnp.sum(yb)
        s2, ys = jax.lax.scan(body, s, xx)
        return s2, jnp.sum(ys)

    step = jax.jit(many)
    pop = jax.device_put(op)
    t0 = time.perf_counter()
    st2, y = step(pop, st, px)
    bench._sync(y)
    compile_s = time.perf_counter() - t0
    dt = bench._timed_best(lambda s: step(pop, s, px), st, iters)
    return dt / nblk, compile_s


from quisk_tpu.ops.noise import AutoNotch
from quisk_tpu.ops.nr import BlockLMS
from quisk_tpu.ops import mxdft


def anf_single(m):
    op = BlockLMS.create(2048, notch=True, mxu_dft=False)
    if m:
        op = op.replace(rdft=mxdft.MatmulRDFT.create(1024))
    return op


for name, mk in [
        ("NR2", lambda m: SpectralNR.create(2048, mxu_dft=m)),
        ("SNB", lambda m: SpectralNoiseBlanker.create(2048, mxu_dft=m)),
        ("AutoNotch", lambda m: AutoNotch.create(2048, mxu_dft=m)),
        ("ANF(ct)", lambda m: BlockLMS.create(2048, notch=True, mxu_dft=m)),
        ("ANF(1stage)", anf_single),
]:
    for m in (False, True):
        dt, cs = timed(mk(m))
        print(f"{name} mxu_dft={m}: {dt*1e3:.3f} ms/block "
              f"(compile {cs:.1f}s)", flush=True)
