"""In-pipeline marginal of the PFB spectrum tap.

probe_pfb_demod.py showed the spectrum's STANDALONE marginal is ~0.3 ms
(XLA DCE/fusion), but inside bench_pfb's full program `mean(|ch2|^2)`
reads the whole 536 MB channel batch a second time unless XLA fuses it
with the demod passes.  This times bench_pfb's exact full step (warm
cache) against the same step with the spectrum dropped.  Run on TPU.
"""
import numpy as np

import bench

bench.enable_compile_cache()

import jax
import jax.numpy as jnp

from quisk_tpu.modes import Mode
from quisk_tpu.ops.channelizer import OversampledPFB
from quisk_tpu.ops.demod import GroupedDemod
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

S, K, mult = 1, 4096, 8192
B = K * mult
pfb = OversampledPFB.create(K, B, taps_per_branch=8, mxu_dft=True,
                            pallas_poly=True)
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
demod = GroupedDemod.create([modes[(4 * i) // K] for i in range(K)],
                            sample_rate=2.0 * 48000.0, channels=K)


def full(st, x):
    pfb_st, dm_st = st
    pfb_st, ch = pfb(pfb_st, x)
    ch2 = ch.reshape(S * K, -1)
    dm_st, audio = demod(dm_st, ch2)
    spec = jnp.mean(jnp.abs(ch2) ** 2, axis=-1)
    return (pfb_st, dm_st), (audio, spec)


def no_spec(st, x):
    pfb_st, dm_st = st
    pfb_st, ch = pfb(pfb_st, x)
    ch2 = ch.reshape(S * K, -1)
    dm_st, audio = demod(dm_st, ch2)
    return (pfb_st, dm_st), audio


rng = np.random.default_rng(1)
x = (rng.standard_normal((S, B))
     + 1j * rng.standard_normal((S, B))).astype(np.complex64)
st = (pfb.init_state(S), demod.init_state(S * K))
px = jax.device_put(pack_tree(x))

for name, fn in [("full (audio + spectrum)", full),
                 ("no spectrum", no_spec)]:
    stepf = make_boundary_step(fn)
    pst = jax.device_put(pack_tree(st))
    ns, out = stepf(pst, px)
    bench._sync(out)
    dt = bench._timed_best(lambda s: stepf(s, px), pst, 12)
    print(f"{name}: {dt * 1e3:8.2f} ms", flush=True)
