"""Prefix-differenced stage profile of the PFB pipeline (bench_pfb's
exact shapes): polyphase accumulation -> IDFT -> phase rotation ->
corner turn -> mixed demod -> spectrum.  Run on the real TPU.
"""
import numpy as np

import bench

bench.enable_compile_cache()

import jax
import jax.numpy as jnp

from quisk_tpu.modes import Mode
from quisk_tpu.ops.channelizer import OversampledPFB
from quisk_tpu.ops.demod import MixedDemod
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

S, K, mult = 1, 4096, 8192
B = K * mult
pfb = OversampledPFB.create(K, B, taps_per_branch=8, mxu_dft=True)
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
demod = MixedDemod.create([modes[i % 4] for i in range(K)],
                          sample_rate=2.0 * 48000.0, channels=K)

M = K // 2
n_out = B // M


def poly_only(st, x):
    pfb_st, dm_st = st
    ext = jnp.concatenate([jnp.asarray(pfb_st), x], axis=-1)
    G = ext.reshape(S, n_out + 2 * pfb.P - 1, M)
    Gr, Gi = jnp.real(G), jnp.imag(G)
    hrev = pfb.h_poly[::-1, ::-1]
    halves_r, halves_i = [], []
    for hh in range(2):
        ur = jnp.zeros((S, n_out, M), jnp.float32)
        ui = jnp.zeros((S, n_out, M), jnp.float32)
        for p in range(pfb.P):
            w = hrev[p, hh * M:(hh + 1) * M]
            ur = ur + Gr[:, 2 * p + hh: 2 * p + hh + n_out] * w
            ui = ui + Gi[:, 2 * p + hh: 2 * p + hh + n_out] * w
        halves_r.append(ur)
        halves_i.append(ui)
    vr = jnp.concatenate(halves_r, axis=-1)[..., ::-1]
    vi = jnp.concatenate(halves_i, axis=-1)[..., ::-1]
    return st, (jnp.sum(vr), jnp.sum(vi))


def chan_only(st, x):
    pfb_st, dm_st = st
    pfb_st, ch = pfb(pfb_st, x)
    return (pfb_st, dm_st), jnp.sum(jnp.real(ch))   # incl corner turn


def chan_demod(st, x):
    pfb_st, dm_st = st
    pfb_st, ch = pfb(pfb_st, x)
    ch2 = ch.reshape(S * K, -1)
    dm_st, audio = demod(dm_st, ch2)
    return (pfb_st, dm_st), jnp.sum(audio)


def full(st, x):
    pfb_st, dm_st = st
    pfb_st, ch = pfb(pfb_st, x)
    ch2 = ch.reshape(S * K, -1)
    dm_st, audio = demod(dm_st, ch2)
    spec = jnp.mean(jnp.abs(ch2) ** 2, axis=-1)
    return (pfb_st, dm_st), (audio, spec)


rng = np.random.default_rng(1)
x = (rng.standard_normal((S, B))
     + 1j * rng.standard_normal((S, B))).astype(np.complex64)
st = (pfb.init_state(S), demod.init_state(S * K))
px = jax.device_put(pack_tree(x))

prev = 0.0
for name, fn in [("identity", lambda st, x: (st, jnp.real(x[:, :8]) * 1.0)),
                 ("poly accumulation", poly_only),
                 ("+ IDFT + rot + corner turn", chan_only),
                 ("+ mixed demod", chan_demod),
                 ("+ spectrum (full)", full)]:
    stepf = make_boundary_step(fn)
    pst = jax.device_put(pack_tree(st))
    ns, out = stepf(pst, px)
    bench._sync(out)
    dt = bench._timed_best(lambda s: stepf(s, px), pst, 12)
    print(f"{name}: {dt*1e3:8.2f} ms  (marginal {1e3*(dt-prev):+7.2f})",
          flush=True)
    prev = dt
