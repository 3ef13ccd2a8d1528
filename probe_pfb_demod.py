"""Prefix-differenced per-family profile of the PFB demod stage.

bench_pfb's GroupedDemod at channelizer shape ([4096, 16384], mode
quarters USB/LSB/AM/FM -> runs ssb[0:2048], am[2048:3072],
fm[3072:4096]) is ~21 ms of the 38 ms PFB window.  This probe times
each family's marginal cost on the real TPU with small standalone
programs: identity -> +ssb -> +am -> +fm -> +spectrum, plus isolated
sub-steps of the FM discriminator (the arctan2 is the only
transcendental at full rate).  Run on the real TPU.
"""
import numpy as np

import bench

bench.enable_compile_cache()

import jax
import jax.numpy as jnp

from quisk_tpu.modes import Mode
from quisk_tpu.ops.demod import GroupedDemod
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

K, N = 4096, 16384
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
dm = GroupedDemod.create([modes[(4 * i) // K] for i in range(K)],
                         sample_rate=2.0 * 48000.0, channels=K)
runs = dm.runs
print("runs:", runs, flush=True)

rng = np.random.default_rng(1)
x = (rng.standard_normal((K, N)) + 1j * rng.standard_normal((K, N))
     ).astype(np.complex64)
st = dm.init_state(K)


def upto(n_runs, spec=False):
    def fn(state, xx):
        new_states, outs = [], []
        for st_i, (f, lo, hi) in list(zip(state, runs))[:n_runs]:
            st_i, a = getattr(dm, f)(st_i, xx[lo:hi])
            new_states.append(st_i)
            outs.append(jnp.sum(a))
        tot = sum(outs) if outs else jnp.float32(0.0)
        if spec:
            tot = tot + jnp.sum(jnp.mean(jnp.abs(xx) ** 2, axis=-1))
        return tuple(new_states) + tuple(state[n_runs:]), tot
    return fn


def fm_disc_only(state, xx):
    # discriminator without the de-emphasis IIR (isolate arctan2 cost)
    f, lo, hi = runs[-1]
    prev, y_prev = state[-1]
    prev, disc = dm.fm.discriminate(prev, xx[lo:hi])
    return state, jnp.sum(disc)


def fm_mag_only(state, xx):
    # same memory traffic AND shape as the discriminator (prev-sample
    # concat, full N columns), no arctan2 — mirrors discriminate exactly
    # so the A/B isolates only the transcendental
    f, lo, hi = runs[-1]
    prev, _ = state[-1]
    xs = xx[lo:hi]
    xm1 = jnp.concatenate([prev[:, None], xs[:, :-1]], axis=-1)
    d = xs * jnp.conj(xm1)
    return state, jnp.sum(jnp.real(d)) + jnp.sum(jnp.imag(d))


cases = [("identity", upto(0)),
         ("+ ssb [2048ch]", upto(1)),
         ("+ am (env + chunked DC IIR) [1024ch]", upto(2)),
         ("+ fm (disc + chunked deemph) [1024ch]", upto(3)),
         ("+ spectrum (mean |x|^2, full batch)", upto(3, spec=True)),
         ("fm disc only (arctan2) [1024ch]", fm_disc_only),
         ("fm complex-diff only (no arctan2) [1024ch]", fm_mag_only)]

px = jax.device_put(pack_tree(x))
prev_dt = None
for name, fn in cases:
    stepf = make_boundary_step(fn)
    pst = jax.device_put(pack_tree(st))
    ns, out = stepf(pst, px)
    bench._sync(out)
    dt = bench._timed_best(lambda s: stepf(s, px), pst, 12)
    marg = "" if prev_dt is None or name.startswith("fm ") else \
        f"  (marginal {1e3 * (dt - prev_dt):+7.2f})"
    print(f"{name}: {dt * 1e3:8.2f} ms{marg}", flush=True)
    if not name.startswith("fm "):
        prev_dt = dt
