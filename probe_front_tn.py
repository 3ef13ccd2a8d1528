"""A/B the fused-front TN (tile) choice now that the kernel runs with a
48 MB vmem limit: larger TN cuts the per-tile window halo (T-1 extra
samples per tile DMA) on the DMA-bound front.  Flagship (no NB) and the
featured NB-fused front, whole-chain, 8 blocks/dispatch.
"""
import numpy as np

import bench

bench.enable_compile_cache()

import jax

import quisk_tpu.ops.pallas_kernels as pk
from quisk_tpu.modes import Mode
from quisk_tpu.rx import RxChain, RxChainConfig
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

_orig_create = pk.FusedTuneDecimate.create.__func__
_budget = [None]


def _patched(cls, *a, **k):
    if _budget[0] is not None:
        k.setdefault("vmem_budget", _budget[0])
    return _orig_create(cls, *a, **k)


pk.FusedTuneDecimate.create = classmethod(_patched)


def timed_chain(nb: bool, budget, iters=16, nblk=8):
    _budget[0] = budget
    C, FS = 1024, 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fused_frontend=True,
                        **(dict(noise_blanker=2, auto_notch=True, nr=True,
                                anf=True, squelch=True, fm_squelch=True)
                           if nb else {}))
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=[int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)][0])
    tn = chain.front.TN if chain.front is not None else None
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, nblk * chain.block_in))
         + 1j * rng.standard_normal((C, nblk * chain.block_in))
         ).astype(np.complex64)
    step = make_boundary_step(lambda ch, st, xx: ch.step_blocks(st, xx, nblk))
    pchain = jax.device_put(pack_tree(chain))
    pstate = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))
    cur, audio = step(pchain, pstate, px)
    bench._sync(audio)
    dt = bench._timed_best(lambda st: step(pchain, st, px), pstate, iters)
    return tn, dt / nblk


if __name__ == "__main__":
    for nb, budgets in ((False, [None, 20 << 20, 28 << 20, 45 << 20]),
                        (True, [None, 20 << 20, 28 << 20])):
        for b in budgets:
            try:
                tn, ms = timed_chain(nb, b)
                print(f"nb={nb} budget={'dflt' if b is None else b >> 20}MB "
                      f"-> TN={tn}: {ms*1e3:.3f} ms/block", flush=True)
            except Exception as e:
                print(f"nb={nb} budget={b and b >> 20}MB FAIL: "
                      f"{str(e).splitlines()[0][:110]}", flush=True)
