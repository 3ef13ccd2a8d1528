"""Round-5 TPU campaign 2:
1. Pallas fused IDFT+demod PFB at TT=64 vs TT=128 (+ bench_pfb fused).
2. Honest featured-chain NB marginal: all-on vs all-minus-NB, same
   window (campaign 1 disproved the TN-switch theory: TN2 17.1 vs TN4
   17.4 ms within noise)."""
import json

import numpy as np

import bench

bench.enable_compile_cache()

import jax
import jax.numpy as jnp

OUT = open("/root/repo/probe_r5_campaign2.out", "a")


def say(*a):
    print(*a, flush=True)
    print(*a, file=OUT, flush=True)


say("=== Pallas fused PFB (TT sweep) ===")
from quisk_tpu.modes import Mode
from quisk_tpu.ops.channelizer import PFBRxPipeline
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

K, mult = 4096, 8192
B = K * mult
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
mode_vec = [modes[(4 * i) // K] for i in range(K)]
rng = np.random.default_rng(1)
x = (rng.standard_normal((1, B))
     + 1j * rng.standard_normal((1, B))).astype(np.complex64)

for TT in (64, 128):
    try:
        pipe = PFBRxPipeline.create(K, B, mode_vec,
                                    channel_rate=2.0 * 48000.0,
                                    pallas_poly=True, pallas_demod=True,
                                    TT=TT)
        stepf = make_boundary_step(lambda st, xx: pipe(st, xx))
        pst = jax.device_put(pack_tree(pipe.init_state(1)))
        px = jax.device_put(pack_tree(x))
        ns, out = stepf(pst, px)
        bench._sync(out)
        dt = bench._timed_best(lambda s: stepf(s, px), pst, 12)
        say(f"TT={TT}: {dt*1e3:.2f} ms/block = {B/dt/1e6:.1f} Msps")
    except Exception as e:
        say(f"TT={TT} FAIL: {str(e).splitlines()[0][:140]}")

say("=== featured: NB marginal (same window) ===")
from quisk_tpu.rx import RxChain, RxChainConfig

def timed_feat(nb: int, iters=12, nblk=8):
    C, FS = 1024, 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fused_frontend=True, noise_blanker=nb,
                        auto_notch=True, nr=True, anf=True, squelch=True,
                        fm_squelch=True)
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + .5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)])
    xx = (rng.standard_normal((C, nblk * chain.block_in))
          + 1j * rng.standard_normal((C, nblk * chain.block_in))
          ).astype(np.complex64)
    step = make_boundary_step(lambda ch, st, v: ch.step_blocks(st, v, nblk))
    pc = jax.device_put(pack_tree(chain))
    ps = jax.device_put(pack_tree(chain.init_state()))
    pxx = jax.device_put(pack_tree(xx))
    _, audio = step(pc, ps, pxx)
    bench._sync(audio)
    dt = bench._timed_best(lambda st: step(pc, st, pxx), ps, iters)
    return dt / nblk

for nb in (2, 0, 2):       # repeat NB-on to bracket window drift
    ms = timed_feat(nb) * 1e3
    say(f"featured nb={nb}: {ms:.3f} ms/block")
say("campaign2 done")
