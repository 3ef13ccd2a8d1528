"""Campaign 3: Pallas fused IDFT+demod PFB on the real chip (TT sweep),
after the dynamic_slice fix."""
import numpy as np
import bench
bench.enable_compile_cache()
import jax

from quisk_tpu.modes import Mode
from quisk_tpu.ops.channelizer import PFBRxPipeline
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

OUT = open("/root/repo/probe_r5_campaign4.out", "a")
def say(*a):
    print(*a, flush=True)
    print(*a, file=OUT, flush=True)

K, mult = 4096, 8192
B = K * mult
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
mode_vec = [modes[(4 * i) // K] for i in range(K)]
rng = np.random.default_rng(1)
x = (rng.standard_normal((1, B))
     + 1j * rng.standard_normal((1, B))).astype(np.complex64)

for TT in (64,):
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
        say(f"TT={TT} FAIL: {str(e).splitlines()[0][:160]}")
say("campaign3 done")
