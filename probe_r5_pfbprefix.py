"""Prefix profile of the Pallas-demod PFB pipeline on the real chip:
identity -> poly -> +stage1 -> +demod-kernel, plus the dispatch floor."""
import numpy as np
import bench
bench.enable_compile_cache()
import jax
import jax.numpy as jnp

from quisk_tpu.modes import Mode
from quisk_tpu.ops.channelizer import PFBRxPipeline
from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

OUT = open("/root/repo/probe_r5_pfbprefix.out", "a")
def say(*a):
    print(*a, flush=True)
    print(*a, file=OUT, flush=True)

K, mult = 4096, 8192
B = K * mult
modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
mode_vec = [modes[(4 * i) // K] for i in range(K)]
pipe = PFBRxPipeline.create(K, B, mode_vec, channel_rate=2.0 * 48000.0,
                            pallas_poly=True, pallas_demod=True, TT=64)
rng = np.random.default_rng(1)
x = (rng.standard_normal((1, B))
     + 1j * rng.standard_normal((1, B))).astype(np.complex64)

def upto(stage):
    def fn(st, xx):
        pfb_st, dm_st = st
        if stage == 0:
            return st, jnp.real(xx[:, :8]) * 1.0
        pfb_st, vr, vi = pipe.pfb.poly_ri(pfb_st, xx)
        if stage == 1:
            return (pfb_st, dm_st), jnp.sum(vr[:, ::256, ::512]) + jnp.sum(vi[:, ::256, ::512])
        S, n_out, KK = vr.shape
        K1, K2 = pipe.K1, pipe.K2
        w1x = pipe.kd[0]
        hp = jax.lax.Precision.HIGHEST
        ar = vr.reshape(S, n_out, K1, K2)
        ai = vi.reshape(S, n_out, K1, K2)
        av = jnp.concatenate([ar, ai], axis=-2)
        bb = jnp.einsum("...nk,nc->...ck", av, w1x, precision=hp)
        if stage == 2:
            return (pfb_st, dm_st), jnp.sum(bb[:, ::256, ::8, ::512])
        return pipe((pfb_st, dm_st), xx)
    return fn

prev = None
for stage, name in ((0, "identity/floor"), (1, "poly"), (2, "+stage1"),
                    (3, "+demod kernel (full)")):
    stepf = make_boundary_step(upto(stage))
    pst = jax.device_put(pack_tree(pipe.init_state(1)))
    px = jax.device_put(pack_tree(x))
    ns, out = stepf(pst, px)
    bench._sync(out)
    dt = bench._timed_best(lambda s: stepf(s, px), pst, 12)
    marg = "" if prev is None else f"  (marginal {1e3*(dt-prev):+7.2f})"
    say(f"{name}: {dt*1e3:8.2f} ms{marg}")
    prev = dt
say("prefix done")
