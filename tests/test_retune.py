"""Click-free retune: crossfaded masks and data-only chain retuning."""

import numpy as np
import jax
import jax.numpy as jnp

from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.ops import design
from quisk_tpu.ops.fir import OverlapSaveFIR
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 48000.0
B = 2048


def test_crossfade_retune_avoids_click():
    t1 = design.bandpass_analytic(257, 300.0, 3100.0, FS)
    t2 = design.bandpass_analytic(257, 300.0, 800.0, FS)   # much narrower
    op = OverlapSaveFIR.create(t1, B)
    n = 12 * B
    t = np.arange(n) / FS
    x = np.exp(2j * np.pi * 2000.0 * t).astype(np.complex64)[None]

    def run(plan):
        st = op.init_state(1)
        cur = op
        outs = []
        for i in range(12):
            if i in plan:
                cur = plan[i]
            st, y = cur(st, x[:, i * B:(i + 1) * B])
            outs.append(np.asarray(y))
        return 2.0 * np.real(np.concatenate(outs, axis=-1)[0])

    # instant switch at block 6 vs 4-block crossfade starting at block 6
    inst = run({6: op.retuned(t2)})
    steps = op.retune_crossfade(t2, nblocks=4)
    fade = run({6 + k: s for k, s in enumerate(steps)})

    # both end with the tone removed (2 kHz outside 300-800)
    assert np.sqrt(np.mean(inst[-2 * B:] ** 2)) < 0.02
    assert np.sqrt(np.mean(fade[-2 * B:] ** 2)) < 0.02
    # the crossfade's energy trajectory is smooth: frame-RMS envelope
    # steps far less per frame than the instant switch's
    def max_rms_step(a):
        seg = a[5 * B: 12 * B]
        rms = np.sqrt(np.mean(seg.reshape(-1, 128) ** 2, axis=1))
        return np.max(np.abs(np.diff(rms)))

    assert max_rms_step(fade) < 0.35 * max_rms_step(inst), \
        (max_rms_step(fade), max_rms_step(inst))


def test_chain_retune_is_data_only():
    cfg = RxChainConfig(sample_rate=FS, channels=2, audio_block=2048,
                        agc=False)
    chain = RxChain.create(cfg, tune_hz=1000.0, mode=int(Mode.USB))
    st = chain.init_state()
    x = sources.ssb_signal(
        sources.voice_like(FS, 4 * B), FS,
        carrier_hz=5000.0)[None].astype(np.complex64)
    x = np.concatenate([x, x], axis=0)

    step = jax.jit(lambda ch, s, xx: ch.step(s, xx))
    st, a1 = step(chain, st, jnp.asarray(x[:, :B]))
    st, a1b = step(chain, st, jnp.asarray(x[:, :B]))
    baseline_cache = step._cache_size()   # state leaves settled on device

    # retune to the signal's carrier; the same compiled program must serve
    chain2 = chain.retune(cfg, tune_hz=5000.0)
    st, a2 = step(chain2, st, jnp.asarray(x[:, B:2 * B]))
    st, a3 = step(chain2, st, jnp.asarray(x[:, 2 * B:3 * B]))
    assert step._cache_size() == baseline_cache
    # tuned-in audio has far more energy than the mistuned first block
    assert float(jnp.mean(a3 ** 2)) > 5.0 * float(jnp.mean(a1 ** 2))
    # mode retune also data-only
    chain3 = chain2.retune(cfg, mode=int(Mode.AM))
    st, _ = step(chain3, st, jnp.asarray(x[:, 3 * B:4 * B]))
    assert step._cache_size() == baseline_cache
