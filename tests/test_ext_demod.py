"""Custom EXT demodulator plugin (extdemod.c parity)."""

import numpy as np
import jax.numpy as jnp
from flax import struct

from quisk_tpu.io import sources
from quisk_tpu.modes import Mode
from quisk_tpu.ops.demod import register_ext_demod
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 48000.0


@struct.dataclass
class MagDemod:
    """Toy custom demod: audio = |x| - 1 (envelope minus carrier)."""

    @classmethod
    def factory(cls, sample_rate, channels):
        return cls()

    def init_state(self, channels):
        return ()

    def __call__(self, state, x):
        return state, jnp.abs(x) - 1.0


def test_ext_demod_registry_and_chain():
    register_ext_demod("mag", MagDemod.factory)
    cfg = RxChainConfig(sample_rate=FS, channels=2, audio_block=2048,
                        agc=False, ext_demod="mag")
    chain = RxChain.create(cfg, tune_hz=0.0,
                           mode=[int(Mode.EXT), int(Mode.USB)],
                           bandwidth_hz=[8000.0, 2800.0])
    n = 8 * chain.block_in
    t = np.arange(n) / FS
    audio_t = 0.5 * np.sin(2 * np.pi * 400.0 * t)
    iq = sources.am_signal(audio_t, FS, depth=1.0)     # AM: |x| tracks audio
    x = np.stack([iq, iq]).astype(np.complex64)
    st = chain.init_state()
    outs = []
    for i in range(8):
        st, a = chain.step(st, x[:, i * chain.block_in:(i + 1) * chain.block_in])
        outs.append(np.asarray(a))
    a = np.concatenate(outs, axis=-1)
    seg = slice(4 * chain.block_audio, 8 * chain.block_audio)
    # channel 0 (EXT): envelope demod recovers the 400 Hz audio as the
    # dominant spectral line (group delay of the channel filter makes a
    # direct correlation meaningless)
    A = np.abs(np.fft.rfft(a[0][seg]))
    f = np.fft.rfftfreq(seg.stop - seg.start, 1 / chain.fs_audio)
    k400 = np.argmin(np.abs(f - 400.0))
    others = A[(f > 20.0) & (np.abs(f - 400.0) > 50.0)]
    assert A[k400 - 1:k400 + 2].max() > 10.0 * others.max()
    # channel 1 (USB) produced something different from channel 0
    assert not np.allclose(a[0][seg], a[1][seg])
