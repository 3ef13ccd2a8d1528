"""Optional TX stages (CESSB, predistorter slot) wired into TxChain."""

import numpy as np

from quisk_tpu.modes import Mode
from quisk_tpu.io import sources
from quisk_tpu.tx import TxChain, TxChainConfig

FS = 48000.0


def test_tx_chain_with_cessb_bounds_envelope():
    tx = TxChain.create(TxChainConfig(channels=1, compress_db=14.0,
                                      cessb=True, alc=False),
                        mode=int(Mode.USB))
    n = 16 * tx.block
    voice = sources.voice_like(FS, n).astype(np.float32)
    voice = (2.5 * voice / np.max(np.abs(voice)))[None]
    st = tx.init_state()
    outs = []
    for i in range(16):
        st, iq = tx.step(st, voice[:, i * tx.block:(i + 1) * tx.block])
        outs.append(np.asarray(iq))
    iq = np.concatenate(outs, axis=-1)[0]
    env = np.abs(iq[4 * tx.block:])
    assert np.max(env) < 1.15, np.max(env)
    assert np.sqrt(np.mean(env ** 2)) > 0.05


def test_tx_chain_predistort_slot_identity():
    tx = TxChain.create(TxChainConfig(channels=1, predistort=True),
                        mode=int(Mode.USB))
    tx0 = TxChain.create(TxChainConfig(channels=1), mode=int(Mode.USB))
    n = 4 * tx.block
    voice = 0.3 * sources.voice_like(FS, n).astype(np.float32)[None]
    st, st0 = tx.init_state(), tx0.init_state()
    for i in range(4):
        blk = voice[:, i * tx.block:(i + 1) * tx.block]
        st, a = tx.step(st, blk)
        st0, b = tx0.step(st0, blk)
    # identity predistorter changes nothing
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
