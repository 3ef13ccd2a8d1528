"""Numerical conformance: the composed TPU chain against the float64
oracle built from the chain's OWN designed filters — a tight SNR bound
(the BASELINE accuracy criterion: output matches the reference-derived
oracle within the float32 error budget, not just 'sounds right')."""

import numpy as np

from quisk_tpu.modes import Mode
from quisk_tpu.oracle import dsp
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 960000.0


def _oracle_chain(chain, iq: np.ndarray, tune_hz: float) -> np.ndarray:
    """float64 reference using the chain's exact taps/masks."""
    x = dsp.mix_down(iq.astype(np.complex128), tune_hz, FS)
    for st in chain.stages:
        _, x = dsp.fir_stream(x, np.asarray(st.taps, np.float64),
                              decim=st.decim)
    # channel filter: recover taps from the OLS mask
    mask = np.asarray(chain.bp.mask)
    h_full = np.fft.ifft(mask[0] if mask.ndim == 2 else mask)
    h = h_full[: chain.bp.ntaps]
    _, x = dsp.fir_stream(x, h.astype(np.complex128))
    return dsp.ssb_demod(x)


def test_chain_matches_float64_oracle_tightly():
    cfg = RxChainConfig(sample_rate=FS, channels=1, audio_block=2048,
                        agc=False)
    tune = 123456.0
    chain = RxChain.create(cfg, tune_hz=tune, mode=int(Mode.USB))
    # MatmulFIR stages expose .M not .taps — rebuild taps from M's first
    # column (h reversed at row offset 0)
    class _St:
        pass
    stages = []
    for s in chain.stages:
        st = _St()
        if hasattr(s, "taps"):
            st.taps = np.asarray(s.taps)
        elif hasattr(s, "Mg"):
            # HalfbandFIR: odd taps in Mg's first column (reversed), zeros
            # at even offsets, center tap separate
            T = s.ntaps
            c = T // 2
            taps = np.zeros(T)
            taps[1::2] = np.asarray(s.Mg)[:c, 0][::-1]
            taps[c] = float(s.center)
            st.taps = taps
        else:
            T = s.ntaps
            st.taps = np.asarray(s.M)[:T, 0][::-1]
        st.decim = s.decim
        stages.append(st)
    chain_view = _St()
    chain_view.stages = stages
    chain_view.bp = chain.bp

    rng = np.random.default_rng(0)
    nblk = 4
    iq = (rng.standard_normal(nblk * chain.block_in)
          + 1j * rng.standard_normal(nblk * chain.block_in)
          ).astype(np.complex64)

    ref = _oracle_chain(chain_view, iq, tune)

    st = chain.init_state()
    outs = []
    B = chain.block_in
    for i in range(nblk):
        st, a = chain.step(st, iq[None, i * B:(i + 1) * B])
        outs.append(np.asarray(a))
    audio = np.concatenate(outs, axis=-1)[0]

    n = min(len(audio), len(ref))
    err = audio[:n] - ref[:n]
    snr = 10 * np.log10(np.mean(ref[:n] ** 2) / np.mean(err ** 2))
    # float32 arithmetic through 3 decimators + 1025-tap OLS filter:
    # the error budget leaves > 80 dB
    assert snr > 80.0, snr
