"""Raw-IQ front-end conditioning vs float64 reference oracles.

Covers ops/ewscan.py (blocked-matmul first-order recurrence),
rx/frontend.py (delay / balance / DC removal / inversion — sound.c:143-253,
quisk.c:2442), the RxChain wiring, Radio.set_ampl_phase, and the WDSP
phase rotator (ops/iir.py PhaseRotator, wdsp/iir.c:557-640).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quisk_tpu.ops.ewscan import ew_cumsum
from quisk_tpu.ops.iir import PhaseRotator
from quisk_tpu.rx.frontend import FrontConditioner, balance_matrix, dc_alpha


def _ew_oracle(x, a, y0):
    o = np.zeros(x.shape, np.float64)
    prev = y0.astype(np.float64)
    for n in range(x.shape[1]):
        prev = a * prev + x[:, n]
        o[:, n] = prev
    return o


@pytest.mark.parametrize("C,B,a", [(4, 40960, 0.99954), (2, 2048, 0.7),
                                   (3, 1000, 0.95)])
def test_ew_cumsum_matches_sequential_oracle(C, B, a):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((C, B)).astype(np.float32)
    y0 = rng.standard_normal(C).astype(np.float32)
    got = np.asarray(ew_cumsum(jnp.asarray(x), a, jnp.asarray(y0)))
    o = _ew_oracle(x, a, y0)
    assert np.abs(got - o).max() / np.abs(o).max() < 2e-5


def test_front_conditioner_matches_reference_oracle():
    # delay Q by one sample -> balance(ampl, phase) -> Lyons DC blocker
    # -> conj (inversion), exactly the reference capture-path order
    rng = np.random.default_rng(2)
    C, B, fs = 3, 4096, 48000.0
    ampl, ph, bw = 0.02, 1.5, 100
    x = (rng.standard_normal((C, 8 * B)) + 1j * rng.standard_normal((C, 8 * B))
         ).astype(np.complex64) + (0.3 - 0.2j)

    a = dc_alpha(bw, fs)
    A = 1 / (1 + ampl)
    Cc = -A * np.tan(np.deg2rad(ph))
    D = 1 / np.cos(np.deg2rad(ph))
    re = np.real(x).astype(np.float64)
    im = np.imag(x).astype(np.float64)
    im = np.concatenate([np.zeros((C, 1)), im[:, :-1]], axis=1)
    z = A * re + 1j * (Cc * re + D * im)
    dc = np.zeros(C, complex)
    out = np.zeros_like(z)
    for n in range(z.shape[1]):            # sound.c:246-251 per sample
        c = z[:, n] + dc * a
        out[:, n] = c - dc
        dc = c
    out = np.conj(out)

    fc = FrontConditioner.create(C, fs, ampl=ampl, phase_deg=ph,
                                 invert=True, delay=2, dc_bw=bw)
    st = fc.init_state(C)
    got = []
    for b in range(8):
        st, y = fc(st, jnp.asarray(x[:, b * B:(b + 1) * B]))
        got.append(np.asarray(y))
    got = np.concatenate(got, axis=1)
    assert np.abs(got - out).max() / np.abs(out).max() < 5e-5


def test_front_conditioner_avg_mode_and_key_gate():
    # bw==1: average over 2 s windows after a 1 s key-up delay
    # (sound.c:221-244); key_down resets the accumulator
    rng = np.random.default_rng(3)
    C, B, fs = 2, 4096, 48000.0
    nblk = 40
    x = (rng.standard_normal((C, nblk * B)) +
         1j * rng.standard_normal((C, nblk * B))
         ).astype(np.complex64) + (0.3 - 0.2j)
    fc = FrontConditioner.create(C, fs, dc_bw=1)
    st = fc.init_state(C)
    for b in range(nblk):
        st, y = fc(st, jnp.asarray(x[:, b * B:(b + 1) * B]))
    resid = abs(np.mean(np.asarray(y)))
    assert resid < 0.02, resid
    st2, _ = fc(st, jnp.asarray(x[:, :B]), key_down=True)
    assert int(st2["key_delay"]) == 0 and int(st2["count"]) == 0


def test_balance_trim_restores_image_rejection():
    # an imbalanced front end leaks a mirror image; the matched trim
    # (the inverse 2x2) recovers it.  Parity: the manual adjustment loop
    # of quisk.py bandAmplPhase + sound.c correct_sample.
    C, B, fs = 1, 8192, 48000.0
    t = np.arange(4 * B) / fs
    clean = np.exp(2j * np.pi * 5000.0 * t)[None, :]
    ampl, ph = 0.04, 2.0
    m00, m10, m11 = balance_matrix(ampl, ph, invert=False)
    inv = np.linalg.inv(np.array([[m00, 0.0], [m10, m11]]))
    bad = (inv[0, 0] * clean.real +
           1j * (inv[1, 0] * clean.real + inv[1, 1] * clean.imag)
           ).astype(np.complex64)

    def image_db(sig):
        F = np.abs(np.fft.fft(sig[0] * np.hanning(sig.shape[1]))) ** 2
        f = np.fft.fftfreq(sig.shape[1], 1 / fs)
        want = F[np.abs(f - 5000.0) < 50].sum()
        img = F[np.abs(f + 5000.0) < 50].sum()
        return 10 * np.log10(want / img)

    before = image_db(bad)
    fc = FrontConditioner.create(C, fs, ampl=ampl, phase_deg=ph)
    st = fc.init_state(C)
    _, y = fc(st, jnp.asarray(bad))
    after = image_db(np.asarray(y)[None, 0])
    assert before < 40 and after > 70, (before, after)


def test_chain_front_cond_dc_and_inversion():
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx.chain import RxChain, RxChainConfig

    fs = 192000.0
    cfg = RxChainConfig(sample_rate=fs, channels=2, front_cond=True,
                        dc_remove_bw=100)
    chain = RxChain.create(cfg, tune_hz=5000.0, mode=Mode.USB)
    # inversion flips the spectrum: a tone at -4 kHz lands at +4 kHz
    chain = chain.replace(cond=chain.cond.with_balance(0, 0, invert=True))
    B = chain.block_in
    t = np.arange(2 * B) / fs
    x = np.broadcast_to(
        0.5 + 0.5j + np.exp(-2j * np.pi * 6000.0 * t), (2, 2 * B)
    ).astype(np.complex64)       # big DC offset + LOWER-side tone
    st = chain.init_state()
    for b in range(2):
        st, audio = chain.step(st, jnp.asarray(x[:, b * B:(b + 1) * B]))
    a = np.asarray(audio)[0]
    F = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    fr = np.fft.rfftfreq(len(a), 1 / chain.fs_audio)
    # inverted tone sits at +6k, tuned to 5k -> 1 kHz audio, in passband
    tone = F[np.abs(fr - 1000.0) < 60].sum()
    rest = F[np.abs(fr - 1000.0) >= 60].sum()
    assert tone > 10 * rest, (tone, rest)


def test_radio_set_ampl_phase_and_hw_invert(tmp_path):
    from quisk_tpu.app.config import RadioConfig, Settings
    from quisk_tpu.app.radio import Radio

    s = Settings(tmp_path / "s.json")
    cfg = RadioConfig(sample_rate=48000.0, tune_hz=7000.0, front_cond=True)
    r = Radio(cfg, hardware="sim", settings=s, rigctl_port=None)
    assert r.chain.cond is not None
    r.set_ampl_phase(0.03, -1.0)
    m00, m10, m11 = balance_matrix(0.03, -1.0, invert=False)
    assert np.allclose(float(r.chain.cond.m00[0, 0]), m00)
    assert s.get_state()["ampl_phase"] == [0.03, -1.0]
    r.open()
    audio = r.run(blocks=2)
    assert np.all(np.isfinite(audio))
    r.close()
    # a fresh Radio restores the persisted trim
    r2 = Radio(RadioConfig(sample_rate=48000.0, front_cond=True),
               hardware="sim", settings=s, rigctl_port=None)
    assert np.allclose(float(r2.chain.cond.m10[0, 0]), m10)

    # hardware plugins can demand inversion (hw/sdr8600.py)
    class InvHw:
        invert_spectrum = True

        def __init__(self, cfg):
            from quisk_tpu.hw.base import get_hardware
            self._h = get_hardware("sim")(cfg)

        def __getattr__(self, k):
            return getattr(self._h, k)

    cfg3 = RadioConfig(sample_rate=48000.0)
    r3 = Radio(cfg3, hardware=InvHw(cfg3), rigctl_port=None)
    assert r3.chain.cond is not None
    assert float(r3.chain.cond.m11[0, 0]) == -1.0


def test_phase_rotator_matches_wdsp_oracle():
    pr = PhaseRotator.create()       # 338 Hz, 8 stages, 48 k (TXA.c:71-78)
    C, B = 3, 512
    rng = np.random.default_rng(0)
    x = rng.standard_normal((C, 24 * B)).astype(np.float32)
    b0 = float(pr.b0)
    y = x.astype(np.float64).copy()
    for n in range(8):               # xphrot hot loop (iir.c:609-640)
        x1 = y.copy()
        out = np.zeros_like(y)
        xm1 = np.concatenate([np.zeros((C, 1)), x1[:, :-1]], axis=1)
        for k in range(y.shape[1]):
            out[:, k] = (b0 * x1[:, k] + xm1[:, k]
                         - b0 * (out[:, k - 1] if k else 0.0))
        y = out
    st = pr.init_state(C)
    outs = []
    for b in range(24):
        st, yb = pr(st, jnp.asarray(x[:, b * B:(b + 1) * B]))
        outs.append(np.asarray(yb))
    got = np.concatenate(outs, axis=1)
    assert np.abs(got - y).max() / np.abs(y).max() < 1e-4
    # allpass: power preserved
    assert abs((got ** 2).mean() / (x ** 2).mean() - 1.0) < 0.01


def test_tx_phrot_reduces_peak_to_average():
    from quisk_tpu.tx.chain import TxChain, TxChainConfig

    # harmonic-phase-aligned "speech" has a nasty crest factor; the
    # rotator disperses it (why WDSP runs phrot before the compressor)
    fs, B = 48000.0, 2048
    t = np.arange(8 * B) / fs
    a = sum(np.sin(2 * np.pi * 150.0 * k * t) / k for k in range(1, 12))
    a = (a / np.abs(a).max()).astype(np.float32)[None, :]

    def crest(cfg):
        tx = TxChain.create(cfg, mode=2)     # USB
        st = tx.init_state()
        outs = []
        for b in range(8):
            st, iq = tx.step(st, jnp.asarray(a[:, b * B:(b + 1) * B]))
            outs.append(np.abs(np.asarray(iq)))
        env = np.concatenate(outs, axis=1)[0][2 * B:]
        return env.max() / np.sqrt((env ** 2).mean())

    base = crest(TxChainConfig(channels=1, alc=False))
    rot = crest(TxChainConfig(channels=1, alc=False, phase_rotator=True))
    assert rot < base * 0.9, (base, rot)


@pytest.mark.slow
def test_front_cond_sharded_matches_unsharded():
    # the conditioner is per-channel elementwise + time-axis matmuls, so
    # channel sharding must be exact; compare a sharded front_cond+dc run
    # against the unsharded chain on the 8-device CPU mesh
    import jax

    from quisk_tpu.modes import Mode
    from quisk_tpu.parallel import make_mesh, shard_over_channels
    from quisk_tpu.parallel.multihost import make_global_iq
    from quisk_tpu.rx.chain import RxChain, RxChainConfig

    FS = 192000.0
    C, nblk = 16, 3
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=256,
                        agc=False, front_cond=True, dc_remove_bw=200)
    chain = RxChain.create(cfg, tune_hz=8000.0, mode=Mode.USB)
    chain = chain.replace(cond=chain.cond.with_balance(0.03, 1.0,
                                                       invert=False))
    rng = np.random.default_rng(5)
    n = nblk * chain.block_in
    iq = ((rng.standard_normal((C, n)) + 1j * rng.standard_normal((C, n)))
          .astype(np.complex64) + (0.1 - 0.05j))

    st = chain.init_state()
    ref = []
    for i in range(nblk):
        st, a = chain.step(st, jnp.asarray(
            iq[:, i * chain.block_in:(i + 1) * chain.block_in]))
        ref.append(np.asarray(a))
    ref = np.concatenate(ref, axis=-1)

    mesh = make_mesh()
    chain_s = shard_over_channels(chain, mesh, C)
    state_s = shard_over_channels(chain.init_state(), mesh, C)

    @jax.jit
    def step(ch, s, xx):
        return ch.step(s, xx)

    outs = []
    for i in range(nblk):
        x = make_global_iq(np.ascontiguousarray(
            iq[:, i * chain.block_in:(i + 1) * chain.block_in]), mesh)
        state_s, a = step(chain_s, state_s, x)
        outs.append(np.asarray(a))
    got = np.concatenate(outs, axis=-1)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12)
    assert err < 1e-5, err


def test_tx_ampl_phase_trim_precompensates_image():
    # the is_tx=1 arm of quisk_set_ampl_phase (sound.c:735-741): the trim
    # runs on the OUTGOING IQ so a sound-card imbalance downstream is
    # pre-compensated; model the card as the inverse 2x2 and check the
    # radiated image vanishes
    from quisk_tpu.tx.chain import TxChain, TxChainConfig

    fs, B = 48000.0, 2048
    tx = TxChain.create(TxChainConfig(channels=1, alc=False), mode=2)  # USB
    t = np.arange(8 * B) / fs
    a = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    ampl, ph = 0.05, 2.0
    m00, m10, m11 = balance_matrix(ampl, ph, invert=False)
    card = np.linalg.inv(np.array([[m00, 0.0], [m10, m11]]))

    def radiated_image_db(chain):
        st = chain.init_state()
        outs = []
        for b in range(8):
            st, iq = chain.step(st, jnp.asarray(a[:, b * B:(b + 1) * B]))
            outs.append(np.asarray(iq))
        iq = np.concatenate(outs, axis=1)[0][2 * B:]
        re, im = np.real(iq), np.imag(iq)
        out = card[0, 0] * re + 1j * (card[1, 0] * re + card[1, 1] * im)
        F = np.abs(np.fft.fft(out * np.hanning(len(out)))) ** 2
        f = np.fft.fftfreq(len(out), 1 / fs)
        # the chain's baseband convention puts USB audio at -f; the
        # unwanted image is the +f mirror
        want = F[np.abs(f + 1000.0) < 40].sum()
        img = F[np.abs(f - 1000.0) < 40].sum()
        return 10 * np.log10(want / img)

    before = radiated_image_db(tx)
    after = radiated_image_db(tx.set_ampl_phase(ampl, ph))
    assert before < 45 and after > before + 25, (before, after)
