"""Conformance of the TPU WcpAGC / TxALC scans against float64 oracles of
the reference algorithms (wdsp/wcpAGC.c xwcpagc; microphone.c:270
process_alc)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # f64-oracle conformance scans

from quisk_tpu.modes import Mode
from quisk_tpu.ops.agc import TxALC, WcpAGC
from quisk_tpu.oracle.wcpagc import WcpParams, alc_oracle, wcpagc_oracle

FS = 48000.0
B = 1024


def _burst_signal(n, amp=0.5, seed=0):
    """Tone bursts with silence gaps — exercises attack, hang and decay."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    x = amp * np.sin(2 * np.pi * 700.0 * t)
    gate = ((t % 0.4) < 0.22).astype(np.float64)
    x = x * gate + 1e-4 * rng.standard_normal(n)
    x[int(0.9 * n):] *= 0.05          # level drop at the end
    return x


def _stream(op, st, x2d):
    outs = []
    for i in range(x2d.shape[1] // B):
        st, y = op(st, x2d[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    return st, np.concatenate(outs, axis=-1)


def test_wcpagc_matches_oracle():
    n = 16 * B
    x = _burst_signal(n)
    ref, volts, _states = wcpagc_oracle(x, WcpParams())
    agc = WcpAGC.create(FS)
    st, got = _stream(agc, agc.init_state(1), x[None].astype(np.float32))
    got = got[0]
    err = np.abs(got - ref)
    # float32 scan vs float64 oracle: trajectories must agree closely
    denom = np.abs(ref).max()
    assert err.max() / denom < 2e-2, err.max() / denom
    assert np.corrcoef(got[B:], ref[B:])[0, 1] > 0.9999


def test_wcpagc_hang_holds_gain():
    """After a strong burst ends, volts must HOLD for ~hangtime before
    decaying (the 5-state machine's hang), not recover immediately."""
    agc = WcpAGC.create(FS, hang_thresh=0.1, hangtime=0.25)
    n = 48 * B
    t = np.arange(n) / FS
    x = 0.8 * np.sin(2 * np.pi * 700.0 * t) * (t < 0.25) + 1e-5
    ref, volts, _states = wcpagc_oracle(
        x, WcpParams(hang_thresh=0.1, hangtime=0.25))
    # oracle sanity: volts stays within 1% for ~200 ms after the burst
    i0 = int(0.26 * FS)
    i1 = int(0.44 * FS)
    assert volts[i1] > 0.95 * volts[i0]
    i2 = int(0.80 * FS)
    assert volts[i2] < 0.5 * volts[i0]       # then decays
    st, got = _stream(agc, agc.init_state(1), x[None].astype(np.float32))
    assert np.corrcoef(got[0][B:], ref[B:])[0, 1] > 0.999


def test_wcpagc_state_trajectory_matches_oracle():
    """Pin the TPU scan to the machine's INTERNAL trajectory: the oracle
    must walk the expected state sequence on a hang fixture (attack ->
    hang -> hang-decay), and the TPU implementation's carried volts AND
    state must track the oracle at every block boundary — a 2% output
    tolerance alone could hide a wrong hang transition (VERDICT r2 #8)."""
    p = WcpParams(hang_thresh=0.1, hangtime=0.25)
    agc = WcpAGC.create(FS, hang_thresh=0.1, hangtime=0.25)
    n = 48 * B
    t = np.arange(n) / FS
    x = 0.8 * np.sin(2 * np.pi * 700.0 * t) * (t < 0.25) + 1e-5
    ref, volts, states = wcpagc_oracle(x, p)

    # oracle state sequence on this fixture is explicit: during the burst
    # the machine cycles attack/fast/hang with the sine envelope but NEVER
    # decays (0/1/2 only); HANG(2) holds after the burst ends; HANG-DECAY
    # (4) takes over once hangtime expires
    burst = states[int(0.05 * FS): int(0.24 * FS)]
    assert np.all(burst <= 2), np.bincount(burst)
    assert np.mean(burst == 0) > 0.3, np.bincount(burst)
    hang = states[int(0.27 * FS): int(0.44 * FS)]
    assert np.all(hang == 2), np.unique(hang)
    tail = states[int(0.60 * FS): int(0.90 * FS)]
    assert np.all(tail == 4), np.unique(tail)

    # block-boundary checkpoints: carried volts within 1% of the oracle
    # trace, carried state equal at (nearly) every checkpoint
    st = agc.init_state(1)
    x32 = x[None].astype(np.float32)
    v_err = []
    s_match = []
    for i in range(n // B):
        st, _ = agc(st, x32[:, i * B:(i + 1) * B])
        k = (i + 1) * B - 1
        v_err.append(abs(float(st["volts"][0]) - volts[k])
                     / max(volts[k], 1e-12))
        s_match.append(int(st["state"][0]) == int(states[k]))
    assert max(v_err) < 1e-2, max(v_err)
    # state may differ only at a boundary that lands mid-transition
    assert np.mean(s_match) > 0.9, (s_match, [int(s) for s in states[B-1::B]])


def test_txalc_matches_oracle():
    n = 12 * B
    rng = np.random.default_rng(2)
    x = 0.2 * rng.standard_normal(n)
    x[2 * B:4 * B] *= 8.0                     # overdriven segment
    modes = np.full(n, int(Mode.USB))
    ref, gtrace = alc_oracle(x, modes, FS)
    alc = TxALC.create(FS, mode=int(Mode.USB), channels=1)
    st, got = _stream(alc, alc.init_state(1), x[None].astype(np.float32))
    err = np.abs(got[0] - ref)
    assert err.max() / (np.abs(ref).max() + 1e-9) < 2e-2, err.max()
    # the overdrive was actually limited
    assert np.abs(got[0][3 * B:4 * B]).max() < 1.05


def test_txalc_matches_oracle_complex_ssb():
    """TxALC conformance on COMPLEX SSB IQ, not just real envelopes: the
    reference's process_alc runs on the modulated complex samples
    (microphone.c:270, magn = cabs) — two-tone analytic audio with an
    overdriven stretch must track the float64 oracle in both I and Q
    (VERDICT r2 #8)."""
    n = 12 * B
    t = np.arange(n) / FS
    # analytic two-tone (the standard SSB test signal): |x| beats 0..0.4
    x = 0.2 * (np.exp(2j * np.pi * 700.0 * t) + np.exp(2j * np.pi * 1900.0 * t))
    x[3 * B:5 * B] *= 7.0                     # overdriven segment
    x = x.astype(np.complex128)
    modes = np.full(n, int(Mode.USB))
    ref, gtrace = alc_oracle(x, modes, FS)
    alc = TxALC.create(FS, mode=int(Mode.USB), channels=1)
    st, got = _stream(alc, alc.init_state(1), x[None].astype(np.complex64))
    err = np.abs(got[0] - ref)
    assert err.max() / np.abs(ref).max() < 2e-2, err.max() / np.abs(ref).max()
    # the overdrive is limited on the complex ENVELOPE
    assert np.abs(got[0][4 * B:5 * B]).max() < 1.05


def test_txalc_per_mode_gain_memory():
    """Reference keeps gain_now[rx_mode]: overdriving USB must not change
    the FM gain, and returning to USB restores the reduced gain."""
    alc = TxALC.create(FS, mode=int(Mode.USB), channels=1)
    st = alc.init_state(1)
    loud = np.full((1, 4 * B), 2.5, np.float32)
    st, _ = _stream(alc, st, loud)
    g_usb = float(st["gain_now"][0, int(Mode.USB)])
    assert g_usb < 0.5                        # pulled down hard
    assert float(st["gain_now"][0, int(Mode.FM)]) == 1.0   # untouched
    # switch to FM: unity gain applies
    alc_fm = alc.replace(mode=alc.mode * 0 + int(Mode.FM))
    st, out = alc_fm(st, np.full((1, B), 0.1, np.float32))
    tail = np.asarray(out)[0, alc.buf:]
    assert np.allclose(tail, 0.1, atol=0.02)
    # back to USB: remembered gain applies (well below unity)
    st2, out2 = alc(st, np.full((1, B), 0.1, np.float32))
    tail2 = np.asarray(out2)[0, alc.buf:]
    assert np.abs(tail2.mean() - 0.1 * g_usb) < 0.03


def test_txalc_gain_doubling_time():
    """Recovery is rate-limited: gain may rise at most 1/(48000*5) per
    sample (5 s to double, microphone.c:347)."""
    alc = TxALC.create(FS, mode=0, channels=1)
    st = alc.init_state(1)
    st, _ = _stream(alc, st, np.full((1, 4 * B), 2.5, np.float32))
    g0 = float(st["gain_now"][0, 0])
    n = 8 * B
    st, _ = _stream(alc, st, np.full((1, n), 0.05, np.float32))
    g1 = float(st["gain_now"][0, 0])
    max_rise = n * 1.0 / (48000.0 * 5.0)
    assert g1 - g0 <= max_rise * 1.05
    assert g1 > g0                            # but it did recover
