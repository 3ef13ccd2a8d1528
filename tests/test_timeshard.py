"""Time-block sharding equivalence: sharded processing over a (chan, time)
mesh must match the single-device streaming chain bit-for-SNR.

SURVEY.md §7 hard part: "Halo exchange correctness for time-sharded
overlap-save: taps-1 history must cross shard boundaries each block;
off-by-one here silently degrades SNR — needs dedicated shard-vs-single-
device equivalence tests."  These are those tests.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # halo-exchange chains on the 8-dev mesh
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quisk_tpu.io import sources
from quisk_tpu.ops import design
from quisk_tpu.oracle import dsp
from quisk_tpu.parallel import timeshard as ts


def _mesh_ct(n_chan=2, n_time=4):
    devs = np.array(jax.devices()[: n_chan * n_time]).reshape(n_chan, n_time)
    return Mesh(devs, ("chan", "time"))


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("chan", "time")))


def test_shard_fir_matches_oracle(rng):
    mesh = _mesh_ct()
    C, N = 2, 8192
    x = (rng.standard_normal((C, N)) + 1j * rng.standard_normal((C, N))
         ).astype(np.complex64)
    taps = design.lowpass(201, 3000.0, 48000.0)

    fn = jax.jit(jax.shard_map(
        lambda a: ts.shard_fir(a, jnp.asarray(taps, jnp.float32), "time"),
        mesh=mesh, in_specs=P("chan", "time"), out_specs=P("chan", "time")))
    y = np.asarray(fn(_shard(mesh, x)))
    for c in range(C):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps)
        assert dsp.snr_db(ref, y[c]) > 100


def test_shard_fir_decimating(rng):
    mesh = _mesh_ct()
    C, N = 2, 8192
    x = (rng.standard_normal((C, N)) + 1j * rng.standard_normal((C, N))
         ).astype(np.complex64)
    taps = design.halfband(45)
    fn = jax.jit(jax.shard_map(
        lambda a: ts.shard_fir(a, jnp.asarray(taps, jnp.float32), "time",
                               decim=2),
        mesh=mesh, in_specs=P("chan", "time"), out_specs=P("chan", "time")))
    y = np.asarray(fn(_shard(mesh, x)))
    assert y.shape == (C, N // 2)
    for c in range(C):
        _, ref = dsp.fir_stream(x[c].astype(np.complex128), taps, decim=2)
        assert dsp.snr_db(ref, y[c]) > 100


def test_shard_one_pole(rng):
    mesh = _mesh_ct()
    C, N = 2, 4096
    x = rng.standard_normal((C, N)).astype(np.float32)
    a = 0.97
    fn = jax.jit(jax.shard_map(
        lambda v: ts.shard_one_pole(v, a, 1.0 - a, "time"),
        mesh=mesh, in_specs=P("chan", "time"), out_specs=P("chan", "time")))
    y = np.asarray(fn(_shard(mesh, x)))
    for c in range(C):
        ref = dsp.one_pole(x[c].astype(np.float64), a, 1.0 - a)
        assert dsp.snr_db(ref, y[c]) > 80


def test_shard_nco_phase_continuity():
    mesh = _mesh_ct()
    C, N = 2, 8192
    fs = 48000.0
    f0 = 7001.5
    x = np.broadcast_to(sources.tone(f0, fs, N).astype(np.complex64), (C, N))
    word = np.round(np.atleast_1d(f0) / fs * 2**32).astype(np.int64)
    word = jnp.asarray(np.broadcast_to(word.astype(np.uint32), (C,)))
    fn = jax.jit(jax.shard_map(
        lambda a, w: ts.shard_nco_mix(a, w, "time", N // 4),
        mesh=mesh, in_specs=(P("chan", "time"), P("chan")),
        out_specs=P("chan", "time")))
    y = np.asarray(fn(_shard(mesh, np.ascontiguousarray(x)), word))
    # mixing the tone down by its own frequency must give ~DC with no phase
    # jumps at shard boundaries
    ang = np.unwrap(np.angle(y[0]))
    assert np.max(np.abs(np.diff(ang))) < 1e-2
    assert np.std(np.abs(y[0])) < 1e-3


def test_timeshard_rx_ssb_equals_reference_chain(rng):
    mesh = _mesh_ct()
    C, N = 2, 16384
    fs = 192000.0
    voice = sources.voice_like(fs, N, band=(300.0, 2700.0), seed=4)
    iq = sources.ssb_signal(voice, fs, carrier_hz=40000.0).astype(np.complex64)
    x = np.broadcast_to(iq, (C, N)).copy()
    stages = [(design.halfband(45), 2), (design.halfband(45), 2)]
    bp = design.bandpass_analytic(1025, 300.0, 3100.0, 48000.0)
    audio = np.asarray(ts.timeshard_rx(
        _shard(mesh, x), mesh, sample_rate=fs, tune_hz=40000.0,
        stages=stages, bp_taps=bp, mode="ssb"))
    # single-device oracle: same math in float64
    bb = dsp.mix_down(iq.astype(np.complex128), 40000.0, fs)
    for taps, d in stages:
        _, bb = dsp.fir_stream(bb, taps, decim=d)
    _, bb = dsp.fir_stream(bb, bp)
    ref = 2.0 * np.real(bb)
    for c in range(C):
        assert dsp.snr_db(ref, audio[c], skip=64) > 90


def test_timeshard_rx_fm(rng):
    mesh = _mesh_ct()
    C, N = 2, 16384
    fs = 192000.0
    voice = sources.voice_like(fs, N, band=(300.0, 2700.0), seed=6)
    iq = sources.fm_signal(voice, fs, deviation_hz=2500.0,
                           carrier_hz=-30000.0).astype(np.complex64)
    x = np.broadcast_to(iq, (C, N)).copy()
    stages = [(design.halfband(45), 2), (design.halfband(45), 2)]
    bp = design.bandpass_analytic(1025, -6250.0, 6250.0, 48000.0)
    audio = np.asarray(ts.timeshard_rx(
        _shard(mesh, x), mesh, sample_rate=fs, tune_hz=-30000.0,
        stages=stages, bp_taps=bp, mode="fm", fm_deviation_hz=2500.0))
    bb = dsp.mix_down(iq.astype(np.complex128), -30000.0, fs)
    for taps, d in stages:
        _, bb = dsp.fir_stream(bb, taps, decim=d)
    _, bb = dsp.fir_stream(bb, bp)
    ref = dsp.fm_demod(bb, 48000.0, 2500.0)
    for c in range(C):
        assert dsp.snr_db(ref, audio[c], skip=64) > 60
