"""Time-block sharding: one long capture split across devices in time,
with overlap-save boundary samples exchanged via collective permutes.

Every streaming FIR keeps ``taps-1`` samples of history (filter.h:7-9;
FIRCORE's 50% overlap, wdsp/firmin.c:409-432).  When the *time* axis is
sharded across chips, that history lives on the left neighbor — so before
filtering, each shard receives its neighbor's tail through
``jax.lax.ppermute`` (SURVEY.md §5.7: "overlap-save boundary samples
exchanged via collective permutes").  The first shard receives zeros,
matching a fresh filter state.

The same trick handles every cross-boundary recurrence in the chain:
- FIR/decimator history: ppermute of the last ``taps-1`` samples
- FM discriminator's previous sample: ppermute of the last sample
- one-pole IIR state: each shard's output is an affine function of its
  incoming state, y_out = A * y_in + Bsum, so shard prefixes compose with a
  tiny all_gather of (A, Bsum) pairs and a per-shard prefix product.
- NCO phase: integer phase words make the shard-start phase a pure function
  of the global sample offset — no communication at all.

Used by :func:`timeshard_rx` — a whole-capture receive over a
``(chan, time)`` mesh, equivalence-tested against the single-device chain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quisk_tpu.ops.fir import _conv_valid


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def halo_from_left(x: jnp.ndarray, n_halo: int, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: return [..., n_halo] = the left neighbor's tail of
    x (zeros on the first shard)."""
    n = jax.lax.axis_size(axis_name)
    tail = x[..., x.shape[-1] - n_halo:]
    halo = jax.lax.ppermute(tail, axis_name, perm=_ring_perm(n))
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(halo), halo)


def shard_fir(x: jnp.ndarray, taps: jnp.ndarray, axis_name: str,
              decim: int = 1) -> jnp.ndarray:
    """Streaming-equivalent FIR of a time-sharded [C, B_local] block.

    Requires decim to divide B_local so the decimation phase is aligned at
    shard boundaries (same condition as the block-streaming API).
    """
    T = taps.shape[-1]
    halo = halo_from_left(x, T - 1, axis_name)
    xe = jnp.concatenate([halo, x], axis=-1)
    return _conv_valid(xe, taps, decim)


def shard_one_pole(x: jnp.ndarray, a: float, b: float,
                   axis_name: str) -> jnp.ndarray:
    """y[n] = a*y[n-1] + b*x[n] across the whole time-sharded signal.

    Local scan gives y_local = B + A * y_in with A = a^B_local; the incoming
    state for shard k is the prefix-combined state of shards 0..k-1,
    computed from an all_gather of each shard's (A, last B) — O(n_shards)
    scalars per channel.
    """
    from quisk_tpu.ops.iir import _first_order_scan

    C, Bl = x.shape
    y0 = jnp.zeros((C,), x.dtype)
    y_local = _first_order_scan(x, a, b, y0)          # assumes y_in = 0
    A_total = jnp.asarray(a, x.dtype) ** Bl
    b_last = y_local[:, -1]                           # B term of this shard
    # gather every shard's (A, b_last): [n, C]
    n = jax.lax.axis_size(axis_name)
    A_all = jax.lax.all_gather(jnp.broadcast_to(A_total, (C,)), axis_name)
    B_all = jax.lax.all_gather(b_last, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def combine(carry, ab):
        A_k, B_k = ab
        return A_k * carry + B_k, None

    # incoming state = fold over shards strictly before ours
    def fold(k, carry):
        return jnp.where(k < idx, A_all[k] * carry + B_all[k], carry)

    # init derived from sharded data so its varying-axes type matches the
    # body output under shard_map
    y_in = jax.lax.fori_loop(0, n, fold, jnp.zeros_like(b_last))
    # correct local outputs: y[n] += a^(n+1) * y_in
    powers = jnp.asarray(a, x.dtype) ** jnp.arange(1, Bl + 1, dtype=x.dtype)
    return y_local + y_in[:, None] * powers[None, :]


def shard_fm_disc(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Phase-difference discriminator with the previous sample fetched from
    the left neighbor (zero for the first shard)."""
    prev = halo_from_left(x, 1, axis_name)[:, 0]
    xm1 = jnp.concatenate([prev[:, None], x[:, :-1]], axis=-1)
    d = x * jnp.conj(xm1)
    return jnp.arctan2(jnp.imag(d), jnp.real(d))


def shard_nco_mix(x: jnp.ndarray, word: jnp.ndarray, axis_name: str,
                  block_local: int) -> jnp.ndarray:
    """Mix down with a drift-free NCO whose phase starts at the shard's
    global offset — integer phase needs no communication."""
    idx = jax.lax.axis_index(axis_name).astype(jnp.uint32)
    offset = idx * jnp.uint32(block_local)
    n = offset + jnp.arange(block_local, dtype=jnp.uint32)
    ph = word[:, None] * n[None, :]
    ang = ph.astype(jnp.float32) * np.float32(2.0 * np.pi / 4294967296.0)
    osc = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))    # e^{-j theta}
    return x * osc


def timeshard_rx(iq: jnp.ndarray, mesh: Mesh, *, sample_rate: float,
                 tune_hz, stages: list[np.ndarray], bp_taps: np.ndarray,
                 mode: str = "ssb", fm_deviation_hz: float = 2500.0,
                 deemph_hz: float = 300.0):
    """Whole-capture receive over a (chan, time) mesh.

    iq: [C, N] sharded P('chan', 'time'); stages: list of (taps, decim)
    pairs is simplified to taps arrays with decim=2 for halfbands... pass
    tuples (taps, decim).  Returns audio [C, N/D] with the same sharding.
    """
    C, N = iq.shape
    n_time = mesh.shape["time"]
    word = np.round(np.atleast_1d(np.asarray(tune_hz, np.float64))
                    / sample_rate * 2**32).astype(np.int64)
    word = jnp.asarray(np.broadcast_to(word.astype(np.uint32), (C,)))
    a_de = float(np.exp(-2.0 * np.pi * deemph_hz
                        / (sample_rate / int(np.prod([d for _, d in stages])))))
    fs_out = sample_rate / int(np.prod([d for _, d in stages]))
    fm_gain = float(fs_out / (2.0 * np.pi * fm_deviation_hz))

    def fn(iq_local, word_local):
        x = shard_nco_mix(iq_local, word_local, "time", iq_local.shape[-1])
        for taps, d in stages:
            x = shard_fir(x, jnp.asarray(taps, jnp.float32), "time", decim=d)
        x = shard_fir(x, jnp.asarray(bp_taps, jnp.complex64), "time")
        if mode == "ssb":
            audio = 2.0 * jnp.real(x)
        elif mode == "am":
            env = jnp.abs(x)
            d1 = env - jnp.concatenate(
                [halo_from_left(env, 1, "time")[:, :1], env[:, :-1]], axis=-1)
            audio = shard_one_pole(d1, 0.995, 1.0, "time")
        elif mode == "fm":
            disc = shard_fm_disc(x, "time") * fm_gain
            audio = shard_one_pole(disc, a_de, 1.0 - a_de, "time")
        else:
            raise ValueError(mode)
        return audio

    shard_fn = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("chan", "time"), P("chan")),
        out_specs=P("chan", "time"))
    return shard_fn(iq, word)
