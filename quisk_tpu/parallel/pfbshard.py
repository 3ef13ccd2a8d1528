"""Sharded PFB channelizer step (BASELINE config #5 on a device mesh).

The GSPMD formulation of the channelizer gathered the ENTIRE time-sharded
input at the ``concatenate([hist, x])`` history prepend (measured: 2
all-gathers covering the full block) — a replicated-onto-sharded concat
is something the partitioner can only solve by gathering.  This module
is the engineered replacement, an explicit ``shard_map``:

- the wideband input is sharded over TIME; each device ppermutes its
  tail (P*K - K/2 samples) to its right neighbour, so every shard has
  the overlap its polyphase windows need (device 0 takes the carried
  block history instead) — the same halo-exchange pattern as
  :mod:`quisk_tpu.parallel.timeshard` uses for FIR history;
- polyphase accumulation, the cross-branch IDFT and the commutator
  rotations run locally on each shard's frames;
- ONE ``all_to_all`` corner-turns [S, n_out/n, K] -> [S, n_out, K/n] —
  the single reshard every channelizer deployment pays to hand the
  channel matrix to a channel-sharded demod bank;
- demod (MixedDemod: per-channel mode is sharded DATA) and the
  per-channel power spectrum run channel-local.

Collectives by construction: n-1 collective-permutes + one all-to-all.
No all-gathers, no all-reduces — guarded by
tests/test_scaling.py::test_pfb_sharded_step_collectives_only_by_design.

Parity: quisk.c:2517-2652 demodulates each bank inline; SURVEY §2.4
channel/time parallelism.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quisk_tpu.parallel.shard import channel_pspecs


def make_sharded_pfb_step(pfb, demod, mesh: Mesh, axis: str = "dev"):
    """Build the sharded step for an :class:`OversampledPFB` + demod bank.

    Returns ``step(dm_params, dm_state, hist, x)`` (jitted):
      x     [S, B] complex, sharded P(None, axis) over time
      hist  [S, P*K - K/2] complex, replicated (block carry)
      ->    (dm_state', hist', audio [S, K, n_out] channel-sharded,
             spec [S, K] channel-sharded)

    The PFB params ride as closure constants (shared, replicated); the
    demod's per-channel mode/state shard over channels via
    ``channel_pspecs``.  Constraints: B/n >= P*K - K/2 (halo from ONE
    neighbour), (B/n)/(K/2) even (hop parity stays local), K % n == 0.
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    K = pfb.n_chan
    M = K // 2
    H = pfb.P * K - M
    B = pfb.block
    if B % n or (B // n) < H:
        raise ValueError(f"need B/n >= halo {H} (got {B // n})")
    if ((B // n) // M) % 2:
        raise ValueError("need an even number of output frames per shard "
                         "(hop parity must stay shard-local)")
    if K % n:
        raise ValueError("channels must divide the mesh axis")
    pfb_local = pfb.replace(block=B // n)

    dm_spec = channel_pspecs(demod, K, axis)
    st_spec = channel_pspecs(demod.init_state(K), K, axis)

    def local(dm, dm_state, hist, x_loc):
        # halo: my tail -> right neighbour; shard 0 uses the carried hist
        tail = x_loc[:, -H:]
        halo = jax.lax.ppermute(tail, axis,
                                [(i, i + 1) for i in range(n - 1)])
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, hist, halo)
        new_hist, vr, vi = pfb_local.poly_ri(halo, x_loc)
        yr, yi = pfb_local.idft_ri(vr, vi)
        zr, zi = pfb_local.rotate_tm(yr, yi)       # [S, n_out/n, K]
        # the one corner turn: time-sharded -> channel-sharded
        zr = jax.lax.all_to_all(zr, axis, split_axis=2, concat_axis=1,
                                tiled=True)        # [S, n_out, K/n]
        zi = jax.lax.all_to_all(zi, axis, split_axis=2, concat_axis=1,
                                tiled=True)
        S, n_out, Kl = zr.shape
        ch = jax.lax.complex(zr, zi)
        ch2 = jnp.moveaxis(ch, 1, 2).reshape(S * Kl, n_out)
        dm_state, audio = dm(dm_state, ch2)
        spec = jnp.mean(zr * zr + zi * zi, axis=1).reshape(S, Kl)
        return (dm_state, new_hist,
                audio.reshape(S, Kl, n_out), spec)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(dm_spec, st_spec, P(), P(None, axis)),
        out_specs=(st_spec, P(None, axis), P(None, axis, None),
                   P(None, axis)),
        check_rep=False)

    def step(dm_params, dm_state, hist, x):
        dm_state, hist_all, audio, spec = f(dm_params, dm_state, hist, x)
        # every shard emitted its ext tail; the global carry is the last
        return dm_state, hist_all[:, -H:], audio, spec

    return jax.jit(step)


def shard_pfb_inputs(demod, mesh: Mesh, channels: int, axis: str = "dev"):
    """device_put the demod params/state with their channel shardings."""
    from quisk_tpu.parallel.shard import shard_over_channels
    dm = shard_over_channels(demod, mesh, channels, axis)
    st = shard_over_channels(demod.init_state(channels), mesh, channels,
                             axis)
    return dm, st
