"""Channel-axis sharding: thousands of independent receivers across a mesh.

The reference's channel parallelism is 3 demod banks + 9 sub-receivers on one
CPU thread (quisk.c:50, quisk.h:21; SURVEY.md §2.4).  Here channels are a
mesh axis: every per-channel array (NCO words/phase, filter masks with a
leading [C] dim, demod state, blocks [C, B]) is sharded over it, everything
else is replicated, and XLA/GSPMD propagates the sharding through the whole
chain — no collectives needed because channels are independent.

Time-block sharding with ppermute halo exchange lives in
quisk_tpu.parallel.timeshard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "chan") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


#: fields that hold SHARED transform/filter constants whose leading dim
#: can collide with the channel count (found the hard way: CTRDFT's
#: [K1, K1] stage matrix is [32, 32] — at C=32 the shape heuristic
#: sharded a DFT basis and the featured chain failed under shard_map).
#: Per-channel leaves (NCO words, [C, nfft] masks, demod state) never
#: live under these names; STATE trees carry no constants, so the shape
#: rule alone stays correct there.
_SHARED_PARAM_FIELDS = frozenset({
    "w1", "w2", "tw", "fr", "fi", "br", "bi", "M", "Mg", "U",
    "h_poly", "window", "tdc", "tde", "dec", "kd", "taps",
})


def channel_pspecs(tree, channels: int, axis: str = "chan"):
    """PartitionSpecs matching `tree`: arrays whose leading dim == channels
    get P(axis, None, ...); scalars and shared params get P() (replicated).
    Leaves under a known shared-constant field name are always replicated
    (see _SHARED_PARAM_FIELDS)."""

    def spec(path, leaf):
        if any(getattr(k, "name", None) in _SHARED_PARAM_FIELDS
               for k in path):
            return P()
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == channels:
            return P(axis, *([None] * (len(shape) - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_over_channels(tree, mesh: Mesh, channels: int, axis: str = "chan"):
    """device_put every leaf with its channel sharding."""
    specs = channel_pspecs(tree, channels, axis)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        tree, specs)


def make_sharded_step(chain, mesh: Mesh, channels: int, axis: str = "chan"):
    """The channel-sharded receive step as an explicit ``shard_map``.

    GSPMD on the plain jitted step is NOT collective-free even though
    channels are independent: XLA's SPMD partitioner all-gathers the
    batch dim of every FFT (measured: the "no-collectives" step carried
    18 all-gathers + 24 collective-permutes at 8 devices before the r4
    fixes — [2C] re/im concats in ops/fir.py plus one gather per
    fft/ifft, and the FFT gathers are a partitioner limitation that
    cannot be fixed op-side).  Under shard_map each device runs the
    entire per-channel chain on its local [C/n, ...] shard — zero
    collectives by construction.

    Returns ``step(chain_sharded, state_sharded, x_sharded)`` (jitted).
    The chain object must be the one `channel_pspecs` describes.
    """
    from jax.experimental.shard_map import shard_map

    cspec = channel_pspecs(chain, channels, axis)
    sspec = channel_pspecs(chain.init_state(), channels, axis)
    xspec = P(axis, None)

    def raw(ch, st, xx):
        return ch.step(st, xx)

    f = shard_map(raw, mesh=mesh,
                  in_specs=(cspec, sspec, xspec),
                  out_specs=(sspec, xspec),
                  check_rep=False)
    return jax.jit(f)
