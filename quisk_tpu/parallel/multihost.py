"""Multi-host ingest: each host feeds its local shard of the global
channel/time array.

Parity: the reference's distribution story is UDP sample transports into
one process (quisk.c:3284/3519) and a two-machine remote-operation split
(ac2yd/).  The TPU-native equivalent (SURVEY.md §5.8): N hosts each
ingest a slice of the capture (file/generator/network), wrap their local
block as a shard of a globally-sharded jax array, and the compiled step
runs on the global view with collectives over ICI/DCN.

``make_global_iq`` uses ``jax.make_array_from_process_local_data`` so the
same code path serves 1 host (tests, this repo's CI) and N hosts (where
``jax.distributed.initialize`` has set process_index/count).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global_iq(local_iq: np.ndarray, mesh: Mesh,
                   spec: P = P("chan", None)) -> jax.Array:
    """Wrap this process's local [C_local, B] IQ block into the global
    sharded array [C_global, B].

    On a single process this is just a sharded device_put; with multiple
    jax processes each contributes its slice (C_global = sum of locals).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_iq, sharding)
    return jax.make_array_from_process_local_data(sharding, local_iq)


def shard_tree_multihost(tree, mesh: Mesh, channels: int,
                         axis: str = "chan"):
    """Multi-process version of :func:`quisk_tpu.parallel.shard_over_channels`:
    leaves with a leading [channels] dim are sharded over ``axis`` with each
    process contributing its local row slice; everything else is replicated.

    Under one process this degrades to plain sharded device_put (same
    numerics as the single-host path); under ``jax.distributed`` every array
    is assembled with ``make_array_from_process_local_data``.
    """
    from quisk_tpu.parallel.shard import channel_pspecs

    specs = channel_pspecs(tree, channels, axis)
    n_proc = jax.process_count()
    lo = jax.process_index() * channels // n_proc
    hi = (jax.process_index() + 1) * channels // n_proc

    def put(leaf, spec):
        sharding = NamedSharding(mesh, spec)
        if n_proc == 1:
            return jax.device_put(leaf, sharding)
        local = np.asarray(leaf)
        if spec and spec[0] == axis:
            local = np.ascontiguousarray(local[lo:hi])
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree.map(put, tree, specs)


class ShardedFileIngest:
    """Per-host file reader for a channel-sharded capture: host k reads
    channels [k*C/N, (k+1)*C/N) from its own file/slice and feeds
    :func:`make_global_iq` (the '1500-byte-packet mindset' replaced by
    sharded file layout + block reads, SURVEY.md §7)."""

    def __init__(self, iq_by_channel: np.ndarray, mesh: Mesh,
                 block: int):
        self.iq = np.asarray(iq_by_channel)
        self.mesh = mesh
        self.block = block
        self.pos = 0
        n_proc = jax.process_count()
        C = self.iq.shape[0]
        lo = jax.process_index() * C // n_proc
        hi = (jax.process_index() + 1) * C // n_proc
        self._rows = slice(lo, hi)

    def next_block(self) -> jax.Array | None:
        if self.pos + self.block > self.iq.shape[-1]:
            return None
        local = self.iq[self._rows, self.pos:self.pos + self.block]
        self.pos += self.block
        return make_global_iq(np.ascontiguousarray(local), self.mesh)
