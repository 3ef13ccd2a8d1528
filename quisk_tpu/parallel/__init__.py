"""Mesh construction and sharding helpers."""

from quisk_tpu.parallel.shard import (  # noqa: F401
    channel_pspecs, make_mesh, shard_over_channels)
