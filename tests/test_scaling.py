"""Scaling harness sanity: the weak-scaling measurement runs at 1..8
virtual devices and reports well-formed throughput/efficiency points
(BASELINE.md scaling row; the real-slice numbers come from the same code)."""

import numpy as np
import pytest

from quisk_tpu.parallel.scaling import format_table, measure_scaling


@pytest.mark.slow
def test_measure_scaling_points():
    pts = measure_scaling(device_counts=(1, 2, 4), channels_per_device=8,
                          sample_rate=192000.0, audio_block=256, iters=1)
    assert [p.devices for p in pts] == [1, 2, 4]
    for p in pts:
        assert p.channels == 8 * p.devices        # weak scaling
        assert p.samples_per_s > 0 and p.step_ms > 0
        assert 0 < p.efficiency <= 1.5            # sane, not asserted >=80%
        # shared-silicon CPU mesh: of-ideal = efficiency * n
        assert abs(p.eff_of_ideal - p.efficiency * p.devices) < 1e-9
    assert pts[0].efficiency == 1.0               # anchor
    table = format_table(pts)
    assert "of-ideal" in table
    # iters=1 cannot estimate timing spread: the table must flag every
    # point as smoke-only so nobody quotes CI-box noise as efficiency
    assert "NOT a quotable efficiency" in table
    assert table.count("*") >= len(pts)


def test_measure_scaling_strong_and_timeshard():
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from quisk_tpu.parallel.scaling import measure_timeshard

    pts = measure_scaling(device_counts=(1, 2), channels_per_device=4,
                          sample_rate=192000.0, audio_block=256, iters=1,
                          weak=False)
    assert [p.channels for p in pts] == [8, 8]    # total held fixed
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("chan", "time"))
    sps, ms = measure_timeshard(mesh, channels=4, n_samples=1024, iters=1)
    assert sps > 0 and ms > 0


def test_sharded_step_has_zero_collectives():
    """The channel-sharded step must be collective-free (channels are
    independent).  Guards the r4 findings: [2C] re/im concats in
    ops/fir.py and GSPMD's FFT batch all-gather both silently inserted
    communication (18 all-gathers + 24 collective-permutes at 8 devices)
    until the ops were restructured and the step moved to shard_map."""
    import re

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__
    from quisk_tpu.parallel.shard import (make_mesh, make_sharded_step,
                                          shard_over_channels)

    C = 32
    chain = __graft_entry__._flagship(channels=C, sample_rate=192000.0,
                                      audio_block=512)
    mesh = make_mesh(8)
    step = make_sharded_step(chain, mesh, C)
    chain_s = shard_over_channels(chain, mesh, C)
    state_s = shard_over_channels(chain.init_state(), mesh, C)
    x = jax.device_put(jnp.zeros((C, chain.block_in), jnp.complex64),
                       NamedSharding(mesh, P("chan", None)))
    hlo = step.lower(chain_s, state_s, x).compile().as_text()
    for op in ("all-gather", "all-reduce", "collective-permute",
               "all-to-all"):
        assert not re.search(op, hlo), f"sharded step contains {op}"
    # and it executes, audio staying sharded
    _, audio = step(chain_s, state_s, x)
    assert audio.sharding.spec[0] == "chan"
