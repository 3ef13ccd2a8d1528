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
        # sanity only, not a quotable efficiency: on a loaded CI box the
        # 1-iter virtual-mesh points can read super-linear (measured
        # 1.68 under pytest-xdist saturating all cores)
        assert 0 < p.efficiency <= 4.0
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


def _hlo_collectives(hlo: str):
    import re
    return {op: len(re.findall(op, hlo))
            for op in ("all-gather", "all-reduce", "collective-permute",
                       "all-to-all")
            if re.search(op, hlo)}


def test_featured_sharded_step_has_zero_collectives():
    """VERDICT r4 weak #5: the zero-collectives guard covered only the
    plain flagship.  The featured chain's FFT-heavy optional stages
    (auto-notch, ANF FDAF, NR2/SNB STFTs, squelches) are exactly the ops
    GSPMD was gathering — under shard_map they must stay local."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quisk_tpu.modes import Mode
    from quisk_tpu.parallel.shard import (make_mesh, make_sharded_step,
                                          shard_over_channels)
    from quisk_tpu.rx import RxChain, RxChainConfig

    C, FS = 32, 192000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=512,
                        agc=True, noise_blanker=2, auto_notch=True,
                        nr=True, anf=True, squelch=True, fm_squelch=True)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + .5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)])
    mesh = make_mesh(8)
    step = make_sharded_step(chain, mesh, C)
    chain_s = shard_over_channels(chain, mesh, C)
    state_s = shard_over_channels(chain.init_state(), mesh, C)
    x = jax.device_put(jnp.zeros((C, chain.block_in), jnp.complex64),
                       NamedSharding(mesh, P("chan", None)))
    hlo = step.lower(chain_s, state_s, x).compile().as_text()
    assert not _hlo_collectives(hlo), _hlo_collectives(hlo)
    _, audio = step(chain_s, state_s, x)
    assert audio.sharding.spec[0] == "chan"


def test_fused_front_sharded_step_zero_collectives_and_matches():
    """The Pallas fused front under shard_map (untested in r4): zero
    collectives in the HLO, and the sharded step's audio == the
    unsharded chain's samplewise (USB modes only — FM warm-up is
    chaotic under different fusions, see test_featured_chain)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quisk_tpu.modes import Mode
    from quisk_tpu.parallel.shard import (make_mesh, make_sharded_step,
                                          shard_over_channels)
    from quisk_tpu.rx import RxChain, RxChainConfig

    C, FS = 1024, 192000.0          # 128 channels/shard = the kernel TC
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=256,
                        agc=False, fused_frontend=True, noise_blanker=2)
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + .5) * FS / (2 * C)) for i in range(C)],
        mode=int(Mode.USB))
    assert chain.front is not None    # the Pallas kernel is in the step
    mesh = make_mesh(8)
    step = make_sharded_step(chain, mesh, C)
    chain_s = shard_over_channels(chain, mesh, C)
    state_s = shard_over_channels(chain.init_state(), mesh, C)
    rng = np.random.default_rng(5)
    xh = (rng.standard_normal((C, chain.block_in))
          + 1j * rng.standard_normal((C, chain.block_in))
          ).astype(np.complex64)
    x = jax.device_put(jnp.asarray(xh),
                       NamedSharding(mesh, P("chan", None)))
    hlo = step.lower(chain_s, state_s, x).compile().as_text()
    assert not _hlo_collectives(hlo), _hlo_collectives(hlo)
    _, audio_s = step(chain_s, state_s, x)
    _, audio_u = chain.step(chain.init_state(), jnp.asarray(xh))
    err = float(jnp.max(jnp.abs(audio_s - audio_u)))
    assert err < 1e-4, err


def test_pfb_sharded_step_collectives_only_by_design():
    """BASELINE config #5 sharding (parallel/pfbshard.py): ppermute
    halos for the polyphase overlap + ONE all-to-all corner turn are the
    designed collectives — no all-gathers (the GSPMD formulation
    gathered the whole time-sharded input at the history concat) and no
    all-reduces.  Output must match the unsharded OversampledPFB +
    MixedDemod pipeline samplewise."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import OversampledPFB
    from quisk_tpu.ops.demod import MixedDemod
    from quisk_tpu.parallel.pfbshard import (make_sharded_pfb_step,
                                             shard_pfb_inputs)

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dev",))
    K = 16 * n_dev
    B = K * 8 * n_dev
    modes = [int(Mode.USB), int(Mode.AM), int(Mode.FM)]
    pfb = OversampledPFB.create(K, B, taps_per_branch=8, mxu_dft=True)
    dm = MixedDemod.create([modes[(3 * i) // K] for i in range(K)],
                           sample_rate=96000.0, channels=K)
    step = make_sharded_pfb_step(pfb, dm, mesh)
    dm_s, st_s = shard_pfb_inputs(dm, mesh, K)
    rng = np.random.default_rng(7)
    xh = (rng.standard_normal((1, B))
          + 1j * rng.standard_normal((1, B))).astype(np.complex64)
    x = jax.device_put(jnp.asarray(xh),
                       NamedSharding(mesh, P(None, "dev")))
    hist = jnp.asarray(pfb.init_state(1))
    hlo = step.lower(dm_s, st_s, hist, x).compile().as_text()
    cols = _hlo_collectives(hlo)
    assert "all-reduce" not in cols, cols
    assert "all-gather" not in cols, cols
    assert "all-to-all" in cols and "collective-permute" in cols, cols

    st2, hist2, audio, spec = step(dm_s, st_s, hist, x)
    assert audio.sharding.spec[1] == "dev"
    # unsharded reference over TWO blocks (history carry exercised)
    st_r = dm.init_state(K)
    h_r = pfb.init_state(1)
    for blk in range(2):
        if blk == 1:
            xh = (rng.standard_normal((1, B))
                  + 1j * rng.standard_normal((1, B))).astype(np.complex64)
            x = jax.device_put(jnp.asarray(xh),
                               NamedSharding(mesh, P(None, "dev")))
            st2, hist2, audio, spec = step(dm_s, st2, hist2, x)
        h_r, ch = pfb(h_r, jnp.asarray(xh))
        st_r, a_r = dm(st_r, ch.reshape(K, -1))
    err = float(jnp.max(jnp.abs(audio.reshape(K, -1) - a_r)))
    assert err < 1e-3, err
    sp_r = np.mean(np.abs(np.asarray(ch).reshape(K, -1)) ** 2, axis=-1)
    assert np.allclose(np.asarray(spec)[0], sp_r, rtol=1e-3, atol=1e-6)
