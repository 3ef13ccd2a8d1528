"""One process of a multi-host (DCN) receive job — run under
``jax.distributed``.

This is the executable counterpart of the reference's two-machine
remote-operation split (ac2yd/remote.c: the control head and the radio
machine stream sound/graph over the network): here N jax processes form one
logical device mesh, every process ingests its own slice of the channel
axis (ShardedFileIngest), and the compiled receive step runs on the global
array with XLA managing DCN transfers.

Spawned by tests/test_multiprocess.py as:

    python -m quisk_tpu.parallel.dcn_worker --pid 0 --nproc 2 \
        --port 9731 --outdir /tmp/xyz --devices-per-proc 4

Each process writes its local audio rows + the channel slice it owned to
``{outdir}/audio_p{pid}.npz``; the parent compares against an unsharded
oracle run of the identical chain.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--pfb", action="store_true",
                    help="run the sharded PFB channelizer job instead "
                         "of the per-channel chain (BASELINE config #5 "
                         "'across >=2 hosts': time-sharded polyphase "
                         "with ppermute halos riding DCN between the "
                         "processes + one all-to-all corner turn)")
    args = ap.parse_args(argv)

    # platform/device-count config must precede any jax use; drop any
    # inherited device-count flag (the parent test process forces 8)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={args.devices_per_proc}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nproc, process_id=args.pid)
    assert jax.process_count() == args.nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import __graft_entry__
    from quisk_tpu.parallel.multihost import (ShardedFileIngest,
                                              shard_tree_multihost)

    n_global = args.nproc * args.devices_per_proc

    if args.pfb:
        return _pfb_job(args, n_global)

    mesh = Mesh(np.array(jax.devices()[:n_global]), ("chan",))
    C = args.channels
    # agc off: its 1 s release memory carries the filter-warmup transient
    # for longer than the test runs, spoiling exact oracle comparison
    chain = __graft_entry__._flagship(channels=C, sample_rate=192000.0,
                                      audio_block=256, agc=False)
    chain_s = shard_tree_multihost(chain, mesh, C)
    state_s = shard_tree_multihost(chain.init_state(), mesh, C)

    # deterministic capture, identical in every process and in the oracle:
    # every channel receives a modulated station of its own mode on its own
    # tune (FM demod of raw noise is chaotic — angle() near +-pi flips on
    # one-ulp reduction-order differences, so noise can't be the fixture)
    from quisk_tpu.io import sources
    n_samp = args.blocks * chain.block_in
    tunes = np.asarray(chain.tune_base)
    modes = np.asarray(chain.demod.mode)
    iq = np.stack([
        sources.station_iq(modes[c], 192000.0, n_samp, float(tunes[c]),
                           seed=c)
        for c in range(C)])
    ingest = ShardedFileIngest(iq, mesh, block=chain.block_in)

    @jax.jit
    def step(ch, st, xx):
        return ch.step(st, xx)

    outs = []
    while (x := ingest.next_block()) is not None:
        state_s, audio = step(chain_s, state_s, x)
        # each process keeps only its addressable rows
        shards = sorted(audio.addressable_shards, key=lambda s: s.index[0].start)
        outs.append(np.concatenate([np.asarray(s.data) for s in shards]))
    local_audio = np.concatenate(outs, axis=-1)

    lo = jax.process_index() * C // args.nproc
    hi = (jax.process_index() + 1) * C // args.nproc
    os.makedirs(args.outdir, exist_ok=True)
    np.savez(os.path.join(args.outdir, f"audio_p{args.pid}.npz"),
             audio=local_audio, lo=lo, hi=hi,
             process_count=jax.process_count())
    print(f"dcn_worker pid={args.pid} OK: process_count="
          f"{jax.process_count()}, devices={len(jax.devices())}, "
          f"rows [{lo},{hi}), audio {local_audio.shape}")
    jax.distributed.shutdown()
    return 0


def _pfb_job(args, n_global: int) -> int:
    """BASELINE config #5 across processes: ONE wideband capture
    time-sharded over the global mesh (each process owns its devices'
    time slices), polyphase halos exchanged with ppermute (crossing the
    process boundary = DCN), one all-to-all corner turn, demod
    channel-sharded.  Each process writes its addressable audio rows;
    the parent checks them against the unsharded pipeline."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import OversampledPFB
    from quisk_tpu.ops.demod import MixedDemod
    from quisk_tpu.parallel.multihost import shard_tree_multihost
    from quisk_tpu.parallel.pfbshard import make_sharded_pfb_step

    mesh = Mesh(np.array(jax.devices()[:n_global]), ("dev",))
    K = 16 * n_global
    B = K * 8 * n_global
    modes = [int(Mode.USB), int(Mode.AM), int(Mode.FM)]
    pfb = OversampledPFB.create(K, B, taps_per_branch=8, mxu_dft=True)
    dm = MixedDemod.create([modes[(3 * i) // K] for i in range(K)],
                           sample_rate=96000.0, channels=K)
    step = make_sharded_pfb_step(pfb, dm, mesh)
    dm_s = shard_tree_multihost(dm, mesh, K, axis="dev")
    st_s = shard_tree_multihost(dm.init_state(K), mesh, K, axis="dev")

    rng = np.random.default_rng(7)
    xs = [(rng.standard_normal((1, B)) + 1j * rng.standard_normal((1, B))
           ).astype(np.complex64) for _ in range(args.blocks)]
    H = pfb.P * K - K // 2
    hist = jax.make_array_from_callback(
        (1, H), NamedSharding(mesh, P()),
        lambda idx: np.zeros((1, H), np.complex64)[idx])
    audio = None
    xsh = NamedSharding(mesh, P(None, "dev"))
    for xh in xs:
        x = jax.make_array_from_callback((1, B), xsh,
                                         lambda idx, xh=xh: xh[idx])
        st_s, hist, audio, spec = step(dm_s, st_s, hist, x)
    shards = sorted(audio.addressable_shards,
                    key=lambda s: s.index[1].start)
    rows = np.concatenate([np.asarray(s.data) for s in shards], axis=1)
    lo = shards[0].index[1].start
    hi = shards[-1].index[1].stop
    os.makedirs(args.outdir, exist_ok=True)
    np.savez(os.path.join(args.outdir, f"pfb_p{args.pid}.npz"),
             audio=rows[0], lo=lo, hi=hi,
             process_count=jax.process_count())
    print(f"dcn_worker PFB pid={args.pid} OK: {K}ch over "
          f"{jax.process_count()} processes x "
          f"{args.devices_per_proc} devices, rows [{lo},{hi})")
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
