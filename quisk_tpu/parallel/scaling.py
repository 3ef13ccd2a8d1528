"""Scaling-efficiency harness: samples/s at 1..N devices, strong and weak.

The BASELINE target is ">=80% efficiency from 1 chip -> 1 host -> N>=2
hosts" (BASELINE.md; the reference's analogue is its multi-receiver fan-out,
quisk.c:3545, and the ac2yd/ two-machine split).  This module measures it:
the sharded flagship receive step is timed at increasing device counts and
the throughput/efficiency table is printed by ``dryrun_multichip`` and by
``bench.py --scaling``.

Weak scaling holds the per-device channel count fixed (the production
shape: more chips -> more receivers); strong scaling holds the total fixed.
Efficiency(n) = throughput(n) / (n * throughput(1)) for weak scaling.

On the virtual-CPU mesh (tests, the driver's dry run) all "devices" share
one host's cores, so the absolute numbers only validate the harness; on a
real slice the same code measures ICI-scaled throughput.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quisk_tpu.parallel.shard import (make_mesh, make_sharded_step,
                                      shard_over_channels)


@dataclasses.dataclass
class ScalePoint:
    devices: int
    channels: int
    samples_per_s: float
    efficiency: float      # raw: throughput(n) / (n * throughput(1))
    eff_of_ideal: float    # efficiency / the mesh's ideal (see below)
    step_ms: float
    #: relative spread of the timing samples (max-min)/median; with
    #: iters=1 there is no spread estimate and this is NaN — the table
    #: flags such points as smoke-only (not quotable)
    noise_pct: float = float("nan")


def _time_step(step, chain, state, x, iters: int,
               sync: Callable) -> tuple[float, float]:
    """(median, relative spread) wall time per step, honest sync per
    iteration.  The spread is the quotability guard: a loaded CI box
    yields pure-noise efficiency points, and iters=1 cannot even
    estimate it (returns NaN spread)."""
    state, audio = step(chain, state, x)      # warm up / compile
    sync(audio)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, audio = step(chain, state, x)
        sync(audio)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = ((max(times) - min(times)) / med) if iters > 1 else float("nan")
    return med, spread


def measure_scaling(device_counts: Sequence[int] = (1, 2, 4, 8),
                    channels_per_device: int = 16,
                    sample_rate: float = 192000.0,
                    audio_block: int = 512,
                    iters: int = 5,
                    weak: bool = True,
                    make_chain: Callable | None = None,
                    shared_silicon: bool | None = None) -> list[ScalePoint]:
    """Time the sharded flagship step at each device count.

    ``make_chain(channels)`` defaults to the __graft_entry__ flagship; the
    1-device point anchors efficiency.  Returns points sorted by devices.

    ``eff_of_ideal`` normalizes raw efficiency to what the MESH can
    ideally deliver: 1.0 per device on a real slice (every device adds
    silicon), 1/n on a shared-silicon virtual mesh (xla_force_host_
    platform_device_count slices ONE host's cores, so n "devices" doing n
    units of work can at best hold total throughput flat).  Autodetected
    from the platform unless ``shared_silicon`` is forced; on a real TPU
    slice eff_of_ideal == efficiency and the table is unchanged.
    """
    if make_chain is None:
        import __graft_entry__
        make_chain = lambda c: __graft_entry__._flagship(
            channels=c, sample_rate=sample_rate, audio_block=audio_block)

    avail = len(jax.devices())
    counts = [n for n in device_counts if n <= avail]
    base_channels = channels_per_device * (1 if weak else max(counts))
    if shared_silicon is None:
        shared_silicon = jax.devices()[0].platform == "cpu"

    def sync(audio):
        # block_until_ready alone has returned early on the axon runtime;
        # force a tiny host fetch (CLAUDE.md)
        float(jnp.sum(jnp.abs(audio[0, :1])))

    points: list[ScalePoint] = []
    anchor = None
    for n in counts:
        C = channels_per_device * n if weak else base_channels
        mesh = make_mesh(n)
        chain = make_chain(C)
        state = chain.init_state()
        chain_s = shard_over_channels(chain, mesh, C)
        state_s = shard_over_channels(state, mesh, C)
        x = jax.device_put(
            jnp.zeros((C, chain.block_in), dtype=jnp.complex64),
            NamedSharding(mesh, P("chan", None)))

        # explicit shard_map: collective-free by construction (the plain
        # GSPMD jit gathers every FFT's batch dim — see make_sharded_step)
        step = make_sharded_step(chain, mesh, C)

        dt, spread = _time_step(step, chain_s, state_s, x, iters, sync)
        sps = C * chain.block_in / dt
        if anchor is None:
            anchor = sps / n
        eff = sps / (n * anchor)
        ideal = (1.0 / n) if shared_silicon else 1.0
        points.append(ScalePoint(devices=n, channels=C, samples_per_s=sps,
                                 efficiency=eff, eff_of_ideal=eff / ideal,
                                 step_ms=dt * 1e3, noise_pct=spread))
    return points


def measure_timeshard(mesh, channels: int, n_samples: int,
                      sample_rate: float = 192000.0,
                      iters: int = 3) -> tuple[float, float]:
    """Time the (chan, time) halo-exchange receive path on ``mesh``:
    whole-capture SSB over ppermute FIR halos (parallel/timeshard.py).
    Returns (samples_per_s, step_ms) — the timeshard point of the
    scaling table."""
    from quisk_tpu.ops import design
    from quisk_tpu.parallel.timeshard import timeshard_rx

    rng = np.random.default_rng(0)
    iq = jax.device_put(
        (rng.standard_normal((channels, n_samples))
         + 1j * rng.standard_normal((channels, n_samples))
         ).astype(np.complex64),
        NamedSharding(mesh, P("chan", "time")))
    stages = [(design.halfband(45), 2), (design.halfband(45), 2)]
    bp = design.bandpass_analytic(129, 300.0, 3100.0, 48000.0)

    @jax.jit
    def step(iq_in):
        return timeshard_rx(iq_in, mesh, sample_rate=sample_rate,
                            tune_hz=10000.0, stages=stages, bp_taps=bp,
                            mode="ssb")

    audio = step(iq)
    audio.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        audio = step(iq)
        float(jnp.sum(jnp.abs(audio[0, :1])))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return channels * n_samples / dt, dt * 1e3


def format_table(points: Sequence[ScalePoint], title: str = "weak") -> str:
    lines = [f"scaling ({title}): devices  channels  Msps  "
             "eff(raw)  of-ideal  ms/step"]
    shaky = False
    for p in points:
        flag = ""
        if not np.isfinite(p.noise_pct) or p.noise_pct > 0.25:
            flag, shaky = "  *", True
        lines.append(f"  {p.devices:7d}  {p.channels:8d}  "
                     f"{p.samples_per_s / 1e6:8.1f}  {p.efficiency:8.2%}  "
                     f"{p.eff_of_ideal:8.2%}  {p.step_ms:7.2f}{flag}")
    if shaky:
        lines.append("  * timing spread >25% or iters too few for a "
                     "spread estimate — harness smoke only, NOT a "
                     "quotable efficiency")
    return "\n".join(lines)
