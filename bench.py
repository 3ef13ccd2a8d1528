"""Benchmark: aggregate IQ throughput of the full receive chain on one chip.

Flagship config: 1024 independent channels of 960 kHz complex IQ, each
tune -> /20 decimation (2x HB45 + /5 FIR) -> 1025-tap analytic channel
filter (overlap-save) -> mixed SSB/AM/FM demod -> AGC -> 48 kHz audio.

Metric: aggregate input IQ megasamples/s/chip through the whole chain.
vs_baseline: ratio to the reference's implicit single-thread contract of
1.333 Msps max input rate (quisk.c:1762-1768; BASELINE.md) — i.e. the
"x real-time" multiple.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache (the reference caches FFTW wisdom the same
# way, quisk.c:668-677); first compile over the axon tunnel is minutes.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig

    C = 1024
    FS = 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048, agc=True)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    chain = RxChain.create(
        cfg,
        tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)],
    )

    key = jax.random.key(0)
    x = (jax.random.normal(key, (C, chain.block_in), dtype=jnp.float32)
         + 1j * jax.random.normal(jax.random.key(1), (C, chain.block_in),
                                  dtype=jnp.float32)).astype(jnp.complex64)
    state = chain.init_state()

    # NOTE: chain is a jit *argument*, not a closure constant — the axon
    # backend cannot fetch device complex64 back to host, which closure
    # constant lowering would require.
    @jax.jit
    def step(chain, state, x):
        return chain.step(state, x)

    # warmup / compile
    state, audio = step(chain, state, x)
    jax.block_until_ready((state, audio))

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, audio = step(chain, state, x)
    jax.block_until_ready((state, audio))
    dt = time.perf_counter() - t0

    samples = C * chain.block_in * iters
    msps = samples / dt / 1e6
    baseline_msps = 1.333  # reference max single-thread input rate
    print(json.dumps({
        "metric": "aggregate IQ Msamples/s/chip (tune+decim+OLS FIR+demod+AGC, 1024ch @960k)",
        "value": round(msps, 1),
        "unit": "Msps",
        "vs_baseline": round(msps / baseline_msps, 1),
    }))


if __name__ == "__main__":
    main()
