"""Benchmarks on one TPU chip.  Default: the flagship RX chain, ONE JSON
line (the driver's contract).  ``--all`` additionally benches the
4096-channel oversampled PFB channelizer (BASELINE config #5), the TX
chain, and a per-stage breakdown with a FLOP/byte roofline estimate,
writing the full report to BENCH_DETAIL.md.

Flagship config: 1024 independent channels of 960 kHz complex IQ, each
tune -> /20 decimation (2x HB45 + /5 FIR) -> 1025-tap analytic channel
filter (overlap-save) -> mixed SSB/AM/FM demod -> AGC -> 48 kHz audio.

Metric: aggregate input IQ megasamples/s/chip through the whole chain.
vs_baseline: ratio to the reference's implicit single-thread contract of
1.333 Msps max input rate (quisk.c:1762-1768; BASELINE.md).

Timing notes (CLAUDE.md): block_until_ready alone can return early on the
axon runtime, so every measurement ends with a tiny host fetch; the timed
loops issue dispatches asynchronously, so every number is a SUSTAINED
pipelined rate (per-dispatch latency is reported separately in --all).
All loops report the best of several windows (`_timed_best`): the shared
tunnel runtime non-deterministically drops from pipelined ~3 ms dispatch
overlap to serialized ~50-70 ms round-trips under external contention,
and a single averaged loop would measure that contention, not the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

def enable_compile_cache() -> None:
    """Persistent compilation cache (the reference caches FFTW wisdom the
    same way, quisk.c:668-677); first compile over the axon tunnel is
    minutes.  Called from main() and by bench probes — deliberately NOT a
    module-import side effect: tests import this module for helpers, and
    a pytest process sharing `.jax_cache/` with concurrent/interrupted
    bench runs segfaulted inside the cache deserializer (r4 root cause of
    the full-suite 'Fatal Python error' aborts: jax _cache_read on a torn
    entry)."""
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# TPU v5e (v5 lite) public peaks, for the roofline columns
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def measure_hbm_gbps(iters: int = 25) -> float:
    """Device-EFFECTIVE HBM bandwidth right now: a fused elementwise
    a*k+b over [1024, 40960] f32 (3 arrays of 168 MB traffic).  The
    shared tunnel chip has measured 60-220 GB/s effective vs the 819
    nominal — HBM%% columns against the nominal peak are lower bounds;
    this calibration line makes them interpretable per run."""
    x = jax.device_put(np.ones((1024, 40960), np.float32))
    y = jax.device_put(np.full((1024, 40960), 2.0, np.float32))
    f = jax.jit(lambda a, b: a * np.float32(1.0000001) + b)
    float(jnp.sum(f(x, y)))
    dt = _timed_best(lambda _s: (None, f(x, y)), None, iters)
    return 3 * x.size * 4 / dt / 1e9

BASELINE_MSPS = 1.333   # reference max single-thread input rate


def _sync(x) -> None:
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    float(jnp.sum(jnp.abs(leaf.reshape(-1)[:1])))


def _timed_best(dispatch, cur, iters: int, windows: int = 5) -> float:
    """Seconds/iteration over the BEST of ``windows`` pipelined windows.

    The axon tunnel runtime non-deterministically degrades from async
    pipelining (~3 ms/dispatch overlap) to synchronous ~46-70 ms
    round-trips under external contention — measured: the identical
    program/loop 46.2 then 3.3 ms/block back-to-back.  The best window
    is the sustained rate the chip actually achieves; a single long loop
    averages someone else's traffic into our number.
    """
    per = max(1, iters // windows)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(per):
            cur, out = dispatch(cur)
        _sync((cur, out))
        best = min(best, (time.perf_counter() - t0) / per)
    return best


def _build_flagship():
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig

    C = 1024
    FS = 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fused_frontend=True)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    chain = RxChain.create(
        cfg,
        tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)],
    )
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, chain.block_in))
         + 1j * rng.standard_normal((C, chain.block_in))).astype(np.complex64)
    return chain, x


def bench_flagship(iters: int = 50, latency: bool = False,
                   nblk: int | None = None) -> dict:
    """nblk=None measures 1, 4 and 8 blocks/dispatch and reports the
    best: on a quiet tunnel the async dispatch pipeline already overlaps
    the ~3.6 ms floor and nblk=1 schedules slightly better (4308 vs 3986
    Msps), but under external contention the runtime serializes round
    trips (~14-70 ms/dispatch) and batching blocks per dispatch amortizes
    exactly that (measured contended: 1939 Msps best-of-{1,4} vs 3413 at
    nblk=8; 16 blocks would put the f32-pair input alone at 2.7 GB)."""
    if nblk is None:
        # batched candidates keep >=3 dispatches per timed window so they
        # are measured pipelined like nblk=1, not as one-dispatch latency
        cands = [bench_flagship(iters, latency, nblk=1)]
        cands += [bench_flagship(max(16, iters // k), latency, nblk=k)
                  for k in (4, 8)]
        return max(cands, key=lambda r: r["value"])
    # No complex64 may cross the host<->device boundary on the axon TPU
    # runtime: chain/state/input are packed into (re, im) float32 pairs and
    # rebuilt with lax.complex inside jit (quisk_tpu.utils.boundary).
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    chain, x = _build_flagship()
    xs = np.concatenate([x] * nblk, axis=-1)
    step = make_boundary_step(
        (lambda ch, st, xx: ch.step(st, xx)) if nblk == 1
        else (lambda ch, st, xx: ch.step_blocks(st, xx, nblk)))
    # pin everything on-device once: the production ingest path double-
    # buffers device feeds the same way, and host numpy args would be
    # re-transferred per dispatch, timing PCIe/tunnel instead of compute
    pchain = jax.device_put(pack_tree(chain))
    pstate = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(xs))

    pstate, audio = step(pchain, pstate, px)      # warmup / compile
    _sync(audio)

    dt = _timed_best(lambda st: step(pchain, st, px), pstate, iters)
    msps = chain.channels * chain.block_in * nblk / dt / 1e6
    out = {
        "metric": "aggregate IQ Msamples/s/chip (tune+decim+OLS FIR+demod+AGC, 1024ch @960k)",
        "value": round(msps, 1),
        "unit": "Msps",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        # regime self-description: which dispatch batching won and the
        # sustained per-block time, so round-over-round BENCH deltas are
        # attributable to code vs tunnel-contention regime (VERDICT r2)
        "blocks_per_dispatch": nblk,
        "sustained_ms_per_block": round(dt / nblk * 1e3, 2),
    }
    if latency:
        # per-dispatch latency: sync every iteration
        st = pstate
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            st, audio = step(pchain, st, px)
            _sync(audio)
            lat.append(time.perf_counter() - t0)
        out["latency_ms_per_dispatch"] = round(float(np.median(lat)) * 1e3, 2)
    return out


# --------------------------------------------------------------- stages
def _fft_flops(n: int) -> float:
    return 5.0 * n * np.log2(n)


def bench_stages(iters: int = 20) -> list[dict]:
    """Per-stage profile of the flagship by PREFIX DIFFERENCING.

    Timing each op as its own dispatch is hopeless on this runtime: the
    per-dispatch overhead over the axon tunnel (tens of ms) dwarfs every
    on-chip stage, so a table of separately-jitted stages measures the
    tunnel, not the chain (observed: every stage 20-50 ms while the fused
    whole chain runs 10 ms).  Instead we jit chain *prefixes* — identity,
    front, front+decim0, ... full — each dispatched exactly like the
    flagship loop (state-chained, pipelined, one sync), and report the
    *difference* between consecutive prefixes: fixed dispatch overhead
    cancels, and each delta is the marginal fused cost of adding that
    stage.  Small negative deltas are timing noise on cheap stages.

    FLOPs are algorithmic f32 counts; Precision.HIGHEST dots run as
    multi-pass bf16 on the MXU (~3-6x the listed FLOPs executed).
    """
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    chain, x = _build_flagship()
    C, B = chain.channels, chain.block_in
    assert chain.front is not None and chain.agc is not None
    nstage = len(chain.stages)

    def prefix_body(ch, k, st, xx):
        """Run the first k ops of the chain (0 = identity pass-through)."""
        st = dict(st)
        y = xx
        if k >= 1:
            st["front"], y = ch.front(st["front"], y)
        new_stage_states = []
        for i, (op, s) in enumerate(zip(ch.stages, st["stages"])):
            if k >= 2 + i:
                s, y = op(s, y)
            new_stage_states.append(s)
        st["stages"] = tuple(new_stage_states)
        if k >= 2 + nstage:
            st["bp"], y = ch.bp(st["bp"], y)
        if k >= 3 + nstage:
            st["demod"], y = ch.demod(st["demod"], y)
        if k >= 4 + nstage:
            st["agc"], y = ch.agc(st["agc"], y)
        return st, y

    pchain = jax.device_put(pack_tree(chain))
    pstate0 = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))

    def timed_prefix(k) -> float:
        stepf = make_boundary_step(
            lambda ch, st, xx: prefix_body(ch, k, st, xx))
        st, out = stepf(pchain, pstate0, px)      # compile
        _sync(out)
        return _timed_best(lambda s: stepf(pchain, s, px), pstate0, iters)

    # analytic FLOP / HBM-byte estimates per marginal stage.  The fused
    # front now absorbs the whole leading decimator cascade (T combined
    # taps, /decim in one pass), so its row reflects front.ntaps/decim.
    n1 = B // chain.front.decim
    est = [("dispatch floor (identity prefix)", 0.0, 0.0),
           (f"front: fused tune+decim/{chain.front.decim} "
            f"(Pallas, T={chain.front.ntaps})",
            C * B * (14 + 6) + C * n1 * chain.front.ntaps * 4,
            C * (B + n1) * 8 + C * B * 8)]
    b = n1
    for i, op in enumerate(chain.stages):
        M = op.Mg if hasattr(op, "Mg") else op.M
        K, R = M.shape
        nblk = (op.block // op.decim) // R
        kind = ("halfband polyphase" if hasattr(op, "Mg")
                else f"matmul /{op.decim}")
        est.append((f"decim stage {i} ({kind}, T={op.ntaps})",
                    2 * (2 * C) * nblk * K * R,
                    (2 * C * nblk * K + 2 * C * nblk * R) * 4 + K * R * 4))
        b //= op.decim
    nfft = chain.bp.nfft
    est.append((f"bandpass OLS (T={chain.bp.ntaps}, nfft={nfft})",
                C * (2 * _fft_flops(nfft) + 6 * nfft),
                C * (3 * nfft) * 8 + C * nfft * 8))
    est.append(("mixed demod (SSB+AM+FM)", C * b * 60, C * b * 8 * 2))
    est.append(("AGC (scan)", C * b * 40, C * b * 4 * 2))

    times = [timed_prefix(k) for k in range(len(est))]
    results = [{"stage": "dispatch floor (identity prefix)",
                "ms": round(times[0] * 1e3, 3), "gflops": 0.0,
                "gbytes": 0.0, "mfu_pct": 0.0, "hbm_pct": 0.0}]
    for k in range(1, len(est)):
        name, flops, bytes_ = est[k]
        dt = times[k] - times[k - 1]
        measurable = dt > 1e-6            # negative/zero delta: noise only
        results.append({
            "stage": name, "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(bytes_ / 1e9, 3),
            "mfu_pct": (round(100 * flops / dt / PEAK_BF16_FLOPS, 2)
                        if measurable else 0.0),
            "hbm_pct": (round(100 * bytes_ / dt / PEAK_HBM_BPS, 1)
                        if measurable else 0.0),
        })
    return results


def bench_nfm_stages(iters: int = 20) -> list[dict]:
    """NFM chain per-stage profile by the same prefix-differencing method
    as bench_stages (VERDICT r3 weak-2: no stage table existed for
    config #3).  Prefixes: identity, fused front (/4), bandpass OLS,
    FM demod, AGC, FM squelch (measure+apply)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    C = 1024
    FS = 192000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fm_squelch=True, fused_frontend=True)
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=int(Mode.FM))
    assert chain.front is not None and not chain.stages \
        and chain.frac is None
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((C, chain.block_in))
         + 1j * rng.standard_normal((C, chain.block_in))).astype(np.complex64)

    def prefix_body(ch, k, st, xx):
        st = dict(st)
        y = xx
        if k >= 1:
            st["front"], y = ch.front(st["front"], y)
        if k >= 2:
            st["bp"], y = ch.bp(st["bp"], y)
        if k >= 5:
            rf_db = ch.fm_sq.measure(y)
        if k >= 3:
            st["demod"], y = ch.demod(st["demod"], y)
        if k >= 4:
            st["agc"], y = ch.agc(st["agc"], y)
        if k >= 5:
            st["fm_sq"], y = ch.fm_sq(st["fm_sq"], y, rf_db)
        return st, y

    pchain = jax.device_put(pack_tree(chain))
    pstate0 = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))
    names = ["dispatch floor (identity prefix)",
             f"front: fused tune+decim/{chain.front.decim} "
             f"(Pallas, T={chain.front.ntaps})",
             f"bandpass OLS (T={chain.bp.ntaps}, nfft={chain.bp.nfft})",
             "FM demod (discriminator + de-emphasis)",
             "AGC (scan)",
             "FM squelch (RF measure + mute)"]

    def timed_prefix(k) -> float:
        stepf = make_boundary_step(
            lambda ch, st, xx: prefix_body(ch, k, st, xx))
        st, out = stepf(pchain, pstate0, px)
        _sync(out)
        return _timed_best(lambda s: stepf(pchain, s, px), pstate0, iters)

    times = [timed_prefix(k) for k in range(len(names))]
    out = [{"stage": names[0], "ms": round(times[0] * 1e3, 3)}]
    for k in range(1, len(names)):
        dt = times[k] - times[k - 1]
        out.append({"stage": names[k], "ms": round(dt * 1e3, 3)})
    return out


# ----------------------------------------------------------------- PFB
def bench_pfb(iters: int = 20, K: int = 4096, mult: int | None = None,
              mxu_dft: bool | None = None, fused: bool = True) -> dict:
    """BASELINE config #5 engine: 4096-channel 2x-oversampled PFB
    channelizer + mixed demod + per-channel power spectrum, single chip.

    ``fused=True`` (default) runs :class:`PFBRxPipeline` — the demod
    consumes the IDFT output planes TIME-MAJOR, so the [K, 2B/K]
    channel-major complex batch (536 MB at flagship shape) never
    materializes in HBM (VERDICT r4 item 1; the r4 pipeline's ~21 ms
    demod marginal was that batch's write + re-read).  ``fused=False``
    keeps the r4 corner-turn path for the A/B row.

    ``mxu_dft=None`` A/Bs the cross-branch IDFT — jnp.fft.ifft vs the
    two-stage MXU matmul DFT (ops/mxdft.py, VERDICT r3 item 3) — and
    reports the winner with both numbers attached."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import OversampledPFB, PFBRxPipeline
    from quisk_tpu.ops.demod import GroupedDemod
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    if mult is None:
        # dispatch-floor amortization sweep: the r5 prefix profile put
        # whole-pipeline COMPUTE at ~15.5 ms for 33.5 M samples while the
        # contended tunnel floor alone was ~27 ms — doubling the block
        # per dispatch halves the floor share (the PFB analogue of the
        # flagship's blocks-per-dispatch sweep)
        cands = [bench_pfb(iters, K, m, mxu_dft, fused)
                 for m in ((8192, 16384, 32768) if fused else (8192,))]
        return max(cands, key=lambda r: r["value"])
    if mxu_dft is None:
        if fused:        # the Pallas path owns its stage split; no A/B
            return bench_pfb(iters, K, mult, mxu_dft=True, fused=True)
        a = bench_pfb(iters, K, mult, mxu_dft=False, fused=fused)
        b = bench_pfb(iters, K, mult, mxu_dft=True, fused=fused)
        win = max((a, b), key=lambda r: r["value"])
        win["ab_idft_msps"] = {"fft": a["value"], "mxu_matmul": b["value"]}
        return win

    S = 1                     # wideband streams
    B = K * mult              # input samples per dispatch: K*32 and K*64
                              # measured dispatch-floor-bound (~11-14 ms
                              # regardless); after the accumulation
                              # formulation cut the polyphase pass to
                              # ~0.05 ms marginal, even K*1024 was ~80%
                              # dispatch floor — K*4096 (16.8 M samples)
                              # still measured 30.2% floor on a contended
                              # r3 window; K*8192 (33.5 M samples, 268 MB
                              # in) halves the floor share again
    # contiguous mode quarters -> grouped demod runs each family only on
    # its own channels as static slices (MixedDemod computes all three
    # families on all K channels + mask selects: each extra family is a
    # full pass over the [K, 2B/K] batch — 268 MB here)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    mode_vec = [modes[(4 * i) // K] for i in range(K)]

    if fused:
        # r5: stage-2 IDFT + demod + spectrum as ONE Pallas kernel — the
        # XLA time-major arrangement measured within noise of the r4
        # corner turn (53.7 vs 54.2 ms same-window) because dot-output
        # materialization, not demod reads, bounds the XLA pipeline
        pipe = PFBRxPipeline.create(K, B, mode_vec,
                                    channel_rate=2.0 * 48000.0,
                                    pallas_poly=True, pallas_demod=True)

        def fn(st, x):
            return pipe(st, x)

        init_state = lambda: pipe.init_state(S)
    else:
        pfb = OversampledPFB.create(K, B, taps_per_branch=8,
                                    mxu_dft=mxu_dft, pallas_poly=True)
        demod = GroupedDemod.create(mode_vec, sample_rate=2.0 * 48000.0,
                                    channels=K)

        def fn(st, x):
            pfb_st, dm_st = st
            pfb_st, ch = pfb(pfb_st, x)           # [S, K, 2B/K]
            ch2 = ch.reshape(S * K, -1)
            dm_st, audio = demod(dm_st, ch2)
            spec = jnp.mean(jnp.abs(ch2) ** 2, axis=-1)  # per-chan power
            return (pfb_st, dm_st), (audio, spec)

        init_state = lambda: (pfb.init_state(S), demod.init_state(S * K))

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((S, B))
         + 1j * rng.standard_normal((S, B))).astype(np.complex64)
    st = init_state()
    stepf = make_boundary_step(fn)
    pst = jax.device_put(pack_tree(st))
    px = jax.device_put(pack_tree(x))
    new_st, out = stepf(pst, px)
    _sync(out)
    dt = _timed_best(lambda st: stepf(st, px), pst, iters)
    # dispatch-floor share: an identity program with the same state/input
    # tree, timed the same way — its whole cost is the per-dispatch tunnel
    # overhead, so floor/dt says how much of the PFB number is dispatch,
    # not compute (VERDICT r2: the K*64 config was ~80% floor)
    idf = make_boundary_step(lambda st, x: (st, jnp.real(x[:, :8]) * 1.0))
    ist, iout = idf(pst, px)
    _sync(iout)
    floor = _timed_best(lambda st: idf(st, px), pst, iters)
    msps = S * B / dt / 1e6
    return {
        "metric": f"PFB channelizer {K}ch x2-oversampled + mixed demod + spectrum",
        "value": round(msps, 1), "unit": "Msps input",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        "ms_per_block": round(dt * 1e3, 2),
        "dispatch_floor_pct": round(100.0 * floor / dt, 1),
        "idft": ("pallas stage-2" if fused
                 else ("mxu_matmul" if mxu_dft else "fft")),
        "demod": "pallas fused kernel" if fused else "corner-turn (r4)",
        "samples_per_dispatch": S * B,
    }


# ------------------------------------------------------- featured chain
def bench_featured(iters: int = 20, nblk: int | None = None) -> dict:
    """Flagship chain with every optional RX stage enabled: noise blanker
    on raw IQ, FFT auto-notch, LMS ANF, spectral NR (NR2 gain tables),
    SSB + FM squelch — the cost of the full WDSP-style feature set that
    BENCH's default flagship omits (VERDICT round-1 weak #2).  Sustained
    throughput via the same blocks-per-dispatch sweep as the flagship
    (single-block dispatch buries the chain under the ~10 ms tunnel
    floor: 23.1 vs 15.5 ms/block measured at nblk=8)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    if nblk is None:
        cands = [bench_featured(iters, nblk=1)]
        cands += [bench_featured(max(10, iters // k), nblk=k)
                  for k in (4, 8)]
        return max(cands, key=lambda r: r["value"])
    C = 1024
    FS = 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fused_frontend=True,
                        noise_blanker=2, auto_notch=True, nr=True,
                        anf=True, squelch=True, fm_squelch=True)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    chain = RxChain.create(
        cfg,
        tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)],
    )
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, nblk * chain.block_in))
         + 1j * rng.standard_normal((C, nblk * chain.block_in))
         ).astype(np.complex64)
    step = make_boundary_step(
        (lambda ch, st, xx: ch.step(st, xx)) if nblk == 1
        else (lambda ch, st, xx: ch.step_blocks(st, xx, nblk)))
    pchain = jax.device_put(pack_tree(chain))
    pstate = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))
    cur, audio = step(pchain, pstate, px)
    _sync(audio)
    dt = _timed_best(lambda st: step(pchain, st, px), pstate, iters)
    msps = C * chain.block_in * nblk / dt / 1e6
    return {
        "metric": "featured chain 1024ch @960k (+NB, auto-notch, ANF, NR2, SSB+FM squelch)",
        "value": round(msps, 1), "unit": "Msps",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        "blocks_per_dispatch": nblk,
        "ms_per_block": round(dt / nblk * 1e3, 2),
    }


def bench_featured_stages(iters: int = 10) -> list[dict]:
    """Marginal cost of each OPTIONAL RX stage by prefix differencing.

    Same method as bench_stages: jit the featured chain with the optional
    stages enabled one at a time in their real step order (quisk.c:2289 /
    RXA order), time each pipelined, and report consecutive differences —
    the fused marginal cost of that stage inside the full program.  The
    baseline row is the flagship path (front+decim+OLS+demod+AGC) built
    from the featured config, so the rows sum to bench_featured's block
    time up to fusion/timing noise.
    """
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    C = 1024
    FS = 960000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fused_frontend=True,
                        noise_blanker=2, auto_notch=True, nr=True,
                        anf=True, squelch=True, fm_squelch=True)
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    chain = RxChain.create(
        cfg,
        tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=[modes[i % 4] for i in range(C)],
    )
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, chain.block_in))
         + 1j * rng.standard_normal((C, chain.block_in))
         ).astype(np.complex64)

    order = ["nb", "notch", "anf", "nr", "squelch", "fm_sq"]

    def prefix_body(ch, k, st, xx):
        """Base chain plus the first k optional stages (in step order)."""
        on = set(order[:k])
        st = dict(st)
        y = xx
        if "nb" in on:
            st["nb"], y = ch.nb(st["nb"], y)
        st["front"], y = ch.front(st["front"], y)
        new_stage_states = []
        for op, s in zip(ch.stages, st["stages"]):
            s, y = op(s, y)
            new_stage_states.append(s)
        st["stages"] = tuple(new_stage_states)
        st["bp"], y = ch.bp(st["bp"], y)
        if "fm_sq" in on:
            rf_db = ch.fm_sq.measure(y)
        st["demod"], audio = ch.demod(st["demod"], y)
        if "notch" in on:
            st["notch"], audio = ch.notch(st["notch"], audio)
        if "anf" in on:
            st["anf"], audio = ch.anf(st["anf"], audio)
        if "nr" in on:
            st["nr"], audio = ch.nr(st["nr"], audio)
        st["agc"], audio = ch.agc(st["agc"], audio)
        if "squelch" in on:
            st["squelch"], audio = ch.squelch(st["squelch"], audio)
        if "fm_sq" in on:
            st["fm_sq"], audio = ch.fm_sq(st["fm_sq"], audio, rf_db)
        return st, audio

    pchain = jax.device_put(pack_tree(chain))
    pstate0 = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))

    def timed_prefix(k) -> float:
        stepf = make_boundary_step(
            lambda ch, st, xx: prefix_body(ch, k, st, xx))
        st, out = stepf(pchain, pstate0, px)      # compile
        _sync(out)
        return _timed_best(lambda s: stepf(pchain, s, px), pstate0, iters)

    names = ["base chain (front+decim+OLS+demod+AGC)",
             "noise blanker lvl 2 (raw IQ, banded matmuls)",
             "FFT auto-notch (design+OLS apply)",
             "LMS ANF (FDAF block LMS)",
             "spectral NR2 (MMSE-LSA)",
             "SSB squelch (spectral flatness)",
             "FM squelch (RF measure + gate)"]
    times = [timed_prefix(k) for k in range(len(names))]
    # noise floor of the differencing: re-time the base prefix and take
    # the spread — marginals inside it are unresolvable at these iters
    # (VERDICT r2: negative sub-noise rows read as nonsense)
    base2 = timed_prefix(0)
    noise_ms = max(0.25, abs(base2 - times[0]) * 1e3)
    out = [{"stage": names[0], "ms": round(times[0] * 1e3, 3)}]
    for k in range(1, len(names)):
        d_ms = (times[k] - times[k - 1]) * 1e3
        row = {"stage": names[k], "ms": round(d_ms, 3)}
        if abs(d_ms) < noise_ms:
            row["below_noise_ms"] = round(noise_ms, 3)
        out.append(row)
    return out


# ----------------------------------------------------------------- NFM
def bench_nfm(iters: int = 20, nblk: int | None = None) -> dict:
    """BASELINE config #3: the 192 k NFM chain (FM discriminator +
    de-emphasis + FM squelch), 1024 channels.  Fused Pallas front (the
    /4 = 2*2 cascade fuses like the flagship's /20) + the flagship's
    blocks-per-dispatch sweep — at 8.39 M samples per block the r3
    single-block window was mostly tunnel dispatch floor (VERDICT r3
    weak-2: 12.39 ms/block of which the contended floor is 3.6-14 ms)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    if nblk is None:
        cands = [bench_nfm(iters, nblk=1)]
        cands += [bench_nfm(max(12, iters // k), nblk=k) for k in (4, 8)]
        return max(cands, key=lambda r: r["value"])
    C = 1024
    FS = 192000.0
    cfg = RxChainConfig(sample_rate=FS, channels=C, audio_block=2048,
                        agc=True, fm_squelch=True, fused_frontend=True)
    chain = RxChain.create(
        cfg, tune_hz=[(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)],
        mode=int(Mode.FM))
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((C, nblk * chain.block_in))
         + 1j * rng.standard_normal((C, nblk * chain.block_in))
         ).astype(np.complex64)
    step = make_boundary_step(
        (lambda ch, st, xx: ch.step(st, xx)) if nblk == 1
        else (lambda ch, st, xx: ch.step_blocks(st, xx, nblk)))
    pchain = jax.device_put(pack_tree(chain))
    pstate = jax.device_put(pack_tree(chain.init_state()))
    px = jax.device_put(pack_tree(x))
    cur, audio = step(pchain, pstate, px)
    _sync(audio)
    dt = _timed_best(lambda st: step(pchain, st, px), pstate, iters)
    msps = C * chain.block_in * nblk / dt / 1e6
    return {
        "metric": "NFM chain 1024ch @192k (discriminator+deemph+FM squelch, BASELINE config 3)",
        "value": round(msps, 1), "unit": "Msps",
        "vs_baseline": round(msps / BASELINE_MSPS, 1),
        "blocks_per_dispatch": nblk,
        "ms_per_block": round(dt / nblk * 1e3, 2),
    }


# ------------------------------------------------------------------ TX
def bench_tx(iters: int = 20, nblk: int | None = None) -> dict:
    """TX chain: voice -> SSB/FM modulated IQ at 192 k, 1024 channels.

    Sustained throughput via the blocks-per-dispatch sweep (the TX chain
    has no Pallas calls, so multi-block is a plain lax.scan — no Mosaic
    scan hang); single-block dispatch is mostly the ~10 ms tunnel floor."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.tx import TxChain, TxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree
    from quisk_tpu.io import sources

    if nblk is None:
        cands = [bench_tx(iters, nblk=1)]
        cands += [bench_tx(max(10, iters // k), nblk=k) for k in (4, 8)]
        return max(cands, key=lambda r: r["value"])
    C, B = 1024, 2048         # r01 ran 256 ch in ~29 ms/block — the ALC
                              # scans are time-axis loops with channels on
                              # the vector lanes, so widen the batch
    modes = [int(Mode.USB), int(Mode.FM)]
    tx = TxChain.create(
        TxChainConfig(channels=C, audio_block=B, tx_rate=192000.0,
                      compress_db=6.0, preemphasis=0.3),
        mode=[modes[i % 2] for i in range(C)])
    voice = sources.voice_like(48000.0, nblk * B).astype(np.float32)
    audio = np.broadcast_to(voice, (C, nblk * B)).copy()

    def many(st, a):
        if nblk == 1:
            return tx.step(st, a)
        ab = a.reshape(C, nblk, B).transpose(1, 0, 2)
        st, iqs = jax.lax.scan(lambda s, blk: tx.step(s, blk), st, ab)
        return st, jnp.moveaxis(iqs, 0, 1).reshape(C, nblk * tx.block_tx)

    stepf = make_boundary_step(many)
    pst = jax.device_put(pack_tree(tx.init_state()))
    pa = jax.device_put(pack_tree(audio))
    cur, iq = stepf(pst, pa)
    _sync(iq)
    dt = _timed_best(lambda st: stepf(st, pa), pst, iters)
    msps_out = C * tx.block_tx * nblk / dt / 1e6
    # reference contract: one 48 k mic channel real-time (microphone.c:1092)
    return {
        "metric": f"TX chain {C}ch voice->SSB/FM IQ @192k (bandpass+preemph+compress+ALC+mod+interp)",
        "value": round(msps_out, 1), "unit": "Msps output",
        "vs_baseline": round(msps_out * 1e6 / (0.192e6), 1),
        "blocks_per_dispatch": nblk,
        "ms_per_block": round(dt / nblk * 1e3, 2),
    }


def main():
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="also bench stages/PFB/TX and write BENCH_DETAIL.md")
    ap.add_argument("--iters", type=int, default=50,
                    help="timed iterations (reduce for CPU smoke tests)")
    ap.add_argument("--nblk", type=int, default=None,
                    help="blocks per dispatch in the flagship loop "
                         "(default: measure 1 and 4, report the best)")
    args = ap.parse_args()

    flag = bench_flagship(iters=args.iters, latency=args.all,
                          nblk=args.nblk)
    print(json.dumps({k: flag[k] for k in
                      ("metric", "value", "unit", "vs_baseline",
                       "blocks_per_dispatch", "sustained_ms_per_block")}))

    if not args.all:
        return
    it = max(3, args.iters // 2)
    stages = bench_stages(iters=it)
    feat = bench_featured(iters=it)
    feat_stages = bench_featured_stages(iters=it)
    nfm = bench_nfm(iters=it)
    nfm_stages = bench_nfm_stages(iters=it)
    pfb = bench_pfb(iters=it)
    # same-window A/B against the r4 corner-turn pipeline (mxu IDFT —
    # the r4 A/B winner at this shape)
    pfb_un = bench_pfb(iters=max(3, it // 2), mxu_dft=True, fused=False)
    tx = bench_tx(iters=it)
    for extra in (feat, nfm, pfb, pfb_un, tx):
        print(json.dumps(extra))

    hbm_eff = measure_hbm_gbps()
    lines = ["# BENCH_DETAIL — per-stage profile and roofline",
             "",
             f"Device: {jax.devices()[0].device_kind}; peaks used: "
             f"{PEAK_BF16_FLOPS/1e12:.0f} TFLOP/s bf16, "
             f"{PEAK_HBM_BPS/1e9:.0f} GB/s HBM.",
             "",
             f"Effective HBM this run (fused a*k+b streaming probe): "
             f"**{hbm_eff:.0f} GB/s** — the shared tunnel chip delivers a "
             "fraction of nominal and it varies run-to-run; HBM% columns "
             "(vs nominal) are lower bounds, multiply by "
             f"{PEAK_HBM_BPS/1e9/max(hbm_eff,1):.1f}x for this run's "
             "device-effective roofline.",
             "",
             "## Flagship (1024 ch x 960 kHz)", "",
             f"- sustained: {flag['value']} Msps "
             f"({flag.get('sustained_ms_per_block')} ms/block, "
             f"{flag.get('blocks_per_dispatch')} blocks/dispatch, pipelined)",
             f"- per-dispatch latency: {flag.get('latency_ms_per_dispatch')} "
             f"ms (includes ~3.6 ms tunnel dispatch overhead)",
             "",
             "## Stage breakdown (prefix differencing: each row is the",
             "## marginal pipelined cost of adding that stage to the chain)",
             "",
             "| stage | marginal ms/block | GFLOP | GB | MFU% (bf16 peak) | HBM% |",
             "|---|---|---|---|---|---|"]
    for s in stages:
        lines.append(f"| {s['stage']} | {s['ms']} | {s['gflops']} | "
                     f"{s['gbytes']} | {s['mfu_pct']} | {s['hbm_pct']} |")
    tot = sum(s["ms"] for s in stages)
    lines += ["",
              f"Floor + marginal sum: {tot:.2f} ms vs fused whole-chain "
              f"{flag.get('sustained_ms_per_block')} ms (small mismatch = "
              "prefix-boundary fusion differences + timing noise).",
              "",
              "FLOPs are algorithmic f32; Precision.HIGHEST dots execute as",
              "multi-pass bf16 (~3-6x listed).  The workload is",
              "bandwidth/FFT-shaped, so HBM% is the meaningful roofline axis.",
              "",
              "## Featured-chain stage breakdown (same prefix method;",
              "## marginal pipelined ms/block of each optional stage)",
              "",
              "| stage | marginal ms/block |",
              "|---|---|"]
    for s in feat_stages[:1]:
        lines.append(f"| {s['stage']} | {s['ms']} |")
    for s in feat_stages[1:]:
        # prefix differencing cannot resolve stages below the measured
        # re-timing spread: print sub-noise rows as a bound, not a
        # (possibly negative) point estimate
        bn = s.get("below_noise_ms")
        lines.append(f"| {s['stage']} | "
                     + (f"<{bn} (below noise floor)" if bn else f"{s['ms']}")
                     + " |")
    lines += ["",
              "The base-chain row absorbs the dispatch floor and any",
              "tunnel contention during its window (it can exceed the",
              "fused featured total); the MARGINAL rows are the signal.",
              "",
              "Prefix marginals drift with the tunnel between rows: the",
              "honest same-window NB marginal (all-on vs all-minus-NB,",
              "probe_r5_campaign2, 2026-08-20) is ~1.6 ms/block",
              "(16.09/16.23 with NB vs 14.50 without) — close to the",
              "~1.4 ms in-kernel detection cost; the r4 table's ~6 ms",
              "NB row was prefix drift.  Forcing the NB front kernel",
              "to TN=2 vs the default TN=4 measured within noise",
              "(17.1 vs 17.4 ms whole-chain).",
              "",
              "## NFM-chain stage breakdown (prefix differencing)", "",
              "| stage | marginal ms/block |",
              "|---|---|"]
    for s in nfm_stages:
        lines.append(f"| {s['stage']} | {s['ms']} |")
    lines += ["",
              "## Other configs", "",
              f"- {feat['metric']}: {feat['value']} {feat['unit']} "
              f"({feat['ms_per_block']} ms/block)",
              f"- {nfm['metric']}: {nfm['value']} {nfm['unit']} "
              f"({nfm['ms_per_block']} ms/block, "
              f"{nfm.get('blocks_per_dispatch')} blocks/dispatch)",
              f"- {pfb['metric']}: {pfb['value']} {pfb['unit']} "
              f"({pfb['ms_per_block']} ms/block, dispatch floor "
              f"{pfb['dispatch_floor_pct']}% of the window, IDFT "
              f"{pfb.get('idft')}; demod {pfb.get('demod')}"
              + (f"; IDFT A/B {pfb['ab_idft_msps']}"
                 if pfb.get("ab_idft_msps") else "") + ")",
              f"  - fused-vs-corner-turn A/B (this run): fused "
              f"{pfb['value']} vs unfused {pfb_un['value']} Msps "
              f"({pfb['ms_per_block']} vs {pfb_un['ms_per_block']} "
              f"ms/block at {pfb.get('samples_per_dispatch')} vs "
              "33.5 M samples/dispatch).  The r5 pipeline runs "
              "twiddle + stage-2 IDFT matmul (rotation folded into "
              "the constants) + per-mode demod + one-pole IIRs + "
              "spectrum as ONE Pallas kernel "
              "(ops/pallas_kernels.pfb_demod_call): HBM traffic after "
              "the polyphase pass is one read of the stage-1 planes + "
              "one audio write.  An XLA-only time-major rearrangement "
              "measured WITHIN NOISE of the r4 corner turn (53.7 vs "
              "54.2 ms same-window) — dot-output materialization, not "
              "demod reads, bounds any XLA formulation.",
              "  - Frozen r5 prefix snapshot (2026-08-20, contended "
              "window, identity floor 26.8 ms): poly +6.1, stage-1 "
              "(single stacked real dot) +3.3, demod kernel +6.1 "
              "ms marginal for 33.5 M samples — whole-pipeline "
              "compute ~15.5 ms; the dispatch floor now dominates, "
              "and it scales with input bytes (tunnel argument "
              "marshaling), which is why the samples-per-dispatch "
              "sweep flattens past 67 M.",
              "  - Frozen r4 probe snapshot (2026-08-20, corner-turn "
              "pipeline): probe_pfb_demod.py measured every demod "
              "family <1 ms standalone at [4096, 16384], proving the "
              "r4 ~21 ms in-pipeline demod marginal was pure HBM "
              "traffic; probe_pfb_spec.py A/B'd the spectrum tap as "
              "zero-cost (53.11 vs 53.47 ms).  Those numbers describe "
              "the r4 pipeline, not the current kernel.",
              f"- {tx['metric']}: {tx['value']} {tx['unit']} "
              f"({tx['ms_per_block']} ms/block)",
              "",
              "## Sharding / scaling (8-device virtual CPU mesh)",
              "",
              "The production sharded step (`parallel/shard.py "
              "make_sharded_step`, shard_map) is **zero-collectives by "
              "construction** — guarded by tests/test_scaling.py::"
              "test_sharded_step_has_zero_collectives, not by timing.  "
              "Round 3's strong-scaling fixed-overhead collapse "
              "(of-ideal 97.1% @2 -> 55.7% @8 under the plain GSPMD "
              "jit, which inserted 18 all-gathers + 24 permutes at 8 "
              "devices: every `jnp.fft` batch dim gathered, `[re;im]` "
              "concats resharded) is diagnosed and fixed: FIRs stack "
              "I/Q on a channel-major axis and the step runs under "
              "shard_map.",
              "",
              "Frozen r4 probe snapshot — measured after the fix (3 "
              "independent runs 2026-08-20, 7/15/25 iters, 32 fixed "
              "channels strong / 16 ch-per-device weak; rerun "
              "parallel/scaling.py to refresh):",
              "",
              "| devices | strong of-ideal (3 runs) | weak of-ideal (3 runs) |",
              "|---|---|---|",
              "| 2 | 96-194% | 114-176% |",
              "| 4 | 125-171% | 178-207% |",
              "| 8 | **110-189%** | 202-252% |",
              "",
              "Strong of-ideal no longer collapses — it stays at or "
              "near ideal across device counts (>=96% at the range low "
              "end at 2 devices, >=110% at 8; r3 had 55.7% @8).  "
              "Absolute numbers "
              "remain smoke-only: on the shared-silicon virtual mesh "
              "the (max-min)/median spread exceeds the 25% quotability "
              "guard in every run (host contention), so the table "
              "reports the cross-run RANGE rather than a point.  The "
              ">=80% BASELINE row still needs a real >=2-chip slice "
              "(environment-blocked); the harness "
              "(`parallel/scaling.py`, printed by `python "
              "__graft_entry__.py`) runs unchanged there and the "
              "zero-collectives guarantee is what makes near-ideal "
              "ICI scaling the expected outcome.",
              ""]
    # host ingest plane (no TPU): regenerate the native-pump section so a
    # BENCH_DETAIL rewrite never drops it (quisk.c:3284/3519 parity).
    # Runs in a FRESH interpreter: this loaded-JAX process depresses the
    # pump 2-3x (measured 26.7 vs 73.3 Msps max zero-loss).
    try:
        import subprocess
        import sys
        out = subprocess.run(
            [sys.executable, "/root/repo/bench_ingest.py", "--detail-json"],
            capture_output=True, text=True, timeout=1800, check=True,
            env={k: v for k, v in os.environ.items()
                 if not k.startswith("JAX")})
        ing = json.loads(out.stdout.strip().splitlines()[-1])
        lines += ["## Host ingest (native C++ pump: recvmmsg + parse + "
                  "lock-free rings; no TPU, fresh interpreter)", "",
                  "| stream | aggregate Msps (drained) |", "|---|---|"]
        for name, msps in ing:
            lines.append(f"| {name} | {msps} |")
        lines += ["",
                  "Reference ceiling: 8 receivers x 384 kHz through the C "
                  "readers = 3.07 Msps aggregate (quisk.c:3519-3820); "
                  "seq errors at max blast rate are kernel UDP drops on "
                  "the sender side, the paced row is the integrity "
                  "contract.", ""]
    except Exception as e:                     # host sockets unavailable
        lines += [f"(host ingest section skipped: {e})", ""]
    with open("/root/repo/BENCH_DETAIL.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
