"""Demo: a complete multi-channel receiver session, headless.

Synthesizes a busy 960 kHz band (SSB voice, AM broadcast, NFM, CW),
builds a 4-channel receiver tuned to each signal with per-channel modes,
runs the full chain (noise blanker, channel filters, demod, AGC), renders
a spectrum + waterfall, and writes per-channel audio WAVs.

    python examples/demo_receiver.py [--out-dir /tmp/demo] [--tpu]

Runs on CPU by default; --tpu uses the attached accelerator through the
complex-free jit boundary.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_band(fs: float, n: int):
    """A band with four stations; returns (iq, station list)."""
    from quisk_tpu.io import sources
    t = np.arange(n) / fs
    stations = [
        ("SSB voice", -310_000.0, "USB"),
        ("AM broadcast", -90_000.0, "AM"),
        ("NFM repeater", 140_000.0, "FM"),
        ("CW beacon", 355_000.0, "CWU"),
    ]
    iq = np.zeros(n, np.complex128)
    n48 = n * 48_000 // int(fs)
    voice = sources.voice_like(48e3, n48, band=(300.0, 2700.0))
    iq += 0.5 * np.repeat(sources.ssb_signal(voice, 48e3), 20)[:n] \
        * np.exp(2j * np.pi * stations[0][1] * t)
    am_audio = sources.voice_like(48e3, n48, seed=1, band=(100.0, 4000.0))
    iq += 0.4 * np.repeat(sources.am_signal(am_audio, 48e3, depth=0.8),
                          20)[:n] * np.exp(2j * np.pi * stations[1][1] * t)
    fm_audio = sources.voice_like(48e3, n48, seed=2, band=(300.0, 2500.0))
    iq += 0.4 * np.repeat(sources.fm_signal(fm_audio, deviation_hz=5e3,
                                            fs=48e3), 20)[:n] \
        * np.exp(2j * np.pi * stations[2][1] * t)
    from quisk_tpu.app.cw import text_to_key_samples
    key = text_to_key_samples("cq cq de quisk tpu", 22.0, fs)
    key = np.resize(key, n)
    iq += 0.3 * key * np.exp(2j * np.pi * (stations[3][1] + 600.0) * t)
    iq += 1e-4 * (np.random.default_rng(0).standard_normal(n)
                  + 1j * np.random.default_rng(1).standard_normal(n))
    return iq.astype(np.complex64), stations


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/quisk_tpu_demo")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from quisk_tpu.app.graph import GraphService, WaterfallRenderer
    from quisk_tpu.io import wav
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.utils.boundary import make_boundary_step, pack_tree

    FS = 960_000.0
    os.makedirs(args.out_dir, exist_ok=True)

    cfg = RxChainConfig(sample_rate=FS, channels=4, audio_block=2048,
                        agc=True, noise_blanker=2)
    # one block to know sizes
    probe = RxChain.create(cfg, tune_hz=0.0, mode=int(Mode.USB))
    n = max(2, int(args.seconds * FS / probe.block_in)) * probe.block_in
    iq, stations = synth_band(FS, n)
    print(f"band: {FS/1e3:.0f} kHz wide, {n/FS:.2f} s;")
    for name, f, m in stations:
        print(f"  {name:14s} at {f/1e3:+8.1f} kHz  [{m}]")

    chain = RxChain.create(
        cfg, tune_hz=[f for _, f, _ in stations],
        mode=[int(Mode[m]) for _, _, m in stations])

    gs = GraphService(fft_size=4096, block=probe.block_in, channels=1,
                      sample_rate=FS, pixels=96)
    wf = WaterfallRenderer(pixels=96, rows=64)

    step = make_boundary_step(lambda ch, s, xx: ch.step(s, xx))
    pchain = pack_tree(chain)
    pst = pack_tree(chain.init_state())
    outs = []
    B = chain.block_in
    for i in range(n // B):
        blk = iq[i * B:(i + 1) * B]
        # all four sub-receivers share the one antenna stream
        shared = np.broadcast_to(blk, (chain.channels, B)).copy()
        pst, audio = step(pchain, pst, pack_tree(shared))
        outs.append(np.asarray(audio))
        tr = gs.feed(blk[None])
        if tr is not None:
            wf.add_row(tr[0])
    audio = np.concatenate(outs, axis=-1)

    # ASCII spectrum
    tr = gs.feed(iq[None, :B])
    db = wf.pixels()[0].astype(float).sum(-1) if tr is None else tr[0]
    lo, hi = np.percentile(db, 5), db.max()
    bars = " .:-=+*#%@"
    line = "".join(bars[int(np.clip((v - lo) / (hi - lo + 1e-9), 0, 0.999)
                            * len(bars))] for v in db)
    print("\nspectrum (-480 .. +480 kHz):")
    print(line)

    for (name, f, m), ch in zip(stations, audio):
        path = os.path.join(args.out_dir,
                            name.lower().replace(" ", "_") + ".wav")
        peak = np.max(np.abs(ch)) + 1e-9
        wav.write_audio_wav(path, ch / max(1.0, peak), chain.fs_audio)
        print(f"wrote {path} ({len(ch)} samples, rms "
              f"{np.sqrt(np.mean(ch**2)):.3f})")
    print(f"waterfall: {wf.pixels().shape} rows rendered")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
