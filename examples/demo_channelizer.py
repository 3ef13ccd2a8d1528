"""Demo: wideband capture -> polyphase channelizer -> every station at once.

Where demo_receiver.py builds one tuned chain per signal, this is the
survey-receiver workflow (BASELINE config #5): ONE 2x-oversampled DFT
filterbank splits the whole band into K uniform channels in a single
pass, a grouped mixed demodulator runs each channel's mode, and the
per-channel power spectrum shows everything on the air at once.

    python examples/demo_channelizer.py [--channels 256] [--out-dir /tmp/demo]

Runs on CPU by default (K=256); the TPU bench shape (K=4096, Pallas
polyphase tiles + Cooley-Tukey MXU IDFT) is `bench.py --all`'s PFB row.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--out-dir", default="/tmp/quisk_tpu_demo")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quisk_tpu.io import sources, wav
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import PFBRxPipeline

    K = args.channels
    fs = 48000.0 * K / 2          # channel rate is 2*fs/K = 96 kHz
    blocks, blk = 8, K * 1024
    n = blocks * blk
    t = np.arange(n) / fs

    # three stations on channel centers (channel c sits at c*fs/K)
    def chan_freq(c):
        return c * fs / K if c <= K // 2 else (c - K) * fs / K

    am_audio = sources.voice_like(2 * 48000.0, n, band=(300.0, 2800.0))
    am_audio = 0.8 * am_audio / np.max(np.abs(am_audio))
    stations = [(5, "AM broadcast"), (K - 9, "AM (negative freq)"),
                (17, "carrier")]
    iq = np.zeros(n, np.complex128)
    iq += (1.0 + 0.5 * am_audio) * np.exp(2j * np.pi * chan_freq(5) * t)
    iq += 0.7 * (1.0 + 0.5 * am_audio[::-1]) * np.exp(
        2j * np.pi * chan_freq(K - 9) * t)
    iq += 0.4 * np.exp(2j * np.pi * chan_freq(17) * t)
    iq += 0.02 * (np.random.default_rng(0).standard_normal(n)
                  + 1j * np.random.default_rng(1).standard_normal(n))
    iq = iq.astype(np.complex64)[None]                  # [S=1, n]

    # r5 production path: PFB + IDFT + grouped demod + spectrum in one
    # fused pipeline (the [K, time] channel batch never materializes;
    # add pallas_demod=True on TPU for the single-kernel demod)
    pipe = PFBRxPipeline.create(K, blk, [int(Mode.AM)] * K,
                                channel_rate=2.0 * 48000.0, mxu_dft=False)
    st = pipe.init_state(1)
    audio, pw_acc = [], np.zeros(K)
    for b in range(blocks):
        st, (a, spec) = pipe(st, jnp.asarray(iq[:, b * blk:(b + 1) * blk]))
        audio.append(np.asarray(a)[0])                  # [n_out, K]
        pw_acc += np.asarray(spec)[0]
    aud = np.concatenate(audio, axis=0).T               # [K, n*2/K]

    pw = 10 * np.log10(pw_acc / blocks + 1e-12)
    top = np.argsort(pw)[::-1][:5]
    print(f"{K}-channel PFB over {fs/1e6:.2f} MHz; strongest channels:")
    for c in sorted(top):
        f = chan_freq(int(c))
        print(f"  ch {int(c):4d} @ {f/1e3:+9.1f} kHz: {pw[c]:6.1f} dB")
    for c, name in stations:
        assert pw[c] > pw.mean() + 10, (name, pw[c], pw.mean())

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "pfb_ch5_am.wav")
    a5 = aud[5] / max(1e-9, np.max(np.abs(aud[5])))
    wav.write_audio_wav(out, (0.9 * a5).astype(np.float32), 2 * 48000.0)
    print(f"wrote {out} ({a5.shape[-1]} samples @ {2*48000.0:.0f} Hz)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
