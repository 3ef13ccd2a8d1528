"""Demo: live wideband UDP capture -> PFB channelizer -> band survey.

The round-5 ingest-to-audio path end-to-end, all for real (sockets,
rings, reader thread, channelizer, demod):

  synthesized multi-station band
    -> jumbo-frame wideband UDP stream (io/native.WidebandStream)
    -> 'wideband' hardware plugin (native C++ pump when built)
    -> PFBRxPipeline (polyphase filterbank + IDFT + per-mode demod +
       per-channel power spectrum, fused)
    -> strongest-channel survey + demodulated AM audio WAV

    python examples/demo_wideband_survey.py [--channels 128]

Runs on CPU; on TPU the same pipeline with ``pallas_demod=True`` is
`bench.py --all`'s PFB row (1.1-1.2 Gsps input), and the transport
measures 123 Msps zero-loss on one socket / 267 Msps striped over two
(`bench_ingest.py`).
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--out-dir", default="/tmp/quisk_tpu_demo")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quisk_tpu.hw import get_hardware
    from quisk_tpu.io import sources, wav
    from quisk_tpu.io.native import WidebandStream
    from quisk_tpu.io.pump import PacketSender
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import PFBRxPipeline

    K = args.channels
    fs = 16000.0 * K                  # channel rate = 2*fs/K = 32 kHz
    blk = K * 256
    # pad to whole 8160-pair packets (the sender drops a partial tail)
    n = -(-(args.blocks * blk) // 8160) * 8160 + 8160

    # --- the band: SSB voice, AM broadcast, FM station on channel centers
    plan = [(5, Mode.USB), (K // 3, Mode.AM), (2 * K // 3, Mode.FM)]
    band = np.zeros(n, np.complex128)
    for ch, mode in plan:
        band += 0.5 * sources.station_iq(mode, fs, n, carrier_hz=ch * fs / K,
                                         seed=ch)
    band = sources.awgn(band.astype(np.complex64), snr_db=45.0)

    # --- live transport: wideband hw plugin + jumbo-frame UDP sender
    hw = get_hardware("wideband")(n_streams=1, sample_rate=fs)
    print(hw.open())
    addrs = hw.start_pump()
    ws = WidebandStream()
    sender = PacketSender(ws.build, addrs[0], pairs_per_packet=8160)
    tx = threading.Thread(target=sender.send_stream,
                          args=(band,), kwargs=dict(rate_hz=4 * fs))
    tx.start()

    # --- the receiver: fused PFB pipeline, mixed per-channel modes
    mode_vec = [int(Mode.USB)] * K
    for ch, mode in plan:
        mode_vec[ch] = int(mode)
    pipe = PFBRxPipeline.create(K, blk, mode_vec, channel_rate=2 * fs / K)
    st = pipe.init_state(1)
    audio, pw_acc, got = [], np.zeros(K), 0
    deadline = time.time() + 60.0
    while got < args.blocks and time.time() < deadline:
        x = hw.read_samples(blk)
        if x is None:
            time.sleep(0.005)
            continue
        st, (a, spec) = pipe(st, jnp.asarray(x))
        audio.append(np.asarray(a)[0])            # [n_out, K] time-major
        pw_acc += np.asarray(spec)[0]
        got += 1
    tx.join(timeout=10.0)
    stats = hw.pump.stats()
    hw.close()
    sender.close()
    assert got == args.blocks, f"starved: only {got} blocks"

    pw = 10 * np.log10(pw_acc / got + 1e-12)
    top = sorted(int(c) for c in np.argsort(pw)[::-1][:len(plan)])
    print(f"{K}-channel survey over {fs/1e6:.2f} MHz "
          f"({stats['packets']} packets, {stats['seq_errors']} seq errors):")
    for c in top:
        print(f"  ch {c:4d} @ {c * fs / K / 1e3:8.1f} kHz: {pw[c]:6.1f} dB")
    assert top == sorted(c for c, _ in plan), (top, plan)

    aud = np.concatenate(audio, axis=0)           # [T, K]
    am_ch = plan[1][0]
    a = aud[aud.shape[0] // 3:, am_ch]
    a = a - a.mean()
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "survey_am.wav")
    wav.write_audio_wav(out, (0.9 * a / max(1e-9, np.abs(a).max())
                              ).astype(np.float32), 2 * fs / K)
    print(f"wrote {out} ({len(a)} samples @ {2 * fs / K:.0f} Hz)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
