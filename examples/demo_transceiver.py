"""Demo: a full transmit -> receive loopback session, headless.

Drives the TX chain (mic bandpass, pre-emphasis, compressor, conformance
ALC, SSB/FM/CW modulators, polyphase interpolation to the TX rate), then
demodulates its own transmission with the RX chain — the reference's
DEBUG_MIC self-test flow (sound.c:886-888, 1090-1099) as a demo:

  voice -> TxChain (SSB @192k) -> RxChain (USB) -> audio WAV
  voice -> TxChain (FM + CTCSS) -> RxChain (FM) -> audio WAV
  two-tone IMD through a nonlinear PA, before/after the closed
  PureSignal predistortion loop (wdsp/calcc.c flow)

    python examples/demo_transceiver.py [--out-dir /tmp/demo_tx] [--tpu]

Runs on CPU by default; --tpu uses the attached accelerator through the
complex-free jit boundary.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loopback(mode_tx: str, mode_rx: str, blocks: int = 10,
             ctcss_hz: float = 0.0):
    import jax.numpy as jnp
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig
    from quisk_tpu.tx import TxChain, TxChainConfig
    from quisk_tpu.io import sources

    B = 2048
    tx = TxChain.create(
        TxChainConfig(channels=1, audio_block=B, tx_rate=192000.0,
                      compress_db=6.0, preemphasis=0.3, ctcss_hz=ctcss_hz),
        mode=int(Mode[mode_tx]))
    rx = RxChain.create(
        RxChainConfig(sample_rate=192000.0, channels=1, audio_block=B,
                      agc=True),
        tune_hz=0.0, mode=int(Mode[mode_rx]))
    voice = sources.voice_like(48000.0, blocks * B).astype(np.float32)
    st_tx, st_rx = tx.init_state(), rx.init_state()
    outs = []
    for i in range(blocks):
        st_tx, iq = tx.step(st_tx, jnp.asarray(voice[None, i * B:(i + 1) * B]))
        st_rx, audio = rx.step(st_rx, iq)
        outs.append(np.asarray(audio))
    return voice, np.concatenate(outs, axis=-1)[0]


def imd_demo():
    """Two-tone IMD through a compressive PA, then the closed PureSignal
    loop: reference run (no correction) vs corrected run, refined twice —
    the same flow Radio.calibrate_puresignal drives (wdsp/calcc.c;
    microphone.c:1581 PreDistort)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.tx import TxChain, TxChainConfig
    from quisk_tpu.tx.puresignal import (Predistorter, SimulatedPA,
                                         two_tone_imd_db)

    B = 2048
    tx = TxChain.create(
        TxChainConfig(channels=1, audio_block=B, tx_rate=48000.0,
                      predistort=True),
        mode=int(Mode.IMD))              # chain generates the 700+1900 tones
    tx_ref = tx.replace(predist=None)
    pa = SimulatedPA()
    zero = np.zeros((1, B), np.float32)

    st = tx_ref.init_state()
    for _ in range(4):
        st, iq = tx_ref.step(st, zero)
    raw = np.asarray(iq)[0]
    before = two_tone_imd_db(pa(raw), 48000.0, 700.0, 1900.0)

    pd = tx.predist
    for _ in range(2):                   # capture -> refine -> install
        st_r, st_d = tx_ref.init_state(), tx.init_state()
        refs, fbs = [], []
        for _ in range(4):
            st_r, iq_r = tx_ref.step(st_r, zero)
            st_d, iq_d = tx.step(st_d, zero)
            refs.append(np.asarray(iq_r)[0])
            fbs.append(pa(np.asarray(iq_d)[0]))
        pd = pd.refine(np.concatenate(refs), np.concatenate(fbs))
        tx = tx.replace(predist=pd)

    st = tx.init_state()
    for _ in range(4):
        st, iq = tx.step(st, zero)
    after = two_tone_imd_db(pa(np.asarray(iq)[0]), 48000.0, 700.0, 1900.0)
    return before, after


def live_session(blocks: int = 20):
    """Mic-file -> TX -> simulated PA -> RX loopback, LIVE through the
    full-duplex Radio.run_once block loop: the paced capture thread feeds
    the mic, PTT keys the loop, the loopback hardware plays the PA output
    back at the dial offset, and tx_monitor (the reference's DEBUG_MIC
    self-test, sound.c:886-888) lets us hear our own demodulated signal.
    Returns (mic voice, demodulated audio, smeter dB while transmitting)."""
    import time

    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.io import sources

    B = 2048
    # agc off so the recovered audio keeps the voice envelope (AGC rides
    # syllables; its conformance is tested separately in test_wcpagc.py)
    cfg = RadioConfig(sample_rate=48000.0, audio_block=B, mode="USB",
                      tune_hz=9000.0, agc=False)
    radio = Radio(cfg, hardware="loopback")
    radio.open()
    radio.enable_tx()
    radio.tx_monitor = True
    # warm the compiled RX and TX paths BEFORE starting the paced mic:
    # first-call compilation stalls the loop for seconds, and the capture
    # thread (correctly) ages out a bounded-latency buffer meanwhile
    radio.run_once()
    radio.transmit(np.zeros(radio.tx.block, np.float32), ptt=True)
    voice = sources.voice_like(48000.0, blocks * B, band=(400.0, 2300.0))
    voice = (0.5 * voice / np.max(np.abs(voice))).astype(np.float32)
    radio.enable_mic(voice, latency_ms=2000.0)
    t0 = time.time()
    while radio.mic.fill < blocks * radio.tx.block and time.time() - t0 < 8.0:
        time.sleep(0.01)
    radio.set_ptt(True)
    outs = []
    for _ in range(blocks):
        outs.append(radio.run_once()[0])
    smeter = radio.smeter_db()
    radio.set_ptt(False)
    radio.run_once()
    radio.close()
    return voice, np.concatenate(outs), smeter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/quisk_tpu_demo_tx")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from quisk_tpu.io.wav import write_audio_wav

    os.makedirs(args.out_dir, exist_ok=True)
    for name, mtx, mrx, ctcss in (("ssb", "USB", "USB", 0.0),
                                  ("fm", "FM", "FM", 88.5)):
        voice, audio = loopback(mtx, mrx, ctcss_hz=ctcss)
        path = os.path.join(args.out_dir, f"loopback_{name}.wav")
        write_audio_wav(path, audio / max(1e-9, float(np.max(np.abs(audio)))),
                        48000.0)
        print(f"{name}: TX->RX loopback audio rms "
              f"{np.std(audio[4 * 2048:]):.3f} -> {path}")

    before, after = imd_demo()
    print(f"two-tone IMD through PA: {before:.1f} dBc raw, "
          f"{after:.1f} dBc with PureSignal predistortion")

    voice, audio, smeter = live_session()
    path = os.path.join(args.out_dir, "live_loopback.wav")
    write_audio_wav(path, audio / max(1e-9, float(np.max(np.abs(audio)))),
                    48000.0)
    print(f"live full-duplex session: mic-file -> TX -> PA -> RX loopback, "
          f"own signal S-meter {smeter:.1f} dBFS, audio rms "
          f"{np.std(audio[4 * 2048:]):.3f} -> {path}")


if __name__ == "__main__":
    main()
