"""Host ingest throughput benchmark: native blaster -> native pump.

Measures the sample plane the reference keeps in C (quisk.c:3284
quisk_read_rx_udp, 3519 read_rx_udp10): localhost UDP packets through the
C++ reader thread (batched recvmmsg + parse + lock-free rings,
native/ingest.cpp qt_pump_*) with a Python consumer draining blocks —
the complete producer->parse->ring->block path, not just the parser.

Host-only (no TPU / no jax).  Prints one JSON line per configuration:

    python bench_ingest.py [--packets N] [--block 16384]

Reference ceiling: the C readers handle 8 receivers at 384 kHz
(quisk.c:3519-3820) = 3.07 Msps aggregate; SURVEY §7 sets the target at
>100x real-time for one stream, VERDICT r2 at >=10x the 8x384k ceiling
(~31 Msps aggregate).
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

from quisk_tpu.app.status import StatusBoard
from quisk_tpu.io.pump import MultiPump, NativePump, blast


def best_of(fn, repeats: int = 3, key: str = "drained_msps") -> dict:
    """Best-of-N repeat discipline for ingest numbers (the r4 metis
    'regression' 33.6 -> 21.0 Msps was run-to-run noise with no repeats
    — the same lesson as bench._timed_best, applied to the NIC path).
    Attaches the per-run spread so noise is visible."""
    runs = [fn() for _ in range(repeats)]
    best = max(runs, key=lambda r: r[key])
    vals = sorted(round(r[key], 1) for r in runs)
    best["runs_" + key] = vals
    return best


def run_config(codec: str, n_rx: int, n_packets: int, block: int,
               pace_pps: float = 0.0) -> dict:
    """Blast n_packets at the pump while a consumer drains blocks;
    returns throughput + integrity stats."""
    pump = NativePump(codec, n_rx=n_rx, ring_samples=1 << 22)
    pump.start()
    board = StatusBoard()
    board.attach("pump", pump)

    drained = 0
    stop = threading.Event()

    def consume():
        nonlocal drained
        while not stop.is_set():
            x = pump.read_samples(block)
            if x is None:
                time.sleep(0.0002)
                continue
            drained += block

    ct = threading.Thread(target=consume, daemon=True)
    ct.start()
    t0 = time.perf_counter()
    sent = blast(pump.local_addr, codec=codec, n_rx=n_rx,
                 n_packets=n_packets, pace_pps=pace_pps)
    # let the pump finish parsing whatever the kernel buffered
    deadline = time.time() + 2.0
    last = -1
    while time.time() < deadline:
        s = pump.stats()["samples"]
        if s == last:
            break
        last = s
        time.sleep(0.05)
    dt = time.perf_counter() - t0
    stop.set()
    ct.join(timeout=1.0)
    st = pump.stats()
    snap = board.snapshot()
    pump.close()
    parsed = st["samples"]
    return {
        "codec": codec, "n_rx": n_rx, "packets_sent": sent,
        "packets_parsed": st["packets"], "seconds": round(dt, 3),
        "aggregate_msps": round(parsed * n_rx / dt / 1e6, 1),
        "drained_msps": round(drained * n_rx / dt / 1e6, 1),
        "seq_errors": st["seq_errors"], "ring_overruns": st["ring_overruns"],
        "statusboard_fill": snap.get("pump.fill"),
    }


def run_multi(codec: str, n_pumps: int, n_rx: int, n_packets: int,
              block: int, pace_pps: float = 0.0) -> dict:
    """N sockets x N native reader threads (MultiPump), one blaster
    thread per pump (ctypes releases the GIL for the whole qt_blast
    call), one consumer merging [n_pumps*n_rx, block] blocks — the
    multi-stream scaling row VERDICT r4 item 2 asks for."""
    mp = MultiPump(codec, n_pumps=n_pumps, n_rx=n_rx,
                   ring_samples=1 << 22)
    mp.start()
    drained = 0
    stop = threading.Event()

    def consume():
        nonlocal drained
        while not stop.is_set():
            x = mp.read_samples(block)
            if x is None:
                time.sleep(0.0002)
                continue
            drained += block

    ct = threading.Thread(target=consume, daemon=True)
    ct.start()
    bts = [threading.Thread(
        target=blast, args=(addr,),
        kwargs=dict(codec=codec, n_rx=n_rx, n_packets=n_packets,
                    pace_pps=pace_pps), daemon=True)
        for addr in mp.local_addrs]
    t0 = time.perf_counter()
    for b in bts:
        b.start()
    for b in bts:
        b.join()
    deadline = time.time() + 2.0
    last = -1
    while time.time() < deadline:
        s = mp.stats()["samples"]
        if s == last:
            break
        last = s
        time.sleep(0.05)
    dt = time.perf_counter() - t0
    stop.set()
    ct.join(timeout=1.0)
    st = mp.stats()
    mp.stop()
    mp.close()
    return {
        "codec": codec, "n_pumps": n_pumps, "n_rx": n_rx,
        "packets_sent": n_packets * n_pumps,
        "packets_parsed": st["packets"], "seconds": round(dt, 3),
        "aggregate_msps": round(st["samples"] * n_rx / dt / 1e6, 1),
        "drained_msps": round(drained * n_pumps * n_rx / dt / 1e6, 1),
        "seq_errors": st["seq_errors"],
        "ring_overruns": st["ring_overruns"],
    }


def sweep_zero_loss_multi(codec: str = "metis", n_pumps: int = 2,
                          n_rx: int = 8, block: int = 16384,
                          secs: float = 1.2, confirm: int = 2) -> dict:
    """Max aggregate PACED rate with zero loss across N pumps (binary
    search on the per-pump rate, same discipline as sweep_zero_loss)."""
    spf = {"metis": 2 * ((512 - 8) // (n_rx * 6 + 2)),
           "hiqsdr": 240, "wideband": 8160}[codec]

    def clean_at(pps: float) -> dict:
        r = run_multi(codec, n_pumps, n_rx, max(2000, int(pps * secs)),
                      block, pace_pps=pps)
        r["clean"] = (r["seq_errors"] == 0 and r["ring_overruns"] == 0
                      and r["packets_parsed"] == r["packets_sent"])
        return r

    lo = 384_000 / spf
    hi = lo
    best = None
    while True:
        r = clean_at(hi)
        if not r["clean"]:
            break
        best, lo = r, hi
        hi *= 2.0
        if lo * spf * n_rx * n_pumps > 2e9:
            break
    for _ in range(6):
        if hi / lo < 1.05:
            break
        mid = (lo * hi) ** 0.5
        runs = [clean_at(mid) for _ in range(confirm)]
        if all(r["clean"] for r in runs):
            best, lo = runs[-1], mid     # keep a CLEAN run as the record
        else:
            hi = mid
    out = dict(best or clean_at(lo))
    out["metric"] = (f"ingest_{codec}_{n_pumps}x{n_rx}rx_"
                     "max_zero_loss_paced")
    out["pace_pps_per_pump"] = round(lo, 1)
    out["x_realtime_per_rx"] = round(lo * spf / 384_000, 1)
    return out


def sweep_zero_loss(codec: str = "metis", n_rx: int = 8,
                    block: int = 16384, secs: float = 1.5,
                    confirm: int = 2) -> dict:
    """Find the max PACED packet rate with zero seq errors / overruns on
    the receiver (VERDICT r3 weak-6: the integrity row was a floor, not
    a ceiling).  Exponential ramp to the first lossy rate, then binary
    search; a rate only counts as clean when ``confirm`` consecutive runs
    are clean (loss here is bursty, not gradual)."""
    spf = {"metis": 2 * ((512 - 8) // (n_rx * 6 + 2)),
           "hiqsdr": 240, "wideband": 8160}[codec]

    def clean_at(pps: float) -> dict:
        r = run_config(codec, n_rx, max(200, int(pps * secs)), block,
                       pace_pps=pps)
        r["clean"] = (r["seq_errors"] == 0 and r["ring_overruns"] == 0
                      and r["packets_parsed"] == r["packets_sent"])
        return r

    # exponential ramp from 1x real-time (384 kHz per receiver)
    lo = 384_000 / spf
    hi = lo
    best = None
    while True:
        r = clean_at(hi)
        if not r["clean"]:
            break
        best, lo = r, hi
        hi *= 2.0
        if lo * spf * n_rx > 2e9:      # 2 Gsps aggregate: stop ramping
            break
    # binary search [lo clean, hi lossy], 6 refinement steps
    for _ in range(6):
        if hi / lo < 1.05:
            break
        mid = (lo * hi) ** 0.5
        runs = [clean_at(mid) for _ in range(confirm)]
        if all(r["clean"] for r in runs):
            best, lo = runs[-1], mid     # keep a CLEAN run as the record
        else:
            hi = mid
    out = dict(best or clean_at(lo))
    out["metric"] = f"ingest_{codec}_{n_rx}rx_max_zero_loss_paced"
    out["pace_pps"] = round(lo, 1)
    out["x_realtime"] = round(lo * spf / 384_000, 1)
    return out


def detail_rows(block: int = 16384) -> list:
    """The BENCH_DETAIL host-ingest rows as (name, msps, raw) tuples.
    Run in a FRESH interpreter (bench.py invokes this via subprocess):
    a loaded JAX process depresses the pump by 2-3x (measured 26.7 vs
    73.3 Msps max zero-loss in-process vs standalone).  Every blast row
    is best-of-3 with the per-run spread attached (the r4 metis
    'regression' was repeat-free noise)."""
    rows = []
    for codec, n_rx in (("hiqsdr", 1), ("metis", 8)):
        r = best_of(lambda c=codec, n=n_rx: run_config(c, n, 400_000,
                                                       block))
        rows.append((f"{codec} {n_rx} rx, max blast rate (best of "
                     f"{r['runs_drained_msps']})", r["drained_msps"], r))
    # multi-pump scaling: N sockets x N reader threads, port-per-radio
    for n_pumps in (2, 4):
        r = best_of(lambda n=n_pumps: run_multi("metis", n, 8, 200_000,
                                                block), repeats=2)
        rows.append((f"metis {n_pumps} pumps x 8 rx, max blast aggregate "
                     f"(best of {r['runs_drained_msps']})",
                     r["drained_msps"], r))
    spf = 2 * ((512 - 8) // (8 * 6 + 2))
    pace = 4.0 * 384_000 / spf
    r = run_config("metis", 8, int(pace * 3), block, pace_pps=pace)
    ok = r["seq_errors"] == 0 and r["ring_overruns"] == 0
    rows.append((f"metis 8 rx, paced 4x real-time "
                 f"({'zero' if ok else r['seq_errors']} seq errors)",
                 r["drained_msps"], r))
    sw = sweep_zero_loss("metis", 8, block=block)
    rows.append((f"metis 8 rx, max zero-loss paced (binary search, "
                 f"{sw['x_realtime']}x real-time)", sw["drained_msps"], sw))
    swm = sweep_zero_loss_multi("metis", 2, 8, block=block)
    rows.append((f"metis 2 pumps x 8 rx, max zero-loss paced aggregate "
                 f"({swm['x_realtime_per_rx']}x real-time/rx)",
                 swm["drained_msps"], swm))
    # the jumbo-frame wideband transport: the radio protocols above are
    # packet-rate-bound at ~1 KB/frame; 48 KB frames make the host path
    # byte-bound and clear the >100x-real-time (133 Msps) contract
    sww = sweep_zero_loss("wideband", 1, block=4 * block)
    rows.append((f"wideband jumbo 1 socket, max zero-loss paced "
                 f"({sww['x_realtime']}x real-time)",
                 sww["drained_msps"], sww))
    sww2 = sweep_zero_loss_multi("wideband", 2, 1, block=4 * block)
    rows.append((f"wideband jumbo 2 sockets, max zero-loss paced "
                 f"aggregate ({sww2['x_realtime_per_rx']}x real-time "
                 f"each)", sww2["drained_msps"], sww2))
    swstr = sweep_zero_loss_striped(2)
    rows.append((f"wideband STRIPED: one capture over 2 sockets, "
                 f"reassembled in order ({swstr['x_realtime']}x "
                 f"real-time)", swstr["drained_msps"], swstr))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", type=int, default=400_000)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--sweep", action="store_true",
                    help="binary-search the max zero-loss paced rate")
    ap.add_argument("--detail-json", action="store_true",
                    help="print the BENCH_DETAIL ingest rows as JSON")
    args = ap.parse_args()

    if args.detail_json:
        print(json.dumps([(n, m) for n, m, _ in
                          detail_rows(block=args.block)]))
        return
    if args.sweep:
        print(json.dumps(sweep_zero_loss(block=args.block)))
        return

    # max-rate: one HiQSDR stream and the reference's 8-receiver Metis
    for codec, n_rx in (("hiqsdr", 1), ("metis", 8)):
        r = run_config(codec, n_rx, args.packets, args.block)
        r["metric"] = f"ingest_{codec}_{n_rx}rx"
        print(json.dumps(r))

    # integrity at a paced rate: 8x384k Metis at 4x real-time must arrive
    # with zero sequence errors (the reference's operating contract)
    spf = 2 * ((512 - 8) // (8 * 6 + 2))        # samples per metis frame
    pace = 4.0 * 8 * 384_000 / (8 * spf)        # frames/s at 4x... per-rx
    pace = 4.0 * 384_000 / spf                  # per-rx rate sets frame rate
    r = run_config("metis", 8, int(pace * 3), args.block, pace_pps=pace)
    r["metric"] = "ingest_metis_8rx_paced_4x"
    r["ok"] = r["seq_errors"] == 0 and r["ring_overruns"] == 0
    print(json.dumps(r))




def sweep_zero_loss_striped(n_sockets: int = 2, block: int | None = None,
                            secs: float = 1.2, confirm: int = 2) -> dict:
    """Max ONE-CAPTURE paced rate with zero loss, striped over N sockets
    (StripedPump reassembly included in the drained path)."""
    from quisk_tpu.io.pump import StripedPump, blast_striped
    spf = 8160
    if block is None:
        block = 8 * n_sockets * spf

    def run_at(pps: float) -> dict:
        sp = StripedPump(n_sockets=n_sockets, ring_samples=1 << 22)
        sp.start()
        drained = 0
        stop = threading.Event()

        def consume():
            nonlocal drained
            while not stop.is_set():
                x = sp.read_samples(block)
                if x is None:
                    time.sleep(0.0002)
                    continue
                drained += block

        ct = threading.Thread(target=consume, daemon=True)
        ct.start()
        npk = max(200, int(pps * secs)) // n_sockets * n_sockets
        t0 = time.perf_counter()
        sent = blast_striped(sp.local_addrs, npk, pace_pps=pps)
        deadline = time.time() + 2.0
        last = -1
        while time.time() < deadline:
            s = sp.stats()["samples"]
            if s == last:
                break
            last = s
            time.sleep(0.05)
        dt = time.perf_counter() - t0
        stop.set()
        ct.join(timeout=1.0)
        st = sp.stats()
        sp.stop()
        sp.close()
        return {
            "n_sockets": n_sockets, "packets_sent": sent,
            "packets_parsed": st["packets"], "seconds": round(dt, 3),
            "aggregate_msps": round(st["samples"] / dt / 1e6, 1),
            "drained_msps": round(drained / dt / 1e6, 1),
            "seq_errors": st["seq_errors"],
            "ring_overruns": st["ring_overruns"],
            "clean": (st["seq_errors"] == 0 and st["ring_overruns"] == 0
                      and st["packets"] == sent),
        }

    lo = 384_000 / spf
    hi = lo
    best = None
    while True:
        r = run_at(hi)
        if not r["clean"]:
            break
        best, lo = r, hi
        hi *= 2.0
        if lo * spf > 2e9:
            break
    for _ in range(6):
        if hi / lo < 1.05:
            break
        mid = (lo * hi) ** 0.5
        runs = [run_at(mid) for _ in range(confirm)]
        if all(r["clean"] for r in runs):
            best, lo = runs[-1], mid
        else:
            hi = mid
    out = dict(best or run_at(lo))
    out["metric"] = f"ingest_wideband_striped_{n_sockets}sock_one_capture"
    out["pace_pps_total"] = round(lo, 1)
    out["x_realtime"] = round(lo * spf / 384_000, 1)
    return out


if __name__ == "__main__":
    main()
