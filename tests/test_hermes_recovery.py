"""Hermes stream recovery: ready-handshake retry + HL2 write-queue ACK
machine + TX-buffer fault monitor (SURVEY §5.3 named behaviors).

Parity: quisk.c:3425-3518 ``quisk_hermes_is_ready`` (stop/stop/drain/
prime/ctl x4/start-until-flowing), quisk.c:215-216 + 3643-3663 +
microphone.c:894-903 (ACK-gated write queue, 20 ms resend),
quisk.c:152-153 + 3696-3718 (``hl2_txbuf_state`` fault machine).

The fake radio here is a scripted UDP endpoint that (a) ignores the
first N Start packets, then streams Metis frames; ACK withholding is
driven through the write-queue clock.
"""

import socket
import threading
import time

import numpy as np
import pytest

from quisk_tpu.hw.hermes import (HermesHardware, HermesStartSequencer,
                                 Hl2TxBufMonitor, Hl2WriteQueue)
from quisk_tpu.io.native import MetisStream, metis_samples_per_frame
from quisk_tpu.io.pump import UdpPump


def _wait(cond, timeout=10.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.005)
    return False


def _metis_frame(seq: int, ctl0: bytes = b"\x00" * 5,
                 ctl1: bytes = b"\x00" * 5, n_rx: int = 1) -> bytes:
    """Hand-build one radio->PC frame (zero IQ, chosen ctl groups)."""
    out = bytearray(1032)
    out[0:4] = b"\xef\xfe\x01\x06"
    out[4:8] = int(seq).to_bytes(4, "big")
    for sub, ctl in ((0, ctl0), (1, ctl1)):
        base = 8 + sub * 512
        out[base:base + 3] = b"\x7f\x7f\x7f"
        out[base + 3:base + 8] = ctl
    return bytes(out)


class UdpTransport:
    """PC-side control socket aimed at the fake radio."""

    def __init__(self, radio_addr):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.setblocking(False)
        self.addr = radio_addr

    def sendto(self, pkt):
        self.sock.sendto(pkt, self.addr)

    def poll_ctl(self):
        try:
            return self.sock.recv(2048)
        except BlockingIOError:
            return None

    def close(self):
        self.sock.close()


class FakeRadio:
    """Scripted Metis radio: counts stops/ctl frames; ignores the first
    ``ignore_starts`` Start packets, then streams frames to ``sink``."""

    def __init__(self, sink_addr, ignore_starts: int = 3, n_frames: int = 50):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.05)
        self.addr = self.sock.getsockname()
        self.sink = sink_addr
        self.ignore_starts = ignore_starts
        self.n_frames = n_frames
        self.stops = 0
        self.starts = 0
        self.ctl_frames = 0
        self.streamed = False
        self._run = True
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _loop(self):
        while self._run:
            try:
                pkt, _ = self.sock.recvfrom(2048)
            except socket.timeout:
                continue
            except OSError:
                return
            if len(pkt) == 1032:
                self.ctl_frames += 1
            elif len(pkt) == 64 and pkt[:3] == b"\xef\xfe\x04":
                if pkt[3] == 0:
                    self.stops += 1
                else:
                    self.starts += 1
                    if self.starts > self.ignore_starts and not self.streamed:
                        self.streamed = True
                        for f in range(self.n_frames):
                            self.sock.sendto(_metis_frame(f), self.sink)

    def stop(self):
        self._run = False
        self.thread.join(timeout=2.0)
        self.sock.close()


def test_ready_handshake_retries_until_frames_flow():
    pump = UdpPump(MetisStream(n_rx=1), n_rx=1)
    pump.start()
    radio = FakeRadio(pump.local_addr, ignore_starts=3)
    tr = UdpTransport(radio.addr)
    hw = HermesHardware(transport=tr)
    hw.pump = pump
    try:
        hw.StartSamples()
        # step until running (each step rate-limited to >=2 ms)
        assert _wait(lambda: (hw.is_ready() and
                              hw.start_seq.running), timeout=10.0)
        assert radio.stops >= 2                 # states 0/1
        assert radio.ctl_frames >= 4            # states 4-7
        assert radio.starts > 3                 # retried past the ignores
        st = hw.recovery_stats()
        assert st["start_retries"] >= 3
        assert st["start_state"] == 9
        assert _wait(lambda: pump.stats()["packets"] >= 50)
        assert pump.stats()["seq_errors"] == 0
    finally:
        radio.stop()
        pump.stop()
        tr.close()


def test_ready_handshake_temporary_shutdown_and_resume():
    sent = []
    seq = HermesStartSequencer(send=sent.append, started=lambda: True,
                               min_interval=0.0)
    while not seq.running:
        seq.step()
    seq.shutdown()
    assert seq.step() is False               # 20 -> stop sent
    assert seq.step() is False               # 21 -> stop sent
    assert seq.step() is False               # 22 -> drain
    assert seq.step() is False               # 23: parked
    assert seq.state == 23
    seq.resume()                             # re-enter at prime
    while not seq.running:
        seq.step()
    assert seq.state == 9
    stops = [p for p in sent if p[3] == 0]
    assert len(stops) >= 4                   # 2 at startup + 2 at shutdown


def test_hl2_write_queue_withheld_ack_times_out_and_retries():
    t = [0.0]
    wq = Hl2WriteQueue(clock=lambda: t[0])
    wq.write(b"\x7d\x06\x10\x30\x01")
    # no ACK ever arrives: poll_tx resends every 20 ms, 50 tries, then
    # times out (reference _wait_queue, hermes/quisk_hardware.py:894-903)
    groups = []
    for _ in range(60):
        g = wq.poll_tx(mox=False)
        if g is not None:
            groups.append(g)
        t[0] += 0.021
    assert len(groups) == 50
    assert groups[0][0] == (0x7D << 1) & 0xFF   # C0 = addr<<1|mox
    assert groups[0][1:] == b"\x06\x10\x30\x01"
    assert wq.stats()["timeouts"] == 1 and not wq.busy


def test_hl2_write_queue_ack_flow():
    t = [0.0]
    wq = Hl2WriteQueue(clock=lambda: t[0])
    wq.write(b"\x7d\x06\x10\x30\x01")
    assert wq.poll_tx() is not None
    # radio replies "didn't process, send again" (dindex 0x7f)
    wq.on_ack(bytes([0x7F << 1 & 0xFF, 0, 0, 0, 0]))
    assert wq.busy and wq.stats()["resent"] == 1
    g = wq.poll_tx()                          # immediate resend allowed
    assert g is not None
    # nonmatching ACK address -> error counter, still pending
    wq.on_ack(bytes([(0x7E << 1) & 0xFF, 0, 0, 0, 0]))
    assert wq.stats()["errors_nonmatching"] == 1 and wq.busy
    # matching ACK -> complete
    wq.on_ack(bytes([(0x7D << 1) & 0xFF, 1, 2, 3, 4]))
    assert not wq.busy and wq.stats()["completed"] == 1
    # ACK with nothing outstanding -> error counter
    wq.on_ack(bytes([(0x7D << 1) & 0xFF, 0, 0, 0, 0]))
    assert wq.stats()["errors_unexpected"] == 1


def test_txbuf_fault_machine():
    m = Hl2TxBufMonitor()
    m.step(False, 0x00)
    assert m.state == 0
    m.step(True, 0x00)                        # mox up
    assert m.state == 1
    m.step(True, 0x10)                        # samples buffered
    assert m.state == 2
    m.step(True, 0x80)                        # underflow fault
    assert m.state == 3 and m.errors == 1
    m.step(True, 0x10)                        # fault bit cleared
    assert m.state == 2
    m.step(True, 0xFF)                        # overflow fault
    assert m.state == 3 and m.errors == 2
    m.step(False, 0x00)                       # key up resets
    assert m.state == 0


def test_pump_routes_status_and_ack_groups():
    """End-to-end: crafted frames through the UDP pump surface PTT/CW/
    overrange bits, row data, and latch ACK responses for HeartBeat."""
    pump = UdpPump(MetisStream(n_rx=1), n_rx=1)
    pump.start()
    sk = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        # row 0 with PTT + CW key bits in C0, overrange bit in C1
        row0 = bytes([0b0000_0101, 0x01, 0x00, 0x42, 0x07])
        # an ACK-bearing response for write address 0x7d
        ack = bytes([(0x7D << 1) & 0xFF, 1, 2, 3, 4])
        sk.sendto(_metis_frame(0, row0, ack), pump.local_addr)
        assert _wait(lambda: pump.stats()["packets"] >= 1)
        st = pump.hermes_status()
        assert st["ptt"] == 1 and st["cwkey"] == 1
        assert st["overrange"] == 1
        assert st["h2pc"][:4] == bytes([0x01, 0x00, 0x42, 0x07])
        got = pump.take_ack()
        assert got == ack
        assert pump.take_ack() is None        # one-shot
        # HeartBeat wiring: the hardware routes a fresh ACK to its queue
        hw = HermesHardware()
        hw.pump = pump
        hw.WriteQueue(b"\x7d\x06\x10\x30\x01")
        assert hw.hl2_queue.poll_tx() is not None
        sk.sendto(_metis_frame(1, row0, ack), pump.local_addr)
        assert _wait(lambda: pump.stats()["packets"] >= 2)
        hw.HeartBeat()
        assert not hw.hl2_queue.busy
        assert hw.recovery_stats()["writequeue_completed"] == 1
    finally:
        pump.stop()
        sk.close()


def test_native_pump_routes_status_and_ack():
    from quisk_tpu.io import native
    if not native.have_native_pump():
        pytest.skip("native ingest library not built")
    from quisk_tpu.io.pump import NativePump
    pump = NativePump("metis", n_rx=1)
    pump.start()
    sk = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        row0 = bytes([0b0000_0101, 0x01, 0x00, 0x42, 0x07])
        ack = bytes([(0x7D << 1) & 0xFF, 1, 2, 3, 4])
        sk.sendto(_metis_frame(0, row0, ack), pump.local_addr)
        assert _wait(lambda: pump.stats()["packets"] >= 1)
        st = pump.hermes_status()
        assert st["ptt"] == 1 and st["cwkey"] == 1 and st["overrange"] == 1
        assert st["h2pc"][:4] == bytes([0x01, 0x00, 0x42, 0x07])
        assert pump.take_ack() == ack
        assert pump.take_ack() is None
    finally:
        pump.stop()
        pump.close()
        sk.close()
