"""TCI 1.4 server: real websocket clients, command broadcast/query split,
partial-frame reassembly, RX audio negotiation + chunking, client TX audio
with TX_CHRONO pacing, and full Radio integration (parity tci.c + ws.c)."""

import base64
import hashlib
import os
import socket
import struct
import time

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
from quisk_tpu.app.tci import (RX_AUDIO_STREAM, TCI_STREAM_DATA_BYTES,
                               TX_AUDIO_STREAM, TX_CHRONO, TciServer, WS_GUID,
                               pack_audio_frame, pack_stream,
                               unpack_audio_frame, unpack_stream, ws_encode)


class WsClient:
    """Minimal masked websocket client for the tests."""

    def __init__(self, port, path="/"):
        self.s = socket.create_connection(("127.0.0.1", port), timeout=5)
        key = base64.b64encode(os.urandom(16)).decode()
        self.s.sendall((f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                        f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                        f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.s.recv(1024)
        expect = base64.b64encode(
            hashlib.sha1((key + WS_GUID).encode()).digest()).decode()
        assert expect.encode() in resp
        self.buf = resp.split(b"\r\n\r\n", 1)[1]

    def _send_frame(self, op, data):
        mask = os.urandom(4)
        frame = bytes([0x80 | op])
        n = len(data)
        if n < 126:
            frame += bytes([0x80 | n])
        elif n < 65536:
            frame += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            frame += bytes([0x80 | 127]) + struct.pack(">Q", n)
        frame += mask
        frame += bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        self.s.sendall(frame)

    def send_text(self, text):
        self._send_frame(0x1, text.encode())

    def send_binary(self, data):
        self._send_frame(0x2, data)

    def recv_frame(self):
        while True:
            if len(self.buf) >= 2:
                n = self.buf[1] & 0x7F
                off = 2
                if n == 126:
                    if len(self.buf) >= 4:
                        n = struct.unpack_from(">H", self.buf, 2)[0]
                        off = 4
                    else:
                        n = None
                if n is not None and len(self.buf) >= off + n:
                    op = self.buf[0] & 0x0F
                    payload = self.buf[off:off + n]
                    self.buf = self.buf[off + n:]
                    return op, payload
            self.buf += self.s.recv(65536)

    def recv_until(self, needle, limit=64):
        texts = []
        for _ in range(limit):
            op, p = self.recv_frame()
            if op == 0x1:
                texts.append(p.decode())
                if needle in texts[-1]:
                    return texts
        raise AssertionError(f"{needle!r} not seen in {texts}")

    def recv_binary(self, limit=64):
        for _ in range(limit):
            op, p = self.recv_frame()
            if op == 0x2:
                return p
        raise AssertionError("no binary frame seen")

    def close(self):
        self.s.close()


def _wait(pred, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_tci_handshake_preamble_and_commands():
    srv = TciServer(port=0)
    port = srv.start()
    try:
        c = WsClient(port)
        pre = c.recv_until("start;")
        assert any(p.startswith("protocol:esdr,1.4") for p in pre)
        assert any(p.startswith("iq_samplerate:") for p in pre)
        assert any(p.startswith("modulations_list:") for p in pre)
        assert any(p == "ready;" for p in pre)
        # set-commands are broadcast back verbatim (tci.c:420)
        c.send_text("vfo:0,0,14074000;")
        assert c.recv_until("vfo:0,0,14074000;")
        assert srv.state.vfo[0][0] == 14074000
        c.send_text("modulation:0,lsb;")
        assert c.recv_until("modulation:0,lsb;")
        assert srv.state.modulation[0] == "lsb"
        # query form answers privately with the stored value
        c.send_text("vfo:0,0;")
        assert c.recv_until("vfo:0,0,14074000;")
        c.send_text("modulation:0;")
        assert c.recv_until("modulation:0,lsb;")
        # unknown commands broadcast unchanged (tci.c:322 default return 1)
        c.send_text("bogus_command:1;")
        assert c.recv_until("bogus_command:1;")
        c.close()
    finally:
        srv.stop()


def test_tci_partial_command_reassembly_and_second_client():
    srv = TciServer(port=0)
    port = srv.start()
    try:
        a, b = WsClient(port), WsClient(port)
        a.recv_until("start;")
        b.recv_until("start;")
        # command split across two text frames (tci.c:407-428 buffering)
        a.send_text("vfo:0,0,70")
        a.send_text("74000;trx:0,tr")
        a.send_text("ue;")
        assert a.recv_until("trx:0,true;")
        assert srv.state.vfo[0][0] == 7074000
        assert srv.state.trx[0] is True
        # the other client saw both broadcasts
        assert b.recv_until("vfo:0,0,7074000;")
        assert b.recv_until("trx:0,true;")
        a.close()
        b.close()
    finally:
        srv.stop()


def test_tci_binary_frame_roundtrip():
    audio = np.sin(np.linspace(0, 6.28, 480)).astype(np.float32)
    frame = pack_audio_frame(1, 48000, audio)
    rx, rate, typ, data = unpack_audio_frame(frame)
    assert (rx, rate, typ) == (1, 48000, RX_AUDIO_STREAM)
    assert np.array_equal(data, audio)
    enc = ws_encode(frame)
    assert enc[0] & 0x0F == 0x2


def test_tci_rx_audio_negotiation_and_chunking():
    srv = TciServer(port=0)
    port = srv.start()
    try:
        c = WsClient(port)
        c.recv_until("start;")
        # 24000 is REJECTED (no resampler here nor in the reference,
        # tci.c:220-222): the stream stays at the native 48 k
        c.send_text("audio_stream_channels:1;audio_samplerate:24000;"
                    "audio_start:0;")
        c.recv_until("audio_start:0;")
        # a block bigger than one chunk: left=1.0, right=0.0 -> mono 0.5
        n = TCI_STREAM_DATA_BYTES // 4 + 100
        stereo = np.stack([np.ones(n, np.float32), np.zeros(n, np.float32)])
        srv.send_audio(stereo)
        got = []
        while sum(d.size for *_, d in got) < n:
            rx, rate, fmt, length, typ, chans, data = unpack_stream(
                c.recv_binary())
            assert typ == RX_AUDIO_STREAM and chans == 1 and rate == 48000
            assert len(data) * 4 <= TCI_STREAM_DATA_BYTES
            got.append((rx, rate, fmt, length, typ, chans, data))
        mono = np.concatenate([d for *_, d in got])
        assert mono.size == n and np.allclose(mono, 0.5)
        c.close()
    finally:
        srv.stop()


def test_tci_tx_audio_and_chrono_pacing():
    now = [0.0]
    srv = TciServer(port=0, clock=lambda: now[0])
    port = srv.start()
    try:
        c = WsClient(port)
        c.recv_until("start;")
        c.send_text("trx:0,true;")
        c.recv_until("trx:0,true;")
        assert _wait(lambda: srv.tx_client is not None)
        # stereo-interleaved float32 TX audio: I=ramp, Q=-ramp
        n = 256
        i = np.arange(n, dtype=np.float32) / n
        inter = np.empty(2 * n, np.float32)
        inter[0::2], inter[1::2] = i, -i
        c.send_binary(pack_stream(0, 48000, inter, TX_AUDIO_STREAM))
        assert _wait(lambda: srv.tx_pending() >= n)
        # drain: first n real samples match, underrun zero-fills
        mic = srv.get_mic(n + 64)
        assert np.allclose(mic.real[:n], i) and np.allclose(mic.imag[:n], -i)
        assert np.all(mic[n:] == 0)
        # wall clock advanced past the sent-sample budget -> TX_CHRONO
        now[0] = 1.0
        srv.get_mic(16)
        hdr = c.recv_binary()
        *_, typ, chans, _ = unpack_stream(hdr)
        assert typ == TX_CHRONO
        # releasing trx clears the TX claim
        c.send_text("trx:0,false;")
        assert _wait(lambda: srv.tx_client is None)
        assert srv.tx_pending() == 0
        c.close()
    finally:
        srv.stop()


def _cfg(**kw):
    return RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                       tune_hz=10000.0, agc=True, **kw)


def test_tci_radio_integration():
    radio = Radio(_cfg(), hardware="sim")
    radio.hw.tone_hz = 11000.0
    radio.open()
    port = radio.enable_tci(port=0)
    try:
        c = WsClient(port)
        pre = c.recv_until("start;")
        assert any(p == "vfo:0,0,10000;" for p in pre)
        # client retunes the running chain through the vfo command
        c.send_text("vfo:0,0,12000;")
        c.recv_until("vfo:0,0,12000;")
        assert _wait(lambda: radio.freq_hz == 12000.0)
        c.send_text("modulation:0,lsb;")
        c.recv_until("modulation:0,lsb;")
        assert _wait(lambda: radio.cfg.mode == "LSB")
        # RX audio flows to a listening client on run_once
        c.send_text("audio_start:0;")
        c.recv_until("audio_start:0;")
        radio.run_once()
        *_, typ, chans, data = unpack_stream(c.recv_binary())
        assert typ == RX_AUDIO_STREAM and data.size > 0
        # client-keyed TX: claim trx, stream audio, transmit one block
        radio.enable_tx()
        c.send_text("trx:0,true;")
        c.recv_until("trx:0,true;")
        assert _wait(lambda: radio.tci.tx_client is not None)
        n = radio.tx.block
        tone = np.sin(2 * np.pi * 1000 / 48000 *
                      np.arange(n)).astype(np.float32)
        inter = np.empty(2 * n, np.float32)
        inter[0::2] = inter[1::2] = tone
        c.send_binary(pack_stream(0, 48000, inter, TX_AUDIO_STREAM))
        assert _wait(lambda: radio.tci.tx_pending() >= n)
        iq = radio.tci_transmit_once()
        assert iq is not None and np.all(np.isfinite(iq))
        assert np.max(np.abs(iq)) > 1e-3   # SSB energy from the tone
        c.close()
    finally:
        radio.close()


def test_tci_malformed_commands_keep_connection():
    """Malformed args (bad VFO index, non-numeric fields) drop the command
    instead of killing the client's connection; the reference likewise
    ignores unparseable text (tci.c:171-324)."""
    srv = TciServer(port=0)
    port = srv.start()
    try:
        c = WsClient(port)
        c.recv_until("start;")
        c.send_text("vfo:5,0,7000000;")          # receiver index out of range
        c.send_text("vfo:0,0,notanumber;")       # uncastable frequency
        c.send_text("trx:banana;")               # uncastable index
        # the connection survives: a good command still round-trips
        c.send_text("vfo:0,0,7074000;")
        assert c.recv_until("vfo:0,0,7074000;")
        assert srv.state.vfo[0][0] == 7074000
        c.close()
    finally:
        srv.stop()


def test_tci_audio_samplerate_only_48k():
    """audio_samplerate accepts only the native 48 k — we do not resample
    the stream and neither does the reference (tci.c:220-222)."""
    srv = TciServer(port=0)
    port = srv.start()
    try:
        c = WsClient(port)
        c.recv_until("start;")
        c.send_text("audio_samplerate:12000;")   # rejected: no echo
        c.send_text("audio_samplerate:48000;")
        assert c.recv_until("audio_samplerate:48000;")
        c.close()
    finally:
        srv.stop()
