"""TCI server: real websocket client handshake, commands, binary audio."""

import base64
import hashlib
import os
import socket
import struct

import numpy as np

from quisk_tpu.app.tci import (TciServer, WS_GUID, pack_audio_frame,
                               unpack_audio_frame, ws_encode)


class WsClient:
    """Minimal masked websocket client for the tests."""

    def __init__(self, port):
        self.s = socket.create_connection(("127.0.0.1", port), timeout=5)
        key = base64.b64encode(os.urandom(16)).decode()
        self.s.sendall((f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                        f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                        f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.s.recv(1024)
        expect = base64.b64encode(
            hashlib.sha1((key + WS_GUID).encode()).digest()).decode()
        assert expect.encode() in resp
        self.buf = resp.split(b"\r\n\r\n", 1)[1]

    def send_text(self, text):
        data = text.encode()
        mask = os.urandom(4)
        frame = bytes([0x81])
        n = len(data)
        assert n < 126
        frame += bytes([0x80 | n]) + mask
        frame += bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        self.s.sendall(frame)

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
            self.buf += self.s.recv(4096)

    def recv_until(self, needle, limit=64):
        texts = []
        for _ in range(limit):
            op, p = self.recv_frame()
            if op == 0x1:
                texts.append(p.decode())
                if needle in texts[-1]:
                    return texts
        raise AssertionError(f"{needle!r} not seen in {texts}")

    def close(self):
        self.s.close()


def test_tci_handshake_preamble_and_commands():
    srv = TciServer(port=0)
    port = srv.start()
    try:
        c = WsClient(port)
        pre = c.recv_until("ready;")
        assert any(p.startswith("protocol:") for p in pre)
        assert any(p.startswith("iq_samplerate:") for p in pre)
        c.send_text("vfo:0,0,14074000;")
        assert c.recv_until("vfo:0,0,14074000;")
        assert srv.state.vfo[0][0] == 14074000
        c.send_text("modulation:0,lsb;")
        assert c.recv_until("modulation:0,lsb;")
        c.send_text("trx:0,true;")
        assert c.recv_until("trx:0,true;")
        assert srv.state.trx[0] is True
        c.send_text("audio_start:0;")
        assert c.recv_until("audio_start:0;")
        assert 0 in srv.state.audio_streams
        c.send_text("bogus_command:1;")
        assert c.recv_until("bogus_command:not_supported;")
        c.close()
    finally:
        srv.stop()


def test_tci_binary_frame_roundtrip():
    audio = np.sin(np.linspace(0, 6.28, 480)).astype(np.float32)
    frame = pack_audio_frame(1, 48000, audio)
    rx, rate, typ, data = unpack_audio_frame(frame)
    assert (rx, rate, typ) == (1, 48000, 1)
    assert np.array_equal(data, audio)
    # server->client binary websocket encoding is parseable
    enc = ws_encode(frame)
    assert enc[0] & 0x0F == 0x2
