"""Streaming web frontend: page serving, WebSocket state/control round
trip, spectrum frames, and Radio integration (the SURVEY §7 M5 streaming
server replacing quisk.py's GraphScreen/WaterfallScreen wx surfaces)."""

import json
import socket
import struct
import time

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
from quisk_tpu.app.webui import MODES, WebUIServer

from test_tci import WsClient


class FakeRadio:
    def __init__(self):
        self.freq_hz = 7_050_000.0
        self.vfo_hz = 7_050_000.0
        self.calls = []

        class Cfg:
            mode = "USB"
            channels = 4
        self.cfg = Cfg()

    def set_frequency(self, hz):
        self.freq_hz = hz
        self.calls.append(("freq", hz))

    def set_mode(self, m):
        self.cfg.mode = m
        self.calls.append(("mode", m))

    def set_sub_rx(self, channel, freq_hz=None, mode=None, route=None):
        self.calls.append(("subrx", channel, freq_hz, mode, route))


def _recv_json(ws, deadline=5.0):
    end = time.monotonic() + deadline
    while time.monotonic() < end:
        op, p = ws.recv_frame()
        if op == 0x1:
            return json.loads(p.decode())
    raise AssertionError("no text frame")


def _recv_spectrum(ws, deadline=5.0):
    end = time.monotonic() + deadline
    while time.monotonic() < end:
        op, p = ws.recv_frame()
        if op == 0x2 and p[:1] == b"S":
            f0, df, sm = struct.unpack_from("<3xddf", p, 1)
            row = np.frombuffer(p[24:], np.float32)
            return f0, df, sm, row
    raise AssertionError("no spectrum frame")


def test_page_and_ws_handshake():
    ui = WebUIServer(FakeRadio())
    port = ui.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        page = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            page += chunk
        assert b"200 OK" in page
        assert b"<canvas" in page and b"WebSocket" in page
        for m in MODES:
            assert m.encode() in page
        s.close()
    finally:
        ui.stop()


def test_control_round_trip_and_state_broadcast():
    fake = FakeRadio()
    ui = WebUIServer(fake)
    port = ui.start()
    try:
        ws = WsClient(port, path="/ws")
        st = _recv_json(ws)                      # state on connect
        assert st["freq"] == 7_050_000.0 and st["mode"] == "USB"
        assert st["modes"] == MODES and st["channels"] == 4
        ws.send_text(json.dumps({"cmd": "freq", "value": 7_074_000}))
        st = _recv_json(ws)                      # state re-broadcast
        assert st["freq"] == 7_074_000.0
        ws.send_text(json.dumps({"cmd": "mode", "value": "LSB"}))
        st = _recv_json(ws)
        assert st["mode"] == "LSB"
        ws.send_text(json.dumps({"cmd": "subrx", "channel": 2,
                                 "freq": 7_060_000, "mode": "AM",
                                 "route": "left"}))
        _recv_json(ws)
        assert ("subrx", 2, 7_060_000, "AM", "left") in fake.calls
        # malformed input must not kill the connection
        ws.send_text("{nope")
        ws.send_text(json.dumps({"cmd": "mode", "value": "NOT_A_MODE"}))
        ws.send_text(json.dumps({"cmd": "freq", "value": 7_100_000}))
        st = _recv_json(ws)
        assert st["freq"] == 7_100_000.0
        ws.s.close()
    finally:
        ui.stop()


def test_spectrum_frame_format():
    ui = WebUIServer(FakeRadio())
    port = ui.start()
    try:
        ws = WsClient(port, path="/ws")
        _recv_json(ws)
        deadline = time.monotonic() + 5
        while ui.n_clients == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        row = np.linspace(-140.0, -20.0, 256).astype(np.float32)
        ui.send_spectrum(7_000_000.0, 93.75, row, smeter_db=-73.0)
        f0, df, sm, got = _recv_spectrum(ws)
        assert f0 == 7_000_000.0 and abs(df - 93.75) < 1e-9
        assert abs(sm - (-73.0)) < 1e-4
        np.testing.assert_array_equal(got, row)
        ws.s.close()
    finally:
        ui.stop()


def test_radio_webui_integration():
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=10000.0)
    radio = Radio(cfg, hardware="sim")
    radio.hw.tone_hz = 10300.0
    radio.open()
    try:
        port = radio.enable_webui()
        ws = WsClient(port, path="/ws")
        st = _recv_json(ws)
        assert st["mode"] == "USB"
        deadline = time.monotonic() + 5
        while radio.webui.n_clients == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        # a full graph refresh interval of blocks -> one spectrum frame
        radio.run(blocks=radio.graph.blocks_per_refresh + 1)
        f0, df, sm, row = _recv_spectrum(ws)
        assert row.shape == (1024,)
        assert np.all(np.isfinite(row))
        # the tone sits 10.3 kHz above the (0 Hz) VFO in the row
        peak_hz = f0 + df * int(np.argmax(row))
        assert abs(peak_hz - 10300.0) < 3 * df
        # tune from the page; the running chain follows
        ws.send_text(json.dumps({"cmd": "freq", "value": 12000}))
        deadline = time.monotonic() + 5
        while radio.freq_hz != 12000.0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert radio.freq_hz == 12000.0
        ws.s.close()
    finally:
        radio.close()


def test_webui_volume_mute_band_commands():
    cfg = RadioConfig(sample_rate=192000.0, mode="USB")
    radio = Radio(cfg, hardware="sim")
    radio.open()
    try:
        port = radio.enable_webui()
        ws = WsClient(port, path="/ws")
        st = _recv_json(ws)
        assert st["volume"] == 1.0 and st["muted"] is False
        ws.send_text(json.dumps({"cmd": "volume", "value": 0.3}))
        st = _recv_json(ws)
        assert st["volume"] == 0.3 and radio.volume == 0.3
        ws.send_text(json.dumps({"cmd": "mute", "value": True}))
        st = _recv_json(ws)
        assert st["muted"] is True and radio.muted
        ws.send_text(json.dumps({"cmd": "band", "value": "40"}))
        st = _recv_json(ws)
        assert st["band"] == "40" and radio.vfo_hz == 7_150_000
        assert st["mode"] == "LSB"
        ws.s.close()
    finally:
        radio.close()


def _recv_multirx(ws, want_channels, deadline=10.0):
    """Collect one b'M' sub-RX row per channel in ``want_channels``."""
    rows = {}
    end = time.monotonic() + deadline
    while time.monotonic() < end and set(rows) != set(want_channels):
        op, p = ws.recv_frame()
        if op == 0x2 and p[:1] == b"M":
            ch, _pad, f0, df = struct.unpack_from("<BHdd", p, 1)
            rows[ch] = (f0, df, np.frombuffer(p[20:], np.float32))
    assert set(rows) == set(want_channels), set(rows)
    return rows


def test_multirx_webui_protocol_drive():
    """VERDICT r2 #6 'done' criterion: a 4-channel radio with one DGT-IQ
    sub-RX driven entirely from the browser WebSocket protocol — sub-RX
    config, per-sub-RX spectrum panels, PTT indicator, zoom/pan."""
    cfg = RadioConfig(sample_rate=192000.0, channels=4, audio_block=512,
                      mode="USB", tune_hz=5000.0)
    radio = Radio(cfg, hardware="sim", rigctl_port=None)
    radio.hw.tone_hz = 5300.0
    radio.open()
    try:
        port = radio.enable_webui()
        ws = WsClient(port, path="/ws")
        st = _recv_json(ws)
        assert st["channels"] == 4 and len(st["subrx"]) == 3
        assert st["keyed"] is False and st["tx"] is False
        # configure sub-RX 1 (AM voice, left ear) and sub-RX 2 (DGT-IQ
        # digital tap) purely over the protocol
        ws.send_text(json.dumps({"cmd": "subrx", "channel": 1,
                                 "freq": radio.vfo_hz + 40000,
                                 "mode": "AM", "route": "left"}))
        st = _recv_json(ws)
        ws.send_text(json.dumps({"cmd": "subrx", "channel": 2,
                                 "freq": radio.vfo_hz - 30000,
                                 "mode": "DGT_IQ", "route": "off"}))
        st = _recv_json(ws)
        sub = {s["channel"]: s for s in st["subrx"]}
        assert sub[1]["mode"] == "AM" and sub[1]["route"] == "left"
        assert sub[1]["freq"] == radio.vfo_hz + 40000
        assert sub[2]["mode"] == "DGT_IQ"
        deadline = time.monotonic() + 5
        while radio.webui.n_clients == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        # run a refresh interval: main 'S' row + one 'M' row per sub-RX
        radio.run(blocks=radio.graph.blocks_per_refresh + 1)
        rows = _recv_multirx(ws, want_channels=[1, 2, 3])
        f0_1, df_1, row_1 = rows[1]
        # sub-RX 1's narrow panel is centered on ITS tuned frequency
        assert abs((f0_1 + df_1 * len(row_1) / 2)
                   - (radio.vfo_hz + 40000)) < 2000
        assert np.all(np.isfinite(row_1))
        # the DGT-IQ sub-RX published raw I/Q for digital programs
        assert radio.digital_output(2) is not None
        assert np.iscomplexobj(radio.digital_output(2))
        # zoom 4x centered on the tone, then pan: streamed df shrinks 4x
        ws.send_text(json.dumps({"cmd": "zoom", "value": 4,
                                 "center": radio.vfo_hz + 5300}))
        st = _recv_json(ws)
        assert st["zoom"] == 4
        radio.run(blocks=radio.graph.blocks_per_refresh + 1)
        f0, df, sm, row = _recv_spectrum(ws)
        full_df = cfg.sample_rate / radio.graph.pixels
        assert abs(df - full_df / 4) < 1e-9, (df, full_df)
        # the tone stays visible inside the zoom window
        peak_hz = f0 + df * int(np.argmax(row))
        assert abs(peak_hz - (radio.vfo_hz + 5300)) < 5 * df
        ws.s.close()
    finally:
        radio.close()


def test_webui_ptt_spot_state():
    """PTT and Spot drive the TX surface over the protocol and the state
    JSON reflects keyed/spot (the page's PTT indicator + Spot button)."""
    cfg = RadioConfig(sample_rate=48000.0, mode="CWU", tune_hz=7000.0)
    radio = Radio(cfg, hardware="sim", rigctl_port=None)
    radio.enable_tx()
    radio.open()
    try:
        port = radio.enable_webui()
        ws = WsClient(port, path="/ws")
        st = _recv_json(ws)
        assert st["tx"] is True and st["spot"] == -1.0
        ws.send_text(json.dumps({"cmd": "spot", "value": 0.5}))
        st = _recv_json(ws)
        assert st["spot"] == 0.5
        ws.send_text(json.dumps({"cmd": "ptt", "value": True}))
        st = _recv_json(ws)
        assert radio.manual_ptt is True
        radio.run_once()                     # loop latches keyed
        st = _recv_json(ws)                  # keyed-change broadcast
        assert st["keyed"] is True
        ws.send_text(json.dumps({"cmd": "ptt", "value": False}))
        _recv_json(ws)
        assert radio.manual_ptt is False
        ws.s.close()
    finally:
        radio.close()


def test_malformed_commands_do_not_raise():
    """Valid-JSON-but-malformed commands (missing keys, wrong types) are
    dropped instead of raising out of the WS loop and killing the page's
    connection."""
    srv = WebUIServer(FakeRadio())
    for text in ('{"cmd": "freq"}',                      # missing value
                 '{"cmd": "freq", "value": "abc"}',      # uncastable
                 '{"cmd": "subrx"}',                     # missing channel
                 '{"cmd": "mode", "value": "NOPE"}',     # unknown mode
                 '{"cmd": 7}', '[]', '"x"', 'not json'):
        srv.on_command(text)                             # must not raise
    # and a good command still works after the bad ones
    srv.on_command('{"cmd": "freq", "value": 7100000}')
    assert ("freq", 7100000.0) in srv.control.calls
