"""Tests: rigctld server over real sockets, CW keying, DX spots, MIDI."""

import socket

import numpy as np

from quisk_tpu.app.cw import (KeyEnvelope, KeyJitterBuffer, Sidetone,
                              text_to_key_samples)
from quisk_tpu.app.interop import (DxClusterClient, MidiControlMap,
                                   MidiParser, parse_spot)
from quisk_tpu.app.rigctl import RadioState, RigctlServer

FS = 48000.0


# ------------------------------------------------------------- rigctld
class _Client:
    def __init__(self, port):
        self.s = socket.create_connection(("127.0.0.1", port), timeout=5)
        self.f = self.s.makefile("rwb")

    def cmd(self, line, nlines=1):
        self.f.write((line + "\n").encode())
        self.f.flush()
        return [self.f.readline().decode().rstrip("\n") for _ in range(nlines)]

    def close(self):
        self.s.close()


def test_rigctl_server_protocol():
    srv = RigctlServer(port=0)
    port = srv.start()
    try:
        c = _Client(port)
        assert c.cmd("F 14074000") == ["RPRT 0"]
        assert c.cmd("f") == ["14074000"]
        assert c.cmd("M USB 2400") == ["RPRT 0"]
        assert c.cmd("m", nlines=2) == ["USB", "2400"]
        # hamlib CW maps to quisk CWU internally, back to CW on the wire
        c.cmd("M CW 500")
        assert srv.state.mode == "CWU"
        assert c.cmd("m", nlines=2)[0] == "CW"
        assert c.cmd("T 1") == ["RPRT 0"]
        assert srv.state.ptt is True
        assert c.cmd("t") == ["1"]
        assert c.cmd("V VFOB") == ["RPRT 0"]
        assert c.cmd("v") == ["VFOB"]
        ds = c.cmd("\\dump_state", nlines=21)    # full capability dump
        assert ds[0] == "0"                      # protocol version line
        assert ds[-1] == "0"
        assert c.cmd("\\chk_vfo") == ["0"]
        assert c.cmd("Z 1") == ["RPRT -11"]      # unknown command
        c.close()
        # state change callback fires
        seen = []
        srv.state.on_change = lambda f, v: seen.append((f, v))
        c2 = _Client(port)
        c2.cmd("F 7030000")
        assert ("freq", 7030000) in seen
        c2.close()
    finally:
        srv.stop()


# ------------------------------------------------------------------ CW
def test_morse_timing():
    wpm = 20.0
    unit = round(1.2 / wpm * FS)
    k = text_to_key_samples("e", wpm, FS)           # dit + word gap
    assert np.sum(k) == unit
    k = text_to_key_samples("t", wpm, FS)
    assert np.sum(k) == 3 * unit
    # "a" = .-  -> 1 + gap(1) + 3 units, total on = 4 units
    k = text_to_key_samples("a", wpm, FS)
    assert np.sum(k) == 4 * unit
    assert len(k) == (1 + 1 + 3 + 7) * unit


def test_key_envelope_rise_fall_and_continuity():
    env = KeyEnvelope(FS, rise_ms=5.0)
    n_edge = env.n_edge
    key = np.concatenate([np.zeros(100), np.ones(2000), np.zeros(2000)])
    y = env.process(key.astype(np.float32))
    assert y[0] == 0.0
    assert abs(y[100 + n_edge] - 1.0) < 1e-6        # full rise after edge
    assert np.max(np.abs(np.diff(y))) < 1.2 * np.pi / (2 * n_edge)  # smooth
    # streaming continuity: same result block-by-block
    env2 = KeyEnvelope(FS, rise_ms=5.0)
    y2 = np.concatenate([env2.process(key[:1500].astype(np.float32)),
                         env2.process(key[1500:].astype(np.float32))])
    assert np.allclose(y, y2, atol=1e-6)


def test_sidetone_pitch_and_click_free():
    st = Sidetone(FS, pitch_hz=600.0, level=0.5)
    key = np.concatenate([np.zeros(480), np.ones(4800), np.zeros(4800)])
    y = st.process(key.astype(np.float32))
    seg = y[1000:4000]                               # steady key-down
    f = np.fft.rfftfreq(len(seg), 1 / FS)
    k = np.argmax(np.abs(np.fft.rfft(seg * np.hanning(len(seg)))))
    assert abs(f[k] - 600.0) < 20.0
    # no clicks: spectral splatter far below the tone
    S = np.abs(np.fft.rfft(y))
    tone_k = np.argmin(np.abs(np.fft.rfftfreq(len(y), 1 / FS) - 600.0))
    tone_p = np.max(S[tone_k - 5:tone_k + 6])
    far = S[np.abs(np.fft.rfftfreq(len(y), 1 / FS) - 600.0) > 2000.0]
    assert 20 * np.log10(np.max(far) / tone_p) < -40.0


def test_key_jitter_buffer_preserves_element_timing():
    jb = KeyJitterBuffer(FS, delay_ms=20.0)
    # sender keys a 60 ms dit at t=0, events arrive with 12 ms jitter
    jb.push(0.000 + 0.012, True)     # late arrival still within delay
    jb.push(0.060, False)
    y = jb.render(int(0.2 * FS))
    on = np.where(y > 0.5)[0]
    dur_ms = (on[-1] - on[0] + 1) / FS * 1e3
    # jitter absorbed: reproduced dit is 60 ms despite 12 ms arrival skew
    start_ms = on[0] / FS * 1e3
    assert abs(start_ms - 32.0) < 1.0                # 12 jitter + 20 delay
    assert abs(dur_ms - (60.0 + 12.0 - 12.0 - 12.0)) < 1.0 or \
        abs(dur_ms - 48.0) < 1.0


def test_key_jitter_buffer_exact_when_timestamped():
    # correct usage: push with the SEND timestamp; playback = t + delay
    jb = KeyJitterBuffer(FS, delay_ms=20.0)
    jb.push(0.000, True)
    jb.push(0.060, False)
    y = jb.render(int(0.2 * FS))
    on = np.where(y > 0.5)[0]
    assert abs(on[0] / FS - 0.020) < 1e-3
    assert abs((on[-1] - on[0] + 1) / FS - 0.060) < 1e-3


# ------------------------------------------------------------ DX spots
def test_parse_spot_lines():
    s = parse_spot("DX de W1AW:     14074.0  JA1XYZ       FT8 +03dB     0123Z")
    assert s.spotter == "W1AW" and s.dx_call == "JA1XYZ"
    assert s.freq_khz == 14074.0 and "FT8" in s.comment
    assert parse_spot("login: please enter your call") is None


def test_dx_cluster_client_feed():
    c = DxClusterClient("N0CALL")
    assert c.on_connect() == b"N0CALL\r\n"
    data = (b"Welcome to the cluster\r\n"
            b"DX de K3LR:      7005.5  OK1ABC       CW 25 wpm      1456Z\r\n"
            b"DX de VE3NEA:   21074.0  ZL2AAA       FT8            1457Z\r\n")
    new = c.feed(data)
    assert [s.dx_call for s in new] == ["OK1ABC", "ZL2AAA"]
    assert len(c.spots) == 2


# --------------------------------------------------------------- MIDI
def test_midi_parser_and_control_map():
    p = MidiParser()
    ev = p.feed(bytes([0x90, 60, 100, 0x80, 60, 0, 0xB0, 7, 70]))
    assert [e.kind for e in ev] == ["note_on", "note_off", "control"]
    # running status: second note_on without status byte
    ev = p.feed(bytes([0x90, 61, 10, 62, 20]))
    assert len(ev) == 2 and ev[1].number == 62
    # note_on velocity 0 is note_off
    ev = p.feed(bytes([0x90, 61, 0]))
    assert ev[0].kind == "note_off"

    mc = MidiControlMap()
    calls = []
    mc.bind_note(60, "ptt")
    mc.bind_cc(16, "tune")
    mc.on("ptt", lambda down, v: calls.append(("ptt", down)))
    mc.on("tune", lambda _, d: calls.append(("tune", d)))
    mc.dispatch(MidiParser().feed(bytes([0x90, 60, 127])))
    mc.dispatch(MidiParser().feed(bytes([0xB0, 16, 65])))   # +1 relative
    assert ("ptt", True) in calls and ("tune", 1) in calls
