"""MIDI end-to-end: bytes in -> PTT / VFO / sliders move on a live Radio.

Parity: midi_handler.py:19-60 (note/CC decode + dispatch) and quisk.c:5570
(device read every sound loop).  The transport here is a pipe fd and the
direct feed() path; semantics asserted are the reference's: momentary PTT
notes (unless toggle), jog-wheel tune with the speed table + snapping,
absolute knobs spanning value/127, and the MIDI CW key (quisk.c:5819).
"""

import os

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.interop import MidiParser
from quisk_tpu.app.midi import MidiInput, MidiRadioController
from quisk_tpu.app.radio import Radio
from quisk_tpu.io import sources

FS = 48000.0


def _radio():
    cfg = RadioConfig(sample_rate=FS, mode="USB", tune_hz=7_055_000.0,
                      agc=False)
    r = Radio(cfg, hardware="sim")
    r.open()
    return r


def test_midi_ptt_and_cw_key_drive_the_loop():
    r = _radio()
    try:
        r.enable_midi()                      # feed() path, default map
        # note on 0x14 velocity 100 -> PTT pressed (momentary)
        r.midi_in.feed(bytes([0x90, 0x14, 100]))
        r.run_once()
        assert r.manual_ptt is True
        # note on velocity 0 == note off (midi_handler.py:56-58)
        r.midi_in.feed(bytes([0x90, 0x14, 0]))
        r.run_once()
        assert r.manual_ptt is False
        # CW key note (quisk_midi_cwkey)
        r.midi_in.feed(bytes([0x90, 0x15, 127]))
        r.run_once()
        assert r.manual_key is True
        r.midi_in.feed(bytes([0x80, 0x15, 0]))
        r.run_once()
        assert r.manual_key is False
    finally:
        r.close()


def test_midi_jog_tune_moves_vfo_with_speed_table():
    r = _radio()
    try:
        ctl = r.enable_midi()
        ctl.bind_cc(1, "Tune +3")            # speed 3 -> 100 Hz steps
        f0 = r.freq_hz
        # encoder up (value < 64): +100, snapped to a 100 Hz multiple
        r.midi_in.feed(bytes([0xB0, 1, 1]))
        r.run_once()
        assert r.freq_hz == ((f0 + 100 + 50) // 100) * 100
        f1 = r.freq_hz
        # encoder down (value >= 64): -100
        r.midi_in.feed(bytes([0xB0, 1, 65]))
        r.run_once()
        assert r.freq_hz == f1 - 100
        # speed 6 -> 1 kHz steps
        ctl.bind_cc(2, "Tune +6")
        f2 = r.freq_hz
        r.midi_in.feed(bytes([0xB0, 2, 1]))
        r.run_once()
        assert r.freq_hz % 1000 == 0 and abs(r.freq_hz - f2) <= 1000
    finally:
        r.close()


def test_midi_absolute_knobs_and_band_note():
    r = _radio()
    try:
        ctl = r.enable_midi()
        ctl.bind_note(0x20, "Band 40")
        # volume knob CC7: value 64 is exact center 0.5
        r.midi_in.feed(bytes([0xB0, 7, 64]))
        r.run_once()
        assert abs(r.volume - 0.5) < 1e-6
        # absolute Tune knob spans 98% of the capture bandwidth
        ctl.bind_cc(3, "Tune")
        r.midi_in.feed(bytes([0xB0, 3, 127]))
        r.run_once()
        want = r.vfo_hz  # set_frequency may have recentered; check offset
        assert abs((r.freq_hz - want)) <= 0.49 * FS
        # band note switches bands (first visit -> band center)
        r.midi_in.feed(bytes([0x90, 0x20, 1]))
        r.run_once()
        lo, hi = Radio.BAND_EDGES["40"]
        assert lo <= r.freq_hz <= hi
    finally:
        r.close()


def test_midi_pipe_transport_and_running_status():
    # transport: a real fd (pipe); parser handles running status
    rfd, wfd = os.pipe()
    try:
        mi = MidiInput(rfd)
        # running status: one status byte, two note messages
        os.write(wfd, bytes([0x90, 0x14, 100, 0x14, 0]))
        evs = mi.poll()
        assert [e.kind for e in evs] == ["note_on", "note_off"]
        assert mi.poll() == []               # drained, non-blocking
        mi.close()
    finally:
        os.close(rfd)
        os.close(wfd)


def test_midi_slider_jog_clamps():
    r = _radio()
    try:
        ctl = r.enable_midi()
        ctl.bind_cc(9, "Vol -9")             # inverted encoder, step 22
        for _ in range(8):                   # drive well past the bottom
            r.midi_in.feed(bytes([0xB0, 9, 1]))
            r.run_once()
        assert r.volume == 0.0
        for _ in range(8):
            r.midi_in.feed(bytes([0xB0, 9, 100]))
            r.run_once()
        assert r.volume == 1.0
    finally:
        r.close()
