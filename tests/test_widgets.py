"""Headless widget models (quisk_widgets.py semantics without wx):
digit-wise frequency tuning with the accelerating hold-repeat, cycle
buttons, radio groups, bit fields, the validating frequency entry, and
the standard panel bound to a live Radio through the web UI protocol."""

import numpy as np

from quisk_tpu.app.widgets import (BitField, CheckButton, CycleButton,
                                   FreqEntry, FrequencyDisplay, RadioGroup,
                                   RepeatButton, Slider, WidgetPanel,
                                   freq_format, standard_panel)


def test_freq_format():
    # FreqFormatter (quisk_widgets.py:96): blanks between 3-digit groups
    assert freq_format(7) == "7"
    assert freq_format(7210) == "7 210"
    assert freq_format(14_234_500) == "14 234 500"
    assert freq_format(-1_000) == "-1 000"


def test_frequency_display_digit_rules():
    fired = []
    fd = FrequencyDisplay("freq", fired.append, freq=14_234_567)
    # click digit 2 (hundreds), upper half: +100, lower digits zeroed
    fd.handle("digit", index=2, up=True)
    assert fd.freq == 14_234_600
    fd.handle("digit", index=2, up=False)
    assert fd.freq == 14_234_500
    assert fd.label == "14 234 500 Hz"
    # the 10^(i-1) floor: stepping the top digit below zero
    fd.display(900)
    fd.handle("digit", index=3, up=False)
    assert fd.freq == 100                  # not <= 0 (ChangeFreq, :199)
    assert len(fired) == 3
    fd.handle("release")                   # mouse-up ends the hold
    # wheel tunes without arming the repeat
    fd.handle("wheel", index=1, up=True)
    assert fd.freq == 110 and fd.next_repeat_ms() is None


def test_frequency_display_hold_repeat_schedule():
    fd = FrequencyDisplay("freq", freq=7_000_000)
    fd.handle("digit", index=3, up=True)
    # OnTimer (quisk_widgets.py:208): 300 -> 150 -> 145 -> ... floor 20
    seq = [fd.next_repeat_ms() for _ in range(30)]
    assert seq[0] == 150 and seq[1] == 145 and seq[2] == 140
    assert min(s for s in seq if s) >= 20
    fd.handle("release")
    assert fd.next_repeat_ms() is None


def test_slider_and_dec_value():
    got = []
    s = Slider("Vol", "Vol %3d", 30, 0, 100, got.append)
    assert s.label == "Vol  30"
    s.handle("set", value=250)
    assert s.value == 100 and got            # clamped, fired
    s.set_value(50)                          # visual move: no fire
    assert len(got) == 1 and s.get_dec_value() == 0.5
    s.set_dec_value(0.25)
    assert s.value == 25 and len(got) == 2


def test_cycle_button_semantics():
    got = []
    c = CycleButton("NB", ["NB", "NB 1", "NB 2", "NB 3"], got.append)
    c.handle("press")
    assert c.index == 1 and c.down and c.direction == 1
    c.handle("press"); c.handle("press"); c.handle("press")
    assert c.index == 0 and not c.down       # wrapped
    c.handle("right")
    assert c.index == 3 and c.direction == -1
    c.handle("dclick")
    assert c.index == 0
    # is_radio: first press only selects, second press cycles
    r = CycleButton("X", ["A", "B"], is_radio=True)
    r.handle("press")
    assert r.index == 0 and r.down and r.direction == 0
    r.handle("press")
    assert r.index == 1


def test_radio_group_exclusive():
    sel = []
    g = RadioGroup("mode", lambda grp: sel.append(grp.get_label()),
                   ["CWL", "CWU", ["LSB", "USB"], "AM"], default="CWU")
    assert g.get_label() == "CWU"
    g.handle("press", button="mode.AM")
    assert g.get_label() == "AM" and sel[-1] == "AM"
    downs = [b.down for b in g.buttons]
    assert downs.count(True) == 1
    # the cycle member: select then cycle to its second label
    g.handle("press", button="mode.LSB")
    assert g.get_label() == "LSB"
    g.handle("press", button="mode.LSB")
    assert g.get_label() == "USB"
    g.set_label("CWL")
    assert g.get_label() == "CWL" and sel[-1] == "USB"  # set: no fire


def test_bitfield_and_freq_entry():
    got = []
    b = BitField("reg", 8, value=0b1010, command=got.append)
    b.handle("bit", bit=0)
    assert b.value == 0b1011
    b.handle("bit", bit=3)
    assert b.value == 0b0011 and len(got) == 2
    e = FreqEntry("entry", 100_000, 30_000_000, 7_000_000)
    e.handle("enter", text="14.2305")       # '.' == MHz (FreqSetter)
    assert e.freq == 14_230_500
    e.handle("enter", text="7 100 000")     # plain digits == Hz
    assert e.freq == 7_100_000
    e.handle("enter", text="-5")            # rejected
    assert e.freq == 7_100_000
    e.handle("enter", text="99999999999")   # clamped to fmax
    assert e.freq == 30_000_000
    e.handle("spin", khz=7100)
    assert e.freq == 7_100_000


def test_repeat_button_schedule():
    downs, ups = [], []
    r = RepeatButton("Up", downs.append, ups.append)
    r.handle("press")
    assert len(downs) == 1
    assert r.next_repeat_ms() == 300         # arm
    assert r.next_repeat_ms() == 150 and len(downs) == 2
    assert r.next_repeat_ms() == 150 and len(downs) == 3
    r.handle("release")
    assert ups and r.next_repeat_ms() is None


def test_standard_panel_drives_radio_via_webui_protocol():
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.app.webui import WebUIServer
    from quisk_tpu.hw.base import Hardware

    class HW(Hardware):
        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

    r = Radio(RadioConfig(sample_rate=48000.0, tune_hz=7_050_000.0,
                          channels=2, agc=False), hardware=HW())
    srv = WebUIServer(r)
    st = srv.state_dict()
    kinds = {w["kind"] for w in st["widgets"]}
    assert {"freq_display", "group", "slider", "cycle"} <= kinds
    # tune by clicking the 10 kHz digit of the frequency display
    srv.on_command('{"cmd":"widget","id":"freq","event":"digit",'
                   '"index":4,"up":true}')
    assert r.freq_hz == 7_060_000
    # mode via the radio group; volume via the slider; split via cycle
    srv.on_command('{"cmd":"widget","id":"mode","event":"press",'
                   '"button":"mode.AM"}')
    assert r.cfg.mode == "AM"
    srv.on_command('{"cmd":"widget","id":"Vol","event":"set","value":40}')
    assert abs(r.volume - 0.4) < 1e-9
    srv.on_command('{"cmd":"widget","id":"Split","event":"press"}')
    assert r.split_rxtx == 1
    # the state JSON reflects the radio back into the widget tree
    st = srv.state_dict()
    wd = {w["name"]: w for w in st["widgets"]}
    assert wd["freq"]["freq"] == 7_060_000
    assert wd["mode"]["selected"] == "AM"
    assert wd["Split"]["index"] == 1
