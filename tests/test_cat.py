"""CAT breadth beyond rigctld: Flex/Kenwood 'ZZ' serial set, Elecraft K4
TCP set, WSJT-X launcher glue, and the shared-state Radio integration
(parity quisk.py:286 HamlibHandlerSerial, quisk.py:1256 ElecraftK4Handler,
quisk.py:4380 StartWsjtx)."""

import os
import socket
import time

import numpy as np

from quisk_tpu.app.cat import (FlexZZProtocol, K4Protocol, K4Server,
                               SerialCat, wsjtx_command)
from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
from quisk_tpu.app.rigctl import RadioState


def test_flexzz_frequency_mode_and_step():
    p = FlexZZProtocol()
    p.state.freq = 7_074_000
    # get/set VFO A with the 11-digit Flex form; FA aliases ZZFA
    assert p.handle("ZZFA") == "ZZFA00007074000;"
    assert p.handle("FA") == "FA00007074000;"
    assert p.handle("ZZFA00014074000") == ""
    assert p.state.freq == 14_074_000
    # tune step: set 1 kHz (code 06), step down then up
    assert p.handle("ZZAC06") == ""
    p.handle("ZZAD")
    assert p.state.freq == 14_073_000
    p.handle("ZZAU")
    assert p.state.freq == 14_074_000
    assert p.handle("ZZAC") == "ZZAC06;"
    # Kenwood vs Flex mode codes for the same radio state
    p.state.mode = "CWU"
    assert p.handle("MD") == "MD3;"          # Kenwood CWU=3
    assert p.handle("ZZMD") == "ZZMD04;"     # Flex CWU=4
    assert p.handle("MD1") == ""
    assert p.state.mode == "LSB"
    assert p.handle("ZZMD07") == ""
    assert p.state.mode == "DGT_U"


def test_flexzz_info_ptt_meter_and_identity():
    p = FlexZZProtocol(smeter=lambda: -73.0)   # S9
    p.state.freq = 7_000_000
    p.state.mode = "USB"
    # ZZIF layout: 4-letter = Flex form with 2-digit mode
    info = p.handle("ZZIF")
    assert info.startswith("ZZIF00007000000")
    assert info.endswith(";") and "01" in info   # Flex USB=01
    # IF aliases the Kenwood layout (1-digit mode code)
    info = p.handle("IF")
    assert info.startswith("IF00007000000")
    # PTT via TX/RX/ZZTX
    assert p.handle("ZZTX") == "ZZTX0;"
    p.handle("TX")
    assert p.state.ptt is True
    assert p.handle("ZZTX") == "ZZTX1;"
    p.handle("RX")
    assert p.state.ptt is False
    # S9 = -73 dB -> (i+140)*2 = 134
    assert p.handle("ZZSM") == "ZZSM134;"
    # identity flips Flex after ZZID
    assert p.handle("ID") == "ID019;"
    p.handle("ZZID")
    assert p.handle("ID") == "ID900;"
    # audio gain and AGC level round-trip through the state
    assert p.handle("ZZAG042") == ""
    assert abs(p.state.volume - 0.42) < 1e-9
    assert p.handle("ZZAG") == "ZZAG042;"
    assert p.handle("ZZAR+030") == ""
    assert p.handle("ZZAR")[:5] == "ZZAR+"
    # unknown command answers '?;'
    assert p.handle("ZZQQ") == "?;"
    # buffered feed splits commands across reads
    out = p.feed("ZZP")
    out += p.feed("S;ZZMU;")
    assert out == "ZZPS1;ZZMU0;"


def test_serialcat_pty_roundtrip():
    cat = SerialCat(public_name="", state=None)
    try:
        fd = os.open(cat.slave_name, os.O_RDWR | os.O_NOCTTY)
        os.write(fd, b"ZZFA00010136000;ZZFA;")
        cat.process()
        deadline = time.monotonic() + 2
        got = b""
        while b";" not in got and time.monotonic() < deadline:
            try:
                got += os.read(fd, 64)
            except BlockingIOError:
                time.sleep(0.01)
        assert got == b"ZZFA00010136000;"
        assert cat.state.freq == 10_136_000
        os.close(fd)
    finally:
        cat.close()


def test_k4_protocol_commands():
    p = K4Protocol(cw_pitch=600.0, smeter=lambda: -73.0)
    p.state.freq = 14_074_000
    assert p.handle("FA") == "FA00014074000;"
    # short set forms scale: 2 digits = MHz, 5 digits = kHz (quisk.py:1409)
    assert p.handle("FA07") == ""
    assert p.state.freq == 7_000_000
    assert p.handle("FA07074") == ""
    assert p.state.freq == 7_074_000
    assert p.handle("FA00007074500") == ""
    assert p.state.freq == 7_074_500
    # mode codes
    p.state.mode = "CWU"
    assert p.handle("MD") == "MD3;"
    assert p.handle("MD1") == ""
    assert p.state.mode == "LSB"
    # filter bandwidth in tens of Hz
    p.state.passband = 2800
    assert p.handle("FW") == "FW0280;"
    assert p.handle("FW0050") == ""
    assert p.state.passband == 500
    # identity / firmware / misc fixed responses
    assert p.handle("ID") == "ID017;"
    assert p.handle("RV") == "RV99.99;"
    assert p.handle("OM") == "OM ------------;"
    assert p.handle("CW") == "CW60;"        # 600 Hz pitch / 10
    assert p.handle("AI") == "AI0;"
    assert p.handle("SB") == "SB0;"
    # K31 mode switches the S-meter format
    assert p.handle("SM") == "SM00;"
    p.handle("K31")
    assert p.handle("SM") == "SM0000;"
    # PTT + split + info
    p.handle("TX")
    assert p.state.ptt is True
    info = p.handle("IF")
    assert info.startswith("%011d" % 7_074_500) and info.endswith("001 ;")
    p.handle("RX")
    assert p.state.ptt is False
    p.handle("FT1")
    assert p.state.split is True
    # unknown command echoes 'XX?;'
    assert p.handle("QQ12") == "QQ?;"


def test_k4_server_over_tcp_shares_state():
    st = RadioState()
    st.freq = 7_000_000
    srv = K4Server(st, port=0)
    port = srv.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"ID;FA00014074000;FA;MD2;MD;")
        got = b""
        while b"MD" not in got or not got.endswith(b";"):
            got += s.recv(256)
        assert got == b"ID017;FA00014074000;MD2;"
        assert st.freq == 14_074_000
        assert st.mode == "USB"
        s.close()
    finally:
        srv.stop()


def test_wsjtx_command_builder(tmp_path):
    fake = tmp_path / "wsjtx"
    fake.write_text("#!/bin/sh\n")
    cmd = wsjtx_command({"path_to_wsjtx": str(fake),
                         "rig_name_wsjtx": "quisk_tpu",
                         "config_wsjtx": "ft8"})
    assert cmd == [str(fake), "--rig-name", "quisk_tpu", "--config", "ft8"]
    assert wsjtx_command({"path_to_wsjtx": str(tmp_path / "nope")}) is None


def test_radio_cat_surfaces_share_one_state():
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=10000.0, agc=True)
    radio = Radio(cfg, hardware="sim")
    radio.hw.tone_hz = 13000.0
    radio.open()
    try:
        cat = radio.enable_cat_serial(public_name="")
        port = radio.enable_k4(port=0)
        # K4 client retunes; the serial ZZ client then reads the same state
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        s.sendall(b"FA00000012000;MD1;")
        deadline = time.monotonic() + 10
        while ((radio.freq_hz != 12000.0 or radio.cfg.mode != "LSB")
               and time.monotonic() < deadline):
            time.sleep(0.01)
        assert radio.freq_hz == 12000.0
        assert radio.cfg.mode == "LSB"
        fd = os.open(cat.slave_name, os.O_RDWR | os.O_NOCTTY)
        os.write(fd, b"ZZFA;MD;")
        got = b""
        deadline = time.monotonic() + 10
        while got.count(b";") < 2 and time.monotonic() < deadline:
            radio.run_once()                 # pumps the serial port
            try:
                got += os.read(fd, 128)
            except BlockingIOError:
                time.sleep(0.01)
        assert got == b"ZZFA00000012000;MD1;"
        # serial sets the mode back; the chain follows
        os.write(fd, b"MD2;")
        deadline = time.monotonic() + 10
        while radio.cfg.mode != "USB" and time.monotonic() < deadline:
            radio.run_once()
        assert radio.cfg.mode == "USB"
        audio = radio.run(blocks=6)
        assert np.all(np.isfinite(audio))
        os.close(fd)
        s.close()
    finally:
        radio.close()


def test_radio_cat_ptt_volume_band_wiring():
    """CAT set-commands beyond freq/mode actually reach the radio: ZZTX
    latches PTT into transmit(), ZZAG moves the playback volume, ZZBS
    switches bands (quisk.py:6695 SetPTT / sliderVol / ChangeBand)."""
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=10000.0)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    try:
        p = FlexZZProtocol(state=radio._cat_state())
        # PTT on: latched for the next transmit() (no TX chain here,
        # so the hardware PTT line is keyed directly)
        p.handle("ZZTX1")
        assert radio.cat_ptt is True
        p.handle("ZZTX0")
        assert radio.cat_ptt is False
        # volume
        p.handle("ZZAG025")
        assert abs(radio.volume - 0.25) < 1e-9
        # band switch restores the band-memory rule (first visit: center)
        p.handle("ZZBS020")
        assert radio.band == "20"
        assert radio.cfg.mode == "USB"          # >9 MHz default
        assert radio.vfo_hz > 9_000_000
    finally:
        radio.close()


def test_radio_vfo_recenter_keeps_subrx_absolute():
    """When a CAT tune recenters the VFO, sub-receivers keep their
    ABSOLUTE frequency (their offsets are VFO-relative); one that no
    longer fits the passband is clamped and counted."""
    cfg = RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                      tune_hz=0.0, channels=3)
    radio = Radio(cfg, hardware="sim")
    radio.open()
    try:
        radio.set_frequency(7_050_000)          # recenters VFO to 7.05 M
        radio.set_sub_rx(1, freq_hz=7_060_000.0, mode="AM")
        radio.set_sub_rx(2, freq_hz=7_070_000.0, mode="USB")
        radio.set_frequency(7_080_000)          # 30 k offset > 21.6 k
        assert radio.vfo_hz == 7_080_000.0
        # sub-RX 1 still points at 7.060 MHz in absolute terms
        assert radio.vfo_hz + radio.offsets[1] == 7_060_000.0
        # sub-RX 2 (7.070 M): within half-rate, also preserved
        assert radio.vfo_hz + radio.offsets[2] == 7_070_000.0
        # push far enough that a sub-RX falls outside the passband
        radio.set_frequency(7_150_000)
        assert radio.vfo_hz == 7_150_000.0
        assert abs(radio.offsets[1]) <= 0.5 * cfg.sample_rate
        assert radio.status.snapshot().get("subrx_out_of_band", 0) >= 1
    finally:
        radio.close()
