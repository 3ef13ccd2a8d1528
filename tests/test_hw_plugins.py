"""Hardware plugin breadth: SDR-Micron, Multus, FiFi-SDR, SDR8600,
Hamlib, HL2 out-of-band guard (references sdrmicronpkg/quisk_hardware.py,
multuspkg/quisk_hardware.py, quisk_hardware_fifisdr.py,
quisk_hardware_sdr8600.py, quisk_hardware_hamlib.py,
quisk_hardware_hl2_oob.py)."""

import numpy as np
import pytest

from quisk_tpu.hw import get_hardware
from quisk_tpu.hw import sdrmicron as sm
from quisk_tpu.hw.fifisdr import (EXTRA_WRITE_PREAMP, GET_FIFI_EXTRA,
                                  SET_FIFI_EXTRA, FifiSdrHardware)
from quisk_tpu.hw.hamlib_hw import HamlibHardware, to_hamlib_mode
from quisk_tpu.hw.hl2_oob import (HermesLite2OOBHardware, mode_band_edges)
from quisk_tpu.hw.multus import (ADDR_CW_MODE, ADDR_PTT_POLL, ADDR_SPEED,
                                 ADDR_TONE, MultusHardware, tone_index)
from quisk_tpu.hw.sdr8600 import Sdr8600Hardware, round_vfo


class Sink:
    def __init__(self):
        self.msgs = []

    def write(self, b):
        self.msgs.append(bytes(b))


# ------------------------------------------------------------- sdrmicron
def test_micron_rx_control_wire_format():
    msg = sm.build_rx_control(True, 3, 7_220_000, 10)
    assert len(msg) == 32
    assert msg[:8] == b"\x55" * 7 + b"\xd5"
    assert msg[8:11] == b"RX0"
    assert msg[11] == 1 and msg[12] == 3
    # frequency MSB first
    f = (msg[13] << 24) | (msg[14] << 16) | (msg[15] << 8) | msg[16]
    assert f == 7_220_000
    assert msg[17] == 10
    assert msg[18:] == bytes(14)


def test_micron_bscope_control():
    msg = sm.build_bscope_control(True, 100)
    assert len(msg) == 32 and msg[8:11] == b"BS0"
    assert msg[11] == 1 and msg[12] == 100
    with pytest.raises(ValueError):
        sm.build_bscope_control(True, 10)


def test_micron_iq24_roundtrip():
    rng = np.random.default_rng(5)
    iq = (rng.uniform(-0.9, 0.9, 82)
          + 1j * rng.uniform(-0.9, 0.9, 82)).astype(np.complex64)
    frame = sm.pack_rx_frame(iq)
    fr = sm.MicronFramer()
    fr.feed(frame)
    got = fr.take_samples()
    assert len(got) == 82
    np.testing.assert_allclose(got, iq, atol=2.0 / (1 << 23))
    assert fr.fw_version == "1.0"


def test_micron_iq16_wide_and_resync():
    rng = np.random.default_rng(6)
    iq = (rng.uniform(-0.9, 0.9, 123)
          + 1j * rng.uniform(-0.9, 0.9, 123)).astype(np.complex64)
    frame = sm.pack_rx_frame(iq, wide=True)
    fr = sm.MicronFramer(wide=True)
    fr.feed(b"\x01\x02junk" + frame)       # garbage before the preamble
    got = fr.take_samples()
    assert len(got) == 123
    np.testing.assert_allclose(got, iq, atol=2.0 / 32768.0)
    assert fr.resync_count == 1


def test_micron_bscope_assembly():
    adc = np.round(np.sin(np.arange(16384) * 0.01) * 20000).astype(">i2")
    raw = adc.tobytes()
    fr = sm.MicronFramer()
    pre = sm.PREAMBLE + b"BS0" + bytes((ord("1"), ord("0"), 0))
    for pn in range(67):
        if pn < 66:
            chunk = raw[pn * 492:(pn + 1) * 492]
        else:
            chunk = raw[66 * 492:].ljust(492, b"\0")
        fr.feed(pre + bytes((pn, 0)) + chunk)
    out = fr.take_bscope()
    assert out is not None and len(out) == 16384
    np.testing.assert_allclose(out * 32768.0, adc.astype(np.float32),
                               atol=0.5)


def test_micron_hardware_control_flow():
    sink = Sink()
    hw = get_hardware("sdrmicron")(transport=sink)
    hw.open()
    hw.StartSamples()
    assert len(sink.msgs) == 2             # RX0 enable + BS0 enable
    assert sink.msgs[0][11] == 1
    hw.ChangeFrequency(14_200_000, 14_200_000)
    assert sink.msgs[-1][8:11] == b"RX0"
    rate = hw.VarDecimSet(8)               # 960 k -> wide mode
    assert rate == 960000.0 and hw.framer.wide
    hw.ChangeBand("40")
    assert hw.att == 10
    hw.ChangeBand("20")
    assert hw.att == 0


# --------------------------------------------------------------- multus
class CtrlRecorder:
    def __init__(self, in_replies=None):
        self.out = []
        self.in_replies = in_replies or {}

    def transfer_out(self, addr, data):
        self.out.append((addr, bytes(data)))

    def transfer_in(self, addr, n):
        return self.in_replies.get(addr, b"")


def test_multus_keyer_init_and_mode():
    ctrl = CtrlRecorder()
    hw = MultusHardware(ctrl=ctrl, keyer_speed=25, cw_tone=750.0)
    hw.open()
    sent = dict(ctrl.out)
    assert sent[ADDR_SPEED] == bytes([25])
    assert sent[ADDR_TONE] == bytes([2])   # 750 Hz -> 800 Hz bin
    ctrl.out.clear()
    hw.ChangeMode("CWU")
    assert ctrl.out[-1] == (ADDR_CW_MODE, b"C")
    hw.ChangeMode("USB")
    assert ctrl.out[-1] == (ADDR_CW_MODE, b"U")
    assert [tone_index(f) for f in (400, 600, 800, 1000)] == [0, 1, 2, 3]


def test_multus_ptt_poll_edge():
    ctrl = CtrlRecorder(in_replies={ADDR_PTT_POLL: b"\x01"})
    hw = MultusHardware(ctrl=ctrl)
    assert hw.poll_ptt() == 1              # 0 -> 1 edge reported
    assert hw.poll_ptt() is None           # unchanged
    ctrl.in_replies[ADDR_PTT_POLL] = b"\xff"
    assert hw.poll_ptt() is None           # 255 = error, ignored


# -------------------------------------------------------------- fifisdr
def test_fifi_open_reads_versions_and_preamp():
    class FifiCtrl(CtrlRecorder):
        def transfer_in(self, request, index, n):
            if (request, index) == (GET_FIFI_EXTRA, 0):
                return (12345).to_bytes(4, "little")
            if (request, index) == (GET_FIFI_EXTRA, 1):
                return b"fifisdr-2.0\x00junk".ljust(20, b"\0")
            return b""

        def transfer_out(self, request, index, data):
            self.out.append((request, index, bytes(data)))

    ctrl = FifiCtrl()
    hw = FifiSdrHardware(ctrl=ctrl)
    text = hw.open()
    assert hw.svn_version == 12345
    assert hw.fw_version == "fifisdr-2.0"
    assert "12345" in text
    hw.set_preamp(0)
    assert ctrl.out[-1] == (SET_FIFI_EXTRA, EXTRA_WRITE_PREAMP, b"\x00")
    with pytest.raises(ValueError):
        hw.set_preamp(3)


# --------------------------------------------------------------- sdr8600
class FakeSerial:
    def __init__(self):
        self.writes = []

    def write(self, b):
        self.writes.append(bytes(b))

    def read(self, n):
        return b""


def test_sdr8600_pacing_and_rounding():
    assert round_vfo(123_456_789) == 123_460_000
    t = [0.0]
    ser = FakeSerial()
    hw = Sdr8600Hardware(serial=ser, clock=lambda: t[0])
    t[0] = 1.0
    hw.open()
    assert ser.writes[0] == b"MD0\r"       # WFM mode on open
    assert hw.invert_spectrum
    # two rapid tunes: second must be queued, not sent
    t[0] = 1.05
    hw.ChangeFrequency(145_000_000, 145_000_000)
    hw.ChangeFrequency(145_010_000, 145_012_345)
    assert ser.writes[-1] == b"RF0145000000\r"
    assert len(hw._pending) == 1
    t[0] += 0.05
    hw.HeartBeat()                         # queue drains after 20 ms
    assert ser.writes[-1] == b"RF0145010000\r"
    assert not hw._pending
    # below 100 kHz: ignored (reference guard)
    n = len(ser.writes)
    hw.ChangeFrequency(50_000, 50_000)
    assert len(ser.writes) == n


# ---------------------------------------------------------------- hamlib
class FakeSock:
    def __init__(self):
        self.sent = []
        self.rx = b""

    def sendall(self, b):
        self.sent.append(b.decode())

    def recv(self, n):
        out, self.rx = self.rx, b""
        if not out:
            raise OSError("empty")
        return out

    def close(self):
        pass


def test_hamlib_mode_mapping():
    assert to_hamlib_mode("CWL") == "CW"
    assert to_hamlib_mode("DGT-U") == "USB"
    assert to_hamlib_mode("LSB") == "LSB"


def test_hamlib_poll_state_machine():
    t = [0.0]
    sock = FakeSock()
    hw = HamlibHardware(sock=sock, clock=lambda: t[0])
    hw.open()
    hw.ChangeFrequency(7_074_000, 7_074_000)
    t[0] = 1.0
    hw.HeartBeat()                         # mode differs first
    assert sock.sent[-1] == "|M USB 0\n"
    sock.rx = b"set_mode: USB 0|RPRT 0\n"
    t[0] = 2.0
    hw.HeartBeat()                         # then frequency
    assert sock.sent[-1] == "|F 7074000\n"
    sock.rx = b"set_freq: 7074000|RPRT 0\n"
    t[0] = 3.0
    hw.HeartBeat()                         # now in sync -> poll
    assert sock.sent[-1] in ("|f\n", "|m\n")
    # radio-side manual tune flows back
    sock.rx = b"get_freq:|Frequency: 7080000|RPRT 0\n"
    hw.read_hamlib()
    assert hw.quisk_freq == 7_080_000
    # radio-side mode change is surfaced for the app
    hw.radio_mode = hw.quisk_mode
    sock.rx = b"get_mode:|Mode: CW|Passband: 500|RPRT 0\n"
    hw.read_hamlib()
    assert hw.mode_from_radio == "CWU"
    # bad replies are ignored
    sock.rx = b"get_freq:|Frequency: junk|RPRT 0\nnope RPRT -1\n"
    hw.read_hamlib()
    assert hw.quisk_freq == 7_080_000


# ---------------------------------------------------------------- hl2 oob
def test_hl2_band_edges_per_mode():
    assert mode_band_edges("40", "CWU") == (7_000_040, 7_299_960)
    assert mode_band_edges("40", "USB") == (7_000_000, 7_297_000)
    assert mode_band_edges("40", "LSB") == (7_003_000, 7_300_000)
    assert mode_band_edges("2", "FM") == (144_008_000, 147_992_000)
    assert mode_band_edges("Audio", "USB") == (0, 0)


def test_hl2_pa_gating():
    hw = HermesLite2OOBHardware()
    hw.ChangeBand("40")
    hw.ChangeMode("LSB")
    hw.ChangeFrequency(7_100_000, 7_100_000)
    hw.HeartBeat()
    assert hw.pa_enabled()                 # in band -> PA on
    hw.ChangeFrequency(7_001_000, 7_001_000)   # LSB sideband out of band
    hw.HeartBeat()
    assert not hw.pa_enabled()
    hw.ChangeFrequency(7_200_000, 7_200_000)
    hw.HeartBeat()
    assert hw.pa_enabled()
    hw.power_amp_wanted = False            # user disabled PA entirely
    hw.HeartBeat()
    assert not hw.pa_enabled()


def test_micron_read_samples_exact_block():
    """read_samples honours its ``n`` contract (Radio.run_once feeds a
    fixed-shape jitted step): frames accumulate until n are ready, the
    remainder stays buffered."""
    sink = Sink()
    hw = get_hardware("sdrmicron")(transport=sink)
    rng = np.random.default_rng(7)
    iq = (rng.uniform(-0.9, 0.9, 82)
          + 1j * rng.uniform(-0.9, 0.9, 82)).astype(np.complex64)
    hw.feed(sm.pack_rx_frame(iq))
    assert hw.read_samples(100) is None          # one 82-sample frame < 100
    hw.feed(sm.pack_rx_frame(iq))
    blk = hw.read_samples(100)
    assert blk is not None and blk.shape == (1, 100)
    np.testing.assert_allclose(blk[0, :82], iq, atol=2.0 / (1 << 23))
    blk2 = hw.read_samples(64)                   # 164 - 100 = 64 buffered
    assert blk2 is not None and blk2.shape == (1, 64)
    np.testing.assert_allclose(blk2[0, -46:], iq[-46:], atol=2.0 / (1 << 23))
    assert hw.read_samples(1) is None
