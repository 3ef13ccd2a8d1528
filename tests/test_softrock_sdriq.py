"""Tests: Si570 register math and SDR-IQ serial framing."""

import struct

import numpy as np
import pytest

from quisk_tpu.hw.base import get_hardware
from quisk_tpu.hw.sdriq import (SdriqFramer, TYPE_DATA0, build_control,
                                build_message, set_frequency, set_state)
from quisk_tpu.hw.softrock import (DCO_MAX, DCO_MIN, si570_decode,
                                   si570_divider_plan, si570_registers)


# ---------------------------------------------------------------- Si570
def test_si570_divider_plan_in_range():
    for f in (7.05e6 * 4, 14.1e6 * 4, 28.5e6 * 4, 50e6 * 4, 1.8e6 * 4):
        hs, n1 = si570_divider_plan(f)
        assert hs in (4, 5, 6, 7, 9, 11)
        assert n1 == 1 or n1 % 2 == 0
        assert DCO_MIN <= f * hs * n1 <= DCO_MAX


def test_si570_registers_roundtrip():
    for f in (28.2e6, 56.4e6, 114e6, 14.080e6 * 4):
        regs = si570_registers(f)
        assert len(regs) == 6
        back = si570_decode(regs)
        # 38-bit RFREQ resolution is sub-Hz at these frequencies
        assert abs(back - f) < 1.0, (f, back)


def test_si570_unreachable_raises():
    with pytest.raises(ValueError):
        si570_divider_plan(1e3)          # DCO can't reach range


def test_softrock_hardware_writes_registers():
    writes = []

    class T:
        def write_registers(self, regs):
            writes.append(regs)

    hw = get_hardware("softrock")(transport=T())
    hw.open()
    hw.ChangeFrequency(7_050_000, 7_050_000)
    assert len(writes) == 1
    assert abs(si570_decode(writes[0]) - 4 * 7_050_000) < 1.0


# --------------------------------------------------------------- SDR-IQ
def test_sdriq_message_framing():
    msg = set_frequency(7_050_000)
    hdr = struct.unpack_from("<H", msg)[0]
    assert hdr >> 13 == 0                       # set-control type
    assert (hdr & 0x1FFF) == len(msg)
    item = struct.unpack_from("<H", msg, 2)[0]
    assert item == 0x0020
    assert struct.unpack_from("<I", msg, 5)[0] == 7_050_000
    run = set_state(True)
    assert run[5] == 0x02                       # run code after channel byte


def test_sdriq_framer_parses_data_and_responses():
    fr = SdriqFramer()
    # a control response
    resp = build_message(3, struct.pack("<H", 0x0018) + b"\x81\x02")
    # a full data block: 2048 complex samples of 16-bit I/Q
    iq = (np.arange(4096, dtype=np.int16) - 2048)
    data = struct.pack("<H", 0 | (TYPE_DATA0 << 13)) + iq.tobytes()
    stream = resp + data
    # feed in awkward chunk sizes (serial reality)
    for i in range(0, len(stream), 777):
        fr.feed(stream[i:i + 777])
    assert fr.responses == [(0x0018, b"\x81\x02")]
    s = fr.take_samples()
    assert s.shape == (2048,) and s.dtype == np.complex64
    assert np.isclose(s[0].real, -2048 / 32768.0)
    assert np.isclose(s[0].imag, -2047 / 32768.0)
    assert len(fr.take_samples()) == 0


def test_sdriq_hardware_control_flow():
    writes = []

    class T:
        def write(self, b):
            writes.append(bytes(b))

    hw = get_hardware("sdriq")(transport=T())
    hw.open()
    hw.StartSamples()
    hw.ChangeFrequency(14_100_000, 14_050_000)
    hw.StopSamples()
    assert len(writes) == 4
    assert struct.unpack_from("<I", writes[2], 5)[0] == 14_050_000
    rate = hw.VarDecimSet(2)
    assert rate == 37793.0
