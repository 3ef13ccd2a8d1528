"""Tests: hardware plugin API/registry, HiQSDR + Hermes control planes,
VNA scan + calibration."""

import struct

import numpy as np
import pytest

from quisk_tpu.app.vna import (OnePortCal, ScanConfig, VNA, impedance_to_s11,
                               normalize_raw, s11_to_impedance,
                               split_scan_blocks, swr)
from quisk_tpu.hw import (FileHardware, HermesControl, HermesHardware,
                          HiqsdrControl, HiqsdrHardware, SimHardware,
                          get_hardware)
from quisk_tpu.hw.hiqsdr import decimation_for_rate, tune_phase


class LoopTransport:
    """Test transport: records sends, echoes the last control packet."""

    def __init__(self, reply=None):
        self.sent = []
        self.reply = reply

    def sendto(self, pkt):
        self.sent.append(pkt)

    def poll_ctl(self):
        if self.reply is not None:
            return self.reply
        return self.sent[-1] if self.sent else None


# ------------------------------------------------------------- registry
def test_registry_and_sim_hardware():
    cls = get_hardware("sim")
    hw = cls(sample_rate=48000.0, tone_hz=5000.0, noise=0.0)
    hw.open()
    x = hw.read_samples(4800)
    assert x.shape == (1, 4800) and x.dtype == np.complex64
    # tone frequency correct, phase continuous across reads
    y = hw.read_samples(4800)
    both = np.concatenate([x[0], y[0]])
    ph = np.unwrap(np.angle(both))
    f = np.diff(ph) * 48000.0 / (2 * np.pi)
    # per-sample instantaneous frequency jitters a few Hz from complex64
    # quantisation; the mean must be exact and no phase jump at the join
    assert abs(np.mean(f) - 5000.0) < 0.1
    assert np.max(np.abs(f - 5000.0)) < 10.0
    with pytest.raises(KeyError):
        get_hardware("no-such-radio")


# ------------------------------------------------------------- hiqsdr
def test_hiqsdr_packet_layout():
    ctl = HiqsdrControl()
    ctl.rx_freq = 7_020_000.0
    ctl.tx_freq = 7_020_000.0
    ctl.tx_level = 200
    pkt = ctl.packet()
    assert len(pkt) == 22
    assert pkt[:2] == b"St"
    rx_phase = struct.unpack_from("<I", pkt, 2)[0]
    assert rx_phase == tune_phase(7_020_000.0)
    # phase word round-trips to the frequency within DDS resolution
    back = rx_phase / (1 << 32) * 122_880_000
    assert abs(back - 7_020_000.0) < 0.05
    assert pkt[10] == 200


def test_hiqsdr_rate_decimation():
    assert decimation_for_rate(192000.0) == (0b10, 16)   # 122.88M/(40*16)
    assert decimation_for_rate(960000.0) == (0b00, 16)   # 122.88M/(8*16)
    assert decimation_for_rate(96000.0) == (0b10, 32)
    with pytest.raises(ValueError):
        decimation_for_rate(100.0)


def test_hiqsdr_hardware_ack_cycle():
    tr = LoopTransport()
    hw = HiqsdrHardware(transport=tr)
    hw.open()
    assert len(tr.sent) == 1
    hw.HeartBeat()                      # sees echo -> acked, no resend
    assert hw.acked
    n = len(tr.sent)
    hw.HeartBeat()
    assert len(tr.sent) == n            # no resend after ack
    hw.ChangeFrequency(7_100_000, 7_050_000)
    assert not hw.acked                 # new packet needs a new ack
    assert struct.unpack_from("<I", tr.sent[-1], 2)[0] == tune_phase(7_050_000)


def test_hiqsdr_vna_setup():
    hw = HiqsdrHardware(transport=LoopTransport())
    lo, hi = hw.SetVNA(vna_start=1e6, vna_stop=11e6, vna_count=101)
    assert lo == 1e6 and abs(hi - 11e6) < 1.0
    assert hw.ctl.vna_count == 101


# ------------------------------------------------------------- hermes
def test_hermes_register_block():
    ctl = HermesControl()
    ctl.set_rate(192000)
    ctl.set_n_receivers(4)
    ctl.set_tx_freq(14_100_000)
    ctl.set_rx_freq(0, 14_050_000)
    ctl.set_tx_level(63)
    g0 = ctl.ctl_group(0)
    assert g0[0] == 0                       # C0 row 0, MOX off
    assert g0[1] & 0x03 == 2                # 192k
    assert (g0[4] >> 3) & 0x7 == 3          # 4 receivers -> field 3
    g1 = ctl.ctl_group(1, mox=True)
    assert g1[0] == (1 << 1) | 1
    assert int.from_bytes(g1[1:5], "big") == 14_100_000
    g2 = ctl.ctl_group(2)
    assert int.from_bytes(g2[1:5], "big") == 14_050_000


def test_hermes_control_byte_bit_api():
    ctl = HermesControl()
    ctl.set_byte(9, 1, 0x55)
    assert ctl.get_byte(9, 1) == 0x55
    ctl.set_bit(0, 2, True)      # bit 2 of the 32-bit C1..C4 word -> C4
    assert ctl.get_byte(0, 4) & 0x04


def test_hermes_discovery_and_start():
    d = HermesControl.discovery_packet()
    assert d[:3] == b"\xEF\xFE\x02" and len(d) == 63
    reply = b"\xEF\xFE\x02" + bytes.fromhex("aabbccddeeff") + bytes([28, 6])
    info = HermesControl.parse_discovery_reply(reply)
    assert info == {"mac": "aa:bb:cc:dd:ee:ff", "version": 28, "board": 6}
    assert HermesControl.start_packet()[3] == 1
    assert HermesControl.stop_packet()[3] == 0
    # round-robin covers all 17 rows
    hw = HermesHardware(transport=LoopTransport())
    rows = {hw.next_ctl_group()[0] >> 1 for _ in range(17)}
    assert rows == set(range(17))


# ---------------------------------------------------------------- VNA
def _synthetic_vna_measurement(gamma, e00=0.05 + 0.02j, e11=0.1 - 0.05j,
                               dt=0.9 * np.exp(0.3j)):
    return e00 + dt * gamma / (1.0 - e11 * gamma)


def test_scan_block_splitting():
    scan = (np.arange(1, 11) + 1j).astype(np.complex128)
    stream = np.concatenate([[0], scan, [0], scan * 2, [0]])
    blocks = split_scan_blocks(stream, 10)
    assert len(blocks) == 2
    assert np.allclose(blocks[1], scan * 2)
    # normalisation scale
    assert np.allclose(normalize_raw(np.array([2147483647])), [1.0])


def test_one_port_cal_recovers_dut():
    cfg = ScanConfig(1e6, 30e6, 51)
    f = cfg.freqs()
    # DUT: 50-ohm resistor in series with 100 pF
    z = 50.0 + 1.0 / (2j * np.pi * f * 100e-12)
    gamma_true = impedance_to_s11(z)
    m_open = _synthetic_vna_measurement(np.ones_like(gamma_true))
    m_short = _synthetic_vna_measurement(-np.ones_like(gamma_true))
    m_load = _synthetic_vna_measurement(np.zeros_like(gamma_true))
    m_dut = _synthetic_vna_measurement(gamma_true)

    vna = VNA(hardware=None, config=cfg)
    vna.store_standard("open", m_open)
    vna.store_standard("short", m_short)
    vna.store_standard("load", m_load)
    vna.finish_calibration()
    rep = vna.report(m_dut)
    assert np.max(np.abs(rep["s11"] - gamma_true)) < 1e-9
    assert np.max(np.abs(rep["impedance"] - z)) < 1e-6
    assert np.all(rep["swr"] >= 1.0)


def test_vna_with_hiqsdr_hardware_roundtrip():
    cfg = ScanConfig(1e6, 11e6, 11)
    hw = HiqsdrHardware(transport=LoopTransport())
    vna = VNA(hw, cfg)
    vna.setup()
    assert hw.ctl.vna_count == 11
    # hardware inserts zero markers between scans of correlator counts
    pts = (np.linspace(0.1, 1.0, 11) * 2147483647 * (0.5 + 0.5j)).astype(np.complex128)
    stream = np.concatenate([[0], pts, [0]])
    scan = vna.read_scan(stream)
    assert scan is not None and len(scan) == 11
    assert abs(scan[-1] - (0.5 + 0.5j)) < 1e-9
