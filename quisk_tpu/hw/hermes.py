"""Hermes / Metis (OpenHPSDR protocol 1) control plane.

Parity: hermes/quisk_hardware.py and the C-side register block
(quisk.c:299 ``pc_to_hermes``, sample reader quisk.c:3519).  Control is
carried inside the TX sample stream: every 512-byte USB-style frame has a
5-byte control group C0..C4; C0 bits 7:1 select one of 17 register rows
sent round-robin.  Discovery and start/stop are dedicated UDP packets:

  discovery:  0xEF 0xFE 0x02 + 60 zero bytes (broadcast)
  reply:      0xEF 0xFE 0x02/0x03 + MAC + firmware version + board id
  start/stop: 0xEF 0xFE 0x04 + flags (0x01 IQ, 0x02 bandscope) + 60 zeros

Register rows used here (C0 index -> C1..C4 meaning, MSB first):
  0:  C1[1:0] sample rate (00=48k 01=96k 10=192k 11=384k),
      C3 preamp/dither/random + antenna bits, C4[5:3] n_receivers-1,
      C4[2] duplex
  1:  Tx NCO frequency, Hz
  2:  Rx1 NCO frequency (3..8: Rx2..Rx7)
  9:  C1 Tx drive level
  10: C4[4:0] Rx LNA/attenuator setting
"""

from __future__ import annotations

import struct

import numpy as np

from quisk_tpu.hw.base import Hardware, register_hardware

N_CTL_ROWS = 17


class HermesControl:
    """The 17x4 register block + framing of discovery/start/stop packets."""

    RATES = {48000: 0, 96000: 1, 192000: 2, 384000: 3}

    def __init__(self):
        self.regs = np.zeros((N_CTL_ROWS, 4), np.uint8)
        self.n_rx = 1
        self.duplex = True
        self._sync_row0()

    # ---- row helpers ----------------------------------------------------
    def _sync_row0(self) -> None:
        self.regs[0, 3] = ((self.n_rx - 1) & 0x7) << 3 | (0x4 if self.duplex else 0)

    def set_rate(self, rate: int) -> None:
        self.regs[0, 0] = (int(self.regs[0, 0]) & 0xFC) | self.RATES[int(rate)]

    def set_n_receivers(self, n: int) -> None:
        if not 1 <= n <= 8:
            raise ValueError("1..8 receivers")
        self.n_rx = n
        self._sync_row0()

    def _set_freq(self, row: int, freq_hz: float) -> None:
        f = int(round(freq_hz)) & 0xFFFFFFFF
        self.regs[row] = [(f >> 24) & 0xFF, (f >> 16) & 0xFF,
                          (f >> 8) & 0xFF, f & 0xFF]

    def set_tx_freq(self, freq_hz: float) -> None:
        self._set_freq(1, freq_hz)

    def set_rx_freq(self, rx: int, freq_hz: float) -> None:
        """rx = 0-based receiver index (row 2 is Rx1)."""
        self._set_freq(2 + rx, freq_hz)

    def set_tx_level(self, level: int) -> None:
        self.regs[9, 0] = level & 0xFF

    def set_rx_gain(self, db: int) -> None:
        self.regs[10, 3] = db & 0x1F

    # ---- control-byte access (parity Get/SetControlByte/Bit) ------------
    def get_byte(self, c0_index: int, byte_index: int) -> int:
        """byte_index 1..4 selects C1..C4 (matches the reference API)."""
        return int(self.regs[c0_index, byte_index - 1])

    def set_byte(self, c0_index: int, byte_index: int, value: int) -> None:
        self.regs[c0_index, byte_index - 1] = value & 0xFF

    def set_bit(self, c0_index: int, bit: int, value: bool) -> None:
        byte_index = 4 - bit // 8
        mask = 1 << (bit % 8)
        v = self.get_byte(c0_index, byte_index)
        self.set_byte(c0_index, byte_index,
                      (v | mask) if value else (v & ~mask))

    # ---- round-robin control groups ------------------------------------
    def ctl_group(self, row: int, mox: bool = False) -> bytes:
        """C0..C4 for one 512-byte frame: C0 = row<<1 | MOX."""
        c0 = ((row & 0x7F) << 1) | (1 if mox else 0)
        return bytes([c0]) + self.regs[row].tobytes()

    def ctl_sequence(self, n: int, start_row: int = 0,
                     mox: bool = False) -> list[bytes]:
        return [self.ctl_group((start_row + i) % N_CTL_ROWS, mox)
                for i in range(n)]

    # ---- dedicated UDP packets -----------------------------------------
    @staticmethod
    def discovery_packet() -> bytes:
        return b"\xEF\xFE\x02" + b"\x00" * 60

    @staticmethod
    def parse_discovery_reply(pkt: bytes):
        """-> dict(mac, version, board) or None."""
        if len(pkt) < 11 or pkt[:2] != b"\xEF\xFE" or pkt[2] not in (2, 3):
            return None
        return {"mac": pkt[3:9].hex(":"), "version": pkt[9], "board": pkt[10]}

    @staticmethod
    def start_packet(iq: bool = True, bandscope: bool = False) -> bytes:
        flags = (0x01 if iq else 0) | (0x02 if bandscope else 0)
        return b"\xEF\xFE\x04" + bytes([flags]) + b"\x00" * 60

    @staticmethod
    def stop_packet() -> bytes:
        return b"\xEF\xFE\x04\x00" + b"\x00" * 60


@register_hardware("hermes")
class HermesHardware(Hardware):
    """Hermes radio: discovery, start/stop, register round-robin.  The
    sample plane (1032-byte frames, interleaved per-receiver 24-bit I/Q)
    is quisk_tpu.io.native.MetisStream / qt_metis_parse."""

    def __init__(self, conf=None, transport=None):
        super().__init__(conf)
        self.ctl = HermesControl()
        self.transport = transport
        self.board = None
        self._row = 0
        self.pump = None

    # ---- live sample plane (quisk.c:3519 read_rx_udp10 equivalent) -------
    def start_pump(self, port: int = 0, host: str = "127.0.0.1"):
        """Bind the live UDP sample pump; returns (host, port) the radio
        (or a test sender) should stream 1032-byte Metis frames to."""
        from quisk_tpu.io.pump import make_pump

        # native C++ pump (recvmmsg + parse + ring) when built; Python
        # UdpPump fallback otherwise
        self.pump = make_pump("metis", n_rx=self.ctl.n_rx, port=port,
                              host=host)
        self.pump.start()
        return self.pump.local_addr

    def read_samples(self, n: int):
        if self.pump is None:
            return None
        return self.pump.read_samples(n)

    def close(self) -> None:
        if self.pump is not None:
            self.pump.stop()
            self.pump = None

    def open(self) -> str:
        if self.transport is not None:
            self.transport.sendto(self.ctl.discovery_packet())
            reply = self.transport.poll_ctl()
            if reply is not None:
                self.board = HermesControl.parse_discovery_reply(reply)
        self.status_text = f"Hermes {self.board}" if self.board else "Hermes (no reply)"
        return self.status_text

    def StartSamples(self) -> None:
        if self.transport is not None:
            self.transport.sendto(self.ctl.start_packet())

    def StopSamples(self) -> None:
        if self.transport is not None:
            self.transport.sendto(self.ctl.stop_packet())

    def next_ctl_group(self, mox: bool = False) -> bytes:
        g = self.ctl.ctl_group(self._row, mox)
        self._row = (self._row + 1) % N_CTL_ROWS
        return g

    def ChangeFrequency(self, tx_freq, vfo_freq, source="", band=""):
        self.ctl.set_tx_freq(tx_freq)
        self.ctl.set_rx_freq(0, vfo_freq)
        return super().ChangeFrequency(tx_freq, vfo_freq, source, band)

    def VarDecimGetChoices(self) -> list[int]:
        return sorted(HermesControl.RATES)

    def VarDecimSet(self, index: int) -> float:
        rate = self.VarDecimGetChoices()[index]
        self.ctl.set_rate(rate)
        return float(rate)
