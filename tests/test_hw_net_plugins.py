"""AFEDRI / Perseus / SoapySDR hardware plugins (references
afedrinet/afedri.py + afedrinet_io.c, perseuspkg/quisk_hardware.py,
soapypkg/quisk_hardware.py)."""

import numpy as np
import pytest

from quisk_tpu.hw import get_hardware
from quisk_tpu.hw import afedri as af
from quisk_tpu.hw.perseus import ATTEN_DB, PerseusHardware
from quisk_tpu.hw.soapy import SoapyHardware


class Sink:
    def __init__(self):
        self.msgs = []

    def write(self, b):
        self.msgs.append(bytes(b))


# ---------------------------------------------------------------- afedri
def test_afedri_control_wire_format():
    # exact byte strings the reference sends (afedri.py:60-140)
    assert af.set_center_freq(14_100_000) == (
        b"\x0a\x00\x20\x00\x00" + (14_100_000).to_bytes(5, "little"))
    assert af.set_sample_rate(192_000) == (
        b"\x09\x00\xb8\x00\x00" + (192_000).to_bytes(4, "little"))
    assert af.set_state(True) == b"\x08\x00\x18\x00\x80\x02\x00\x00"
    assert af.set_state(False) == b"\x08\x00\x18\x00\x00\x01\x00\x00"
    assert af.request_name() == b"\x04\x20\x01\x00"
    assert af.request_fe_clock_word(0) == b"\x09\xe0\x02\x55\x00\x00\x00\x00\x00"
    assert af.request_fe_clock_word(1) == b"\x09\xe0\x02\x55\x01\x00\x00\x00\x00"


def test_afedri_gain_byte_roundtrip():
    for g in range(-10, 36, 3):
        assert af.decode_gain(af.encode_gain(g)) == g
    assert af.set_gain(-10) == b"\x06\x00\x38\x00\x00\x01"


def test_afedri_fe_clock_parse_and_rate_snap():
    clock = 80_000_000
    lo = b"\x09\xe0\x02\x55" + (clock & 0xFFFF).to_bytes(2, "little") + b"\x00\x00\x00"
    hi = b"\x09\xe0\x02\x55" + (clock >> 16).to_bytes(2, "little") + b"\x00\x00\x00"
    assert af.parse_fe_clock(lo, hi) == clock
    # divider clamped to [15, 625] (afedri.py:199-216)
    assert af.valid_sample_rate(2_000_000, clock) == round(clock / (4 * 15))
    assert af.valid_sample_rate(1_000, clock) == round(clock / (4 * 625))
    # 192 kHz snaps to div 104 -> 192307-ish (the nearest achievable rate)
    div = round(clock / (4 * 192_000))
    assert af.valid_sample_rate(192_000, clock) == round(clock / (4 * div))


def test_afedri_discovery_roundtrip():
    assert af.build_discovery()[:4] == b"\x38\x00\x5a\xa5"
    assert len(af.build_discovery()) == 56
    reply = bytearray(56)
    reply[5:5 + 6] = b"AFEDRI"
    reply[21:21 + 4] = b"SN42"
    reply[37:41] = bytes([10, 0, 0, 7])[::-1]      # ip stored reversed
    reply[53:55] = (50000).to_bytes(2, "little")
    name, sn, ip, port = af.parse_discovery_reply(bytes(reply))
    assert (name, sn, ip, port) == ("AFEDRI", "SN42", "10.0.0.7", 50000)


def test_afedri_udp_roundtrip_and_sequence():
    rng = np.random.default_rng(7)
    hw = get_hardware("afedri")(transport=Sink())
    blocks = []
    for seq in range(3):
        iq = (rng.uniform(-0.5, 0.5, 256)
              + 1j * rng.uniform(-0.5, 0.5, 256)).astype(np.complex64)
        pkt = af.build_udp_packet(seq, iq)
        assert len(pkt) == af.RX_UDP_SIZE
        hw.feed_udp(pkt)
        blocks.append(iq)
    got = hw.read_samples(768)
    assert got.shape == (1, 768) and hw.seq_errors == 0
    np.testing.assert_allclose(got[0], np.concatenate(blocks), atol=1.5 / 32768)
    # a dropped packet increments the counter, then the stream resyncs
    hw.feed_udp(af.build_udp_packet(9, blocks[0]))
    hw.feed_udp(af.build_udp_packet(10, blocks[0]))
    assert hw.seq_errors == 1


def test_afedri_hardware_control_flow():
    t = Sink()
    hw = get_hardware("afedri")(transport=t, gain_db=-10)
    hw.open()
    hw.StartSamples()
    hw.ChangeFrequency(0, 7_100_000)
    hw.StopSamples()
    assert af.set_gain(-10) in t.msgs
    assert af.set_state(True) in t.msgs and af.set_state(False) in t.msgs
    assert af.set_center_freq(7_100_000) in t.msgs
    rate = hw.VarDecimSet(3)              # 185185 snapped to the fe clock
    assert abs(rate - 185_185) < 500
    assert len(hw.VarDecimGetChoices()) == 8


def test_afedri_radio_end_to_end():
    """UDP packets -> afedri plugin -> Radio chain -> audio."""
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.io import sources
    from quisk_tpu.modes import Mode

    hw = get_hardware("afedri")(transport=Sink())
    r = Radio(RadioConfig(sample_rate=48000.0, tune_hz=10000.0),
              hardware=hw, rigctl_port=0)
    r.open()
    n = 48000
    iq = np.asarray(sources.station_iq(Mode.USB, 48000.0, n,
                                       carrier_hz=10000.0, seed=3) * 0.4,
                    np.complex64)
    for k in range(0, n - 256, 256):
        hw.feed_udp(af.build_udp_packet(k // 256, iq[k:k + 256]))
    audio = np.asarray(r.run(blocks=8), np.float64)
    rms = float(np.sqrt(np.mean(audio ** 2)))
    assert 0.01 < rms < 2.0 and hw.seq_errors == 0


# ---------------------------------------------------------------- perseus
class FakePerseus:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def rec(*a):
            self.calls.append((name,) + a)
            return "perseus ok" if name == "open_device" else None
        return rec


def test_perseus_control_flow():
    drv = FakePerseus()
    hw = get_hardware("perseus")(driver=drv)
    assert hw.open() == "perseus ok"
    assert ("set_sampling_rate", 192000) in drv.calls
    assert hw.set_attenuator_index(2) == -20
    assert ("set_attenuator", -20) in drv.calls
    hw.set_wideband(True)
    assert ("set_wideband", 1) in drv.calls
    hw.ChangeFrequency(0, 3_560_000)
    assert ("set_ddc_center_freq", 3_560_000.0) in drv.calls
    assert hw.ReturnVfoFloat() == 3_560_000.0
    assert hw.VarDecimSet(7) == 1_000_000.0
    assert ("set_sampling_rate", 1000000) in drv.calls
    hw.close()
    assert ("close_device", 1) in drv.calls
    assert ATTEN_DB == (0, -10, -20, -30)


def test_perseus_sample_feed():
    hw = PerseusHardware(driver=FakePerseus())
    inter = np.arange(8, dtype=np.float32)
    hw.feed_samples(inter)
    got = hw.read_samples(4)
    np.testing.assert_allclose(got[0], [0 + 1j, 2 + 3j, 4 + 5j, 6 + 7j])
    assert PerseusHardware(driver=None).open() == "Perseus module not available"


# ---------------------------------------------------------------- soapy
class FakeSoapyDevice:
    def __init__(self):
        self.calls = []
        self.stream_active = False

    def setAntenna(self, d, ch, v): self.calls.append(("ant", d, v))
    def setSampleRate(self, d, ch, v): self.calls.append(("rate", d, v))
    def setBandwidth(self, d, ch, v): self.calls.append(("bw", d, v))
    def setFrequency(self, d, ch, v): self.calls.append(("freq", d, v))
    def setGainMode(self, d, ch, v): self.calls.append(("agc", d, v))
    def setGain(self, d, ch, v): self.calls.append(("gain", d, v))

    def setGainElement(self, d, ch, name, v):
        self.calls.append(("gel", d, name, v))

    def setupStream(self, d, fmt): return "stream"

    def activateStream(self, s): self.stream_active = True

    def deactivateStream(self, s): self.stream_active = False

    def readStream(self, s, buf, n):
        buf[:n] = np.arange(n, dtype=np.complex64)
        return n


class Conf:
    soapy_settings = {
        "soapy_setAntenna_rx": "LNAW",
        "soapy_setSampleRate_rx": "768",        # kHz, like the reference
        "soapy_setBandwidth_rx": "800",
        "soapy_gain_mode_rx": "detailed",
        "soapy_gain_values_rx": {"total": "30", "LNA": "24", "PGA": "-3"},
    }


def test_soapy_parameter_surface():
    d = FakeSoapyDevice()
    hw = get_hardware("soapy")(conf=Conf(), device=d)
    hw.open()
    assert ("ant", 0, "LNAW") in d.calls
    assert ("rate", 0, 768_000.0) in d.calls     # kHz -> Hz
    assert ("bw", 0, 800_000.0) in d.calls
    # detailed mode: AGC off, per-element gains, 'total' skipped
    assert ("agc", 0, False) in d.calls
    assert ("gel", 0, "LNA", 24.0) in d.calls
    assert ("gel", 0, "PGA", -3.0) in d.calls
    assert not any(c[0] == "gain" for c in d.calls)
    assert hw.rx_rate == 768_000.0
    # TX params are skipped when TX is disabled (reference open flag 3)
    assert not any(c[1] == 1 for c in d.calls if c[0] in ("ant", "rate"))


def test_soapy_gain_modes():
    for mode, check in (
            ("automatic", lambda c: ("agc", 0, True) in c),
            ("total", lambda c: ("gain", 0, 12.0) in c)):
        d = FakeSoapyDevice()
        hw = SoapyHardware(device=d)
        hw._apply_gain({"soapy_gain_mode_rx": mode,
                        "soapy_gain_values_rx": {"total": 12.0}}, "_rx", 0)
        assert check(d.calls), mode


def test_soapy_frequency_and_stream():
    d = FakeSoapyDevice()
    hw = SoapyHardware(device=d, enable_tx=True, transverter_offset=120e6)
    hw.ChangeFrequency(145_100_000, 145_000_000)
    assert ("freq", 0, 25_000_000.0) in d.calls   # transverter subtracted
    assert ("freq", 1, 25_100_000.0) in d.calls
    assert hw.ReturnVfoFloat() == 25_000_000.0
    # repeated VFO does not resend the RX frequency (quisk_hardware.py:86-89)
    n = len(d.calls)
    hw.ChangeFrequency(145_100_000, 145_000_000)
    assert not any(c == ("freq", 0, 25_000_000.0) for c in d.calls[n:])
    hw.StartSamples()
    assert d.stream_active
    got = hw.read_samples(16)
    assert got.shape == (1, 16)
    np.testing.assert_allclose(got[0], np.arange(16))
    hw.close()
    assert not d.stream_active
    assert SoapyHardware(device=None).open() == "Soapy module not available"


def test_soapy_read_samples_buffers_and_streamresult():
    """read_samples returns exactly n, buffering short reads, and accepts
    the real SoapySDR return convention (a StreamResult whose .ret is the
    count or a negative error code) as well as a plain int."""
    class SR:                      # SoapySDR.StreamResult-alike
        def __init__(self, ret): self.ret = ret

    class ShortReadDevice(FakeSoapyDevice):
        def __init__(self):
            super().__init__()
            self.served = 0
            self.chunk = 7         # short reads of 7 samples at a time
            self.limit = None      # then dry up

        def readStream(self, s, buf, n):
            if self.limit is not None and self.served >= self.limit:
                return SR(0)       # SOAPY timeout: nothing this call
            k = min(self.chunk, n)
            buf[:k] = (np.arange(k) + self.served).astype(np.complex64)
            self.served += k
            return SR(k)

    d = ShortReadDevice()
    hw = SoapyHardware(device=d)
    hw.StartSamples()
    got = hw.read_samples(16)                  # 3 reads of 7 -> 21 >= 16
    assert got is not None and got.shape == (1, 16)
    np.testing.assert_allclose(got[0], np.arange(16))
    d.limit = d.served                          # device dries up
    assert hw.read_samples(16) is None          # 5 buffered, not enough
    d.limit = None
    got2 = hw.read_samples(16)                  # 5 buffered + fresh reads
    assert got2 is not None and got2.shape == (1, 16)
    np.testing.assert_allclose(got2[0], np.arange(16, 32))


def test_wideband_hardware_pump_roundtrip():
    """hw 'wideband' plugin: jumbo-frame capture source end-to-end."""
    import threading
    import time

    import numpy as np

    from quisk_tpu.hw import get_hardware
    from quisk_tpu.io import native
    from quisk_tpu.io.pump import blast

    hw = get_hardware("wideband")(n_streams=1, sample_rate=10e6)
    assert "wideband" in hw.open()
    if not native.have_native_pump():
        return
    addrs = hw.start_pump()
    t = threading.Thread(target=blast, args=(addrs[0],),
                         kwargs=dict(codec="wideband", n_rx=1,
                                     n_packets=8, pace_pps=500.0))
    t.start()
    t.join()
    deadline = time.time() + 2.0
    blk = None
    while blk is None and time.time() < deadline:
        blk = hw.read_samples(8 * 8160)
        time.sleep(0.02)
    hw.close()
    assert blk is not None and blk.shape == (1, 8 * 8160)
    assert np.isfinite(blk).all()


def test_wideband_hardware_striped_capture():
    """hw 'wideband' striped mode: one capture over 2 sockets,
    reassembled in order by the plugin."""
    import numpy as np
    import pytest

    from quisk_tpu.hw import get_hardware
    from quisk_tpu.io import native
    from quisk_tpu.io.pump import blast_striped

    if not native.have_native_pump():
        pytest.skip("native ingest library not built")
    lib = native._find_lib()
    if not getattr(lib, "_has_striped", False):
        pytest.skip("stale native library without striped support")
    hw = get_hardware("wideband")(n_streams=2, striped=True,
                                  sample_rate=20e6)
    hw.open()
    addrs = hw.start_pump()
    assert len(addrs) == 2
    blast_striped(addrs, n_packets=8, pace_pps=2000.0)
    import time
    deadline = time.time() + 2.0
    blk = None
    while blk is None and time.time() < deadline:
        blk = hw.read_samples(8 * 8160)
        time.sleep(0.02)
    st = hw.pump.stats()
    hw.close()
    assert blk is not None and blk.shape == (1, 8 * 8160)
    assert st["seq_errors"] == 0, st
