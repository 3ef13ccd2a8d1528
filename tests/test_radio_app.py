"""The Radio orchestrator: sim hardware -> chain -> audio/spectrum, CAT
retuning mid-run through a real rigctld socket."""

import socket

import numpy as np

from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio


def _cfg(**kw):
    return RadioConfig(sample_rate=48000.0, audio_block=2048, mode="USB",
                       tune_hz=10000.0, agc=True, **kw)


def test_radio_runs_sim_hardware_to_audio():
    cfg = _cfg()
    radio = Radio(cfg, hardware="sim")
    radio.hw.tone_hz = 11000.0           # 1 kHz above the USB carrier
    radio.open()
    audio = radio.run(blocks=10)
    radio.close()
    assert audio.shape[0] == 1 and audio.shape[1] == 10 * radio.chain.block_audio
    seg = audio[0][-4 * radio.chain.block_audio:]
    f = np.fft.rfftfreq(len(seg), 1 / radio.chain.fs_audio)
    k = np.argmax(np.abs(np.fft.rfft(seg)))
    assert abs(f[k] - 1000.0) < 30.0     # demodulated beat note
    # spectrum/waterfall were fed
    assert radio.waterfall.pixels().shape[0] >= 1
    assert np.isfinite(radio.smeter_db())


def test_radio_retunes_without_recompiling():
    radio = Radio(_cfg(), hardware="sim")
    radio.hw.tone_hz = 14000.0
    radio.open()
    a1 = radio.run(blocks=4)[0]
    radio.set_frequency(13000.0)          # tone now 1 kHz above carrier
    a2 = radio.run(blocks=6)[0]
    radio.close()
    seg = a2[-3 * radio.chain.block_audio:]
    f = np.fft.rfftfreq(len(seg), 1 / radio.chain.fs_audio)
    k = np.argmax(np.abs(np.fft.rfft(seg)))
    assert abs(f[k] - 1000.0) < 30.0
    # mistuned audio was quieter than tuned-in audio
    assert np.sqrt(np.mean(seg ** 2)) > 2.0 * np.sqrt(np.mean(a1[0] ** 2) + 1e-12)


def test_radio_cat_control_retunes():
    radio = Radio(_cfg(), hardware="sim", rigctl_port=0)
    radio.hw.tone_hz = 8000.0
    radio.open()
    radio.run(blocks=2)
    s = socket.create_connection(("127.0.0.1", radio.rigctl.port), timeout=5)
    fobj = s.makefile("rwb")
    fobj.write(b"F 7000\n")
    fobj.flush()
    assert fobj.readline().strip() == b"RPRT 0"
    s.close()
    assert radio.cfg.tune_hz == 7000.0    # CAT change reached the chain
    audio = radio.run(blocks=6)[0]
    radio.close()
    seg = audio[-3 * radio.chain.block_audio:]
    f = np.fft.rfftfreq(len(seg), 1 / radio.chain.fs_audio)
    k = np.argmax(np.abs(np.fft.rfft(seg)))
    assert abs(f[k] - 1000.0) < 30.0      # 8 kHz tone, 7 kHz carrier


def test_record_buttons_audio_and_iq(tmp_path):
    # live record taps (sound.c:255-421, quisk.c:295-577): speaker audio
    # and raw capture samples to WAV while the block loop runs
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.io import wav

    r = Radio(RadioConfig(sample_rate=48000.0, tune_hz=10000.0),
              hardware="sim", rigctl_port=None)
    r.open()
    p1 = str(tmp_path / "spk.wav")
    r.start_record(p1, kind="audio")
    r.run(blocks=3)
    assert r.stop_record() == p1
    a, fs = wav.read_audio_wav(p1)
    assert fs == 48000.0 and a.shape[-1] == 3 * r.chain.block_audio
    assert np.all(np.isfinite(a))

    p2 = str(tmp_path / "raw.wav")
    r.start_record(p2, kind="iq")
    r.run(blocks=2)
    assert r.stop_record() == p2
    iq, fs2 = wav.read_iq_wav(p2)
    assert fs2 == 48000.0 and iq.shape[-1] == 2 * r.chain.block_in
    assert np.iscomplexobj(iq)
    r.close()
    assert r.stop_record() is None


def test_band_switching_with_per_band_memory(tmp_path):
    # quisk.py bandState: band buttons save (VFO, dial, mode) and restore;
    # first visit lands on the band center with LSB<9MHz/USB rule
    from quisk_tpu.app.config import RadioConfig, Settings
    from quisk_tpu.app.radio import Radio

    s = Settings(tmp_path / "s.json")
    r = Radio(RadioConfig(sample_rate=192000.0), hardware="sim", settings=s,
              rigctl_port=None)
    r.set_band("40")
    assert r.cfg.mode == "LSB" and r.vfo_hz == 7_150_000
    assert r.freq_hz == 7_150_000
    r.set_frequency(7_162_000.0)          # operate somewhere in-band
    r.set_mode("CWL")
    r.set_band("20")
    assert r.cfg.mode == "USB" and r.vfo_hz == 14_170_000
    r.set_band("40")                      # restored exactly
    assert (r.freq_hz, r.cfg.mode) == (7_162_000.0, "CWL")
    assert r.vfo_hz == 7_150_000
    s.save()
    # band memory persists across app sessions (StateNames parity)
    r2 = Radio(RadioConfig(sample_rate=192000.0), hardware="sim",
               settings=Settings(tmp_path / "s.json"), rigctl_port=None)
    r2.set_band("20")
    assert r2.vfo_hz == 14_170_000
    r2.set_band("40")
    assert (r2.freq_hz, r2.cfg.mode) == (7_162_000.0, "CWL")


def test_volume_and_mute(tmp_path):
    from quisk_tpu.app.config import RadioConfig, Settings
    from quisk_tpu.app.radio import Radio

    s = Settings(tmp_path / "s.json")
    r = Radio(RadioConfig(sample_rate=48000.0, tune_hz=10000.0,
                          agc=False),   # stationary level for the ratio
              hardware="sim", settings=s, rigctl_port=None)
    r.open()
    r.run(blocks=4)                      # filter warm-up
    full = np.sqrt(np.mean(r.run(blocks=4) ** 2))
    r.set_volume(0.25)
    quarter = np.sqrt(np.mean(r.run(blocks=4) ** 2))
    assert np.isclose(quarter, 0.25 * full, rtol=0.2), (full, quarter)
    r.set_mute(True)
    assert np.abs(r.run(blocks=1)).max() == 0.0
    r.set_mute(False)
    r.close()
    s.save()
    # volume persists
    r2 = Radio(RadioConfig(sample_rate=48000.0), hardware="sim",
               settings=Settings(tmp_path / "s.json"), rigctl_port=None)
    assert r2.volume == 0.25


def test_hardware_heartbeat_and_return_frequency():
    """The loop polls Hardware.HeartBeat (~10 Hz, quisk.py:4466) and
    follows hardware-initiated tuning via ReturnFrequency
    (quisk.py:5570-5585, e.g. a front-panel knob)."""
    import numpy as np
    from quisk_tpu.app.config import RadioConfig
    from quisk_tpu.app.radio import Radio
    from quisk_tpu.hw.base import Hardware

    class KnobHW(Hardware):
        def __init__(self):
            super().__init__()
            self.beats = 0
            self.knob = None

        def read_samples(self, n):
            return np.zeros((1, n), np.complex64)

        def HeartBeat(self):
            self.beats += 1

        def ReturnFrequency(self):
            k, self.knob = self.knob, None
            return (k, None) if k is not None else (None, None)

    hw = KnobHW()
    r = Radio(RadioConfig(sample_rate=48000.0, tune_hz=7000.0, agc=False),
              hardware=hw)
    for _ in range(30):
        r.run_once()
    # ~10 Hz at 48k/2048-sample blocks = every ~2 blocks
    assert hw.beats >= 10
    hw.knob = 9000
    r.run_once()
    assert r.freq_hz == 9000.0
    assert hw.tx_frequency == 9000          # echoed back as the dial


def test_radio_multiresolution_zoom_recapture():
    """Past the base FFT's resolution, set_zoom engages a ZoomSpectrum
    re-capture: two tones 80 Hz apart (inside ONE base-FFT bin at
    93.75 Hz) resolve as two peaks in the zoomed trace at the right
    absolute frequencies (wdsp/analyzer.c multi-resolution spans)."""
    from quisk_tpu.hw.base import SimHardware

    class TwoTone(SimHardware):
        def read_samples(self, n):
            t = (np.arange(n) + self._n0) / self.sample_rate
            self._n0 += n
            x = (0.5 * np.exp(2j * np.pi * 40000.0 * t)
                 + 0.5 * np.exp(2j * np.pi * 40080.0 * t))
            return x.astype(np.complex64)[None]

    cfg = RadioConfig(sample_rate=192000.0, mode="USB", tune_hz=10000.0,
                      audio_block=2048)
    hw = TwoTone(cfg)
    hw._n0 = 0
    radio = Radio(cfg, hardware=hw)
    radio.open()
    base_bin = cfg.sample_rate / radio.graph.sa.fft_size
    assert base_bin > 80.0                    # the tones share a base bin
    center = radio.vfo_hz + 40040.0
    radio.set_zoom(64.0, center)          # staged (webui-thread-safe)
    radio.run(blocks=6)                   # applied on the radio thread
    assert radio._zoomcap is not None
    zs = radio._zoomcap[0]
    # the re-captured span must COVER the displayed window (review
    # finding: decim > zoom would leave edge-clamped fabricated pixels)
    assert zs.decim <= 64.0
    zrow = radio._zoom_trace()
    radio.close()
    assert zrow is not None
    lo, bin_hz, row = zrow
    # resolution must beat the base FFT
    zres = cfg.sample_rate / (zs.decim * zs.an.fft_size)
    assert zres < base_bin / 2
    # two distinct peaks at the right absolute frequencies
    r = row - row.min()
    pk = [i for i in range(1, len(r) - 1)
          if r[i] >= r[i - 1] and r[i] >= r[i + 1]
          and r[i] > 0.7 * r.max()]
    # collapse plateaus
    groups = []
    for i in pk:
        if groups and i - groups[-1][-1] <= 2:
            groups[-1].append(i)
        else:
            groups.append([i])
    freqs = sorted(lo + bin_hz * (np.mean(g) + 0.5) for g in groups)
    assert len(freqs) == 2, (len(freqs), freqs)
    assert abs(freqs[0] - (radio.vfo_hz + 40000.0)) < 2 * zres
    assert abs(freqs[1] - (radio.vfo_hz + 40080.0)) < 2 * zres
