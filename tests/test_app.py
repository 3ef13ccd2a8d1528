"""App layer: WAV I/O roundtrip, CLI tx->rx->spectrum, config persistence."""

import json

import numpy as np
import pytest

from quisk_tpu.app.cli import main as cli_main
from quisk_tpu.app.config import RadioConfig, Settings
from quisk_tpu.io import sources, wav
from quisk_tpu.oracle import dsp


def test_wav_roundtrip(tmp_path):
    iq = (0.5 * sources.tone(1000.0, 48000.0, 4096)
          + 0.25 * sources.tone(-8000.0, 48000.0, 4096))
    p = str(tmp_path / "iq.wav")
    wav.write_iq_wav(p, iq, 48000.0)
    iq2, fs = wav.read_iq_wav(p)
    assert fs == 48000.0
    assert dsp.snr_db(iq, iq2) > 80  # int16 quantisation ~90 dB for this


@pytest.mark.slow
def test_cli_tx_rx_roundtrip(tmp_path):
    v = sources.voice_like(48000.0, 48000)
    v = 0.5 * v / np.max(np.abs(v))
    voice_p = str(tmp_path / "voice.wav")
    iq_p = str(tmp_path / "iq.wav")
    audio_p = str(tmp_path / "audio.wav")
    wav.write_audio_wav(voice_p, v, 48000.0)
    assert cli_main(["tx", "--in", voice_p, "--out", iq_p, "--mode", "USB"]) == 0
    assert cli_main(["rx", "--in", iq_p, "--out", audio_p, "--mode", "USB",
                     "--no-agc"]) == 0
    a, fs = wav.read_audio_wav(audio_p)
    assert fs == 48000.0
    from quisk_tpu.ops import design
    taps = design.bandpass_analytic(513, 300.0, 2700.0, 48000.0)
    _, ref = dsp.fir_stream(v, 2 * np.real(taps))
    assert dsp.frac_align_snr(ref, a, skip=8192) > 25


def test_cli_info(tmp_path, capsys):
    p = str(tmp_path / "iq.wav")
    wav.write_iq_wav(p, sources.tone(100.0, 960000.0, 8192), 960000.0)
    assert cli_main(["info", "--in", p]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["decimation_stages"] == [2, 2, 5]
    assert out["audio_rate"] == 48000.0


def test_cli_spectrum(tmp_path, capsys):
    p = str(tmp_path / "iq.wav")
    wav.write_iq_wav(p, sources.tone(6000.0, 48000.0, 32768, amplitude=0.9),
                     48000.0)
    assert cli_main(["spectrum", "--in", p]) == 0
    out = capsys.readouterr().out
    assert "peak" in out
    peak_hz = float(out.split("at ")[1].split(" Hz")[0])
    assert abs(peak_hz - 6000.0) < 300.0


def test_settings_roundtrip(tmp_path):
    s = Settings(tmp_path / "settings.json")
    cfg = RadioConfig(name="hermes", sample_rate=192000.0, channels=4,
                      mode="LSB")
    s.add_radio(cfg)
    s.update_state(interval_secs=0.0, band="40m", tune_hz=7100000.0,
                   mode="LSB")
    s2 = Settings(tmp_path / "settings.json")
    assert s2.get_radio("hermes").sample_rate == 192000.0
    assert s2.get_state()["band"] == "40m"
    assert s2.radio_names() == ["hermes"]


def test_cli_rx_with_stage_flags(tmp_path):
    """The CLI wires the optional RX stages (--nb/--notch/--nr/--anf/
    --squelch) into the chain."""
    v = sources.voice_like(48000.0, 96000)
    v = 0.5 * v / np.max(np.abs(v))
    tone = 1.0 * np.sin(2 * np.pi * 1200.0 / 48000.0 * np.arange(96000))
    iq = sources.ssb_signal(v + tone, 48000.0)
    iq_p = str(tmp_path / "iq.wav")
    out_p = str(tmp_path / "audio.wav")
    wav.write_iq_wav(iq_p, iq, 48000.0)
    base_p = str(tmp_path / "base.wav")
    assert cli_main(["rx", "--in", iq_p, "--out", base_p, "--mode", "USB",
                     "--no-agc"]) == 0
    assert cli_main(["rx", "--in", iq_p, "--out", out_p, "--mode", "USB",
                     "--no-agc", "--nb", "2", "--anf", "--nr"]) == 0
    a, fs = wav.read_audio_wav(out_p)
    b, _ = wav.read_audio_wav(base_p)
    assert fs == 48000.0 and np.all(np.isfinite(a))
    # the ANF stage pushes the 1200 Hz carrier down relative to the
    # unprocessed run (both outputs are peak-normalised, so compare the
    # tone-to-voice ratio)
    n = len(a) // 2
    F = np.fft.rfftfreq(n, 1 / 48000.0)
    k = np.argmin(np.abs(F - 1200.0))
    voice_band = (F > 300) & (F < 2700) & (np.abs(F - 1200.0) > 150)
    def ratio(x):
        X = np.abs(np.fft.rfft(x[-n:]))
        return X[k] / (X[voice_band].mean() + 1e-12)
    assert ratio(a) < 0.5 * ratio(b), (ratio(a), ratio(b))
