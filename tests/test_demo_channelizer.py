"""The channelizer demo (examples/demo_channelizer.py) runs end-to-end
on the r5 PFBRxPipeline: stations land on their channels and the AM
audio WAV is written."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_channelizer_runs(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "demo_channelizer.py"),
         "--channels", "64", "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "strongest channels" in out.stdout
    assert (tmp_path / "pfb_ch5_am.wav").exists()


def test_demo_wideband_survey_runs(tmp_path):
    """The r5 capstone flow for real: jumbo-frame UDP stream -> wideband
    hw plugin (native pump) -> PFBRxPipeline -> survey + WAV."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "demo_wideband_survey.py"),
         "--channels", "64", "--blocks", "4", "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "0 seq errors" in out.stdout
    assert (tmp_path / "survey_am.wav").exists()
