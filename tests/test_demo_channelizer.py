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
