"""The multi-resolution zoom ENGAGED on the real TPU device: at 192 kHz
the decim chooser admits d=16 (unlike the 48 kHz radio smoke, where no
valid decim exists and the zoom silently stays off) — this exercises
the eager NCO+FIR+analyzer re-capture with its host-complex FIR state
under an accelerator default backend."""
import time

import numpy as np
import jax

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)
from quisk_tpu.app.config import RadioConfig
from quisk_tpu.app.radio import Radio
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
radio.set_zoom(64.0, radio.vfo_hz + 40040.0)
radio.run(blocks=6)
assert radio._zoomcap is not None, "zoom did not engage"
zrow = radio._zoom_trace()
radio.close()
assert zrow is not None
lo, bin_hz, row = zrow
print(f"zoom engaged: decim={radio._zoomcap[0].decim}, row "
      f"{row.shape} from {lo:.0f} Hz @ {bin_hz:.2f} Hz/px", flush=True)
print(f"ZOOM-ON-TPU OK in {time.time()-t0:.1f}s", flush=True)
