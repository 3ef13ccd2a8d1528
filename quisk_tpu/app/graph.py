"""Graph/waterfall data service — the ``get_graph`` equivalent.

Parity: quisk.c:5142 ``get_graph``: accumulate windowed FFTs, every
``1/graph_refresh`` seconds emit an averaged dB trace re-binned to display
pixels, plus the S-meter for the tuned passband; waterfall rows are the
same trace quantised to a palette (the reference keeps an RGB row buffer in
C, quisk.c:5334 — here rows are just arrays for any frontend to render).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from quisk_tpu.ops.spectrum import SpectrumAnalyzer, rebin_pixels


class GraphService:
    """Stateful host-side wrapper: feed IQ blocks, poll dB traces."""

    def __init__(self, fft_size: int, block: int, channels: int,
                 sample_rate: float, pixels: int = 1024,
                 refresh_hz: float = 7.0):
        self.sa = SpectrumAnalyzer.create(fft_size, block)
        self.state = self.sa.init_state(channels)
        self.sample_rate = sample_rate
        self.pixels = pixels
        self.blocks_per_refresh = max(
            1, int(round(sample_rate / block / refresh_hz)))
        self._since_refresh = 0
        self.waterfall: list[np.ndarray] = []
        self.max_waterfall_rows = 512

    def feed(self, iq_block: jnp.ndarray) -> np.ndarray | None:
        """Accumulate one [C, block] IQ block; returns a [C, pixels] dB trace
        when a refresh interval has elapsed, else None."""
        self.state, _ = self.sa.accumulate(self.state, iq_block)
        self._since_refresh += 1
        if self._since_refresh < self.blocks_per_refresh:
            return None
        trace = np.asarray(rebin_pixels(self.sa.graph_db(self.state),
                                        self.pixels))
        self.state = self.sa.reset(self.state)
        self._since_refresh = 0
        self.waterfall.append(trace)
        if len(self.waterfall) > self.max_waterfall_rows:
            self.waterfall.pop(0)
        return trace

    def smeter_dbfs(self, f_lo, f_hi) -> np.ndarray:
        """Current S-meter power (dBFS) per channel for [f_lo, f_hi]."""
        p = self.sa.smeter_power(self.state, self.sample_rate, f_lo, f_hi)
        return np.asarray(10.0 * jnp.log10(p + 1e-20))

    def freqs(self) -> np.ndarray:
        return self.sa.freqs(self.sample_rate)
