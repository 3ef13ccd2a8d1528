"""Dot-precision policy for the decimation matmuls.

The TPU MXU truncates f32 operands to bf16 by default (~55 dB — far
below the filters' stopband floors), so accuracy-relevant dots request an
f32 emulation.  Two useful tiers exist on TPU:

- ``HIGHEST``: 6-pass bf16 emulation, full f32-equivalent accuracy.
- ``HIGH``: 3-pass bf16x3 emulation, ~2x faster, ~19-21 effective
  mantissa bits (typically 90-110 dB for these filter dots).

``DECIM_DOT`` applies to the decimating-FIR Toeplitz matmuls (MatmulFIR
and the fused Pallas front-end) where the filter's own stopband (~100 dB)
bounds the useful accuracy; everything else (OLS FFTs, NR, resamplers)
keeps HIGHEST.  Read at TRACE time: set it before building/jitting.
"""

import jax

DECIM_DOT = jax.lax.Precision.HIGHEST


def set_decim_dot(precision) -> None:
    global DECIM_DOT
    DECIM_DOT = precision
