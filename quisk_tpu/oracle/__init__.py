"""Float64 NumPy reference implementations — the conformance oracle.

The reference ships no automated tests (SURVEY.md §4); its own fixture was
WAV replay of recorded IQ (sound.c:987, quisk.c:1538-1576).  Here every TPU
kernel is validated against an independent float64 NumPy implementation of
the same math, with SNR assertions sized to the float32 error budget.
"""

from quisk_tpu.oracle import dsp  # noqa: F401
