"""I/O: signal generators, IQ file I/O, host ingest, rate matching."""

from quisk_tpu.io import native, ratematch, sources, wav  # noqa: F401
from quisk_tpu.io.ratematch import RateServo, VarRateResampler  # noqa: F401
