"""Kernel library: every hot inner loop of the reference as a batched array op.

All ops follow one convention:

- an op object is a ``flax.struct`` pytree holding its (array) parameters plus
  static shape metadata,
- ``op.init_state(channels)`` returns the carried state for a channel batch,
- ``op(state, x) -> (state, y)`` processes one ``[channels, block]`` block.

Streaming invariance (processing ``concat(a, b)`` equals processing ``a`` then
``b``) is a tested property of every stateful op (tests/test_streaming.py).
"""

from quisk_tpu.ops import design  # noqa: F401
from quisk_tpu.ops.agc import AGC  # noqa: F401
from quisk_tpu.ops.channelizer import PFBChannelizer  # noqa: F401
from quisk_tpu.ops.compress import OvershootControl, SoftCompressor  # noqa: F401
from quisk_tpu.ops.demod import (AMDemod, FMDemod, MixedDemod,  # noqa: F401
                                 PLLFMDemod, SSBDemod, register_ext_demod)
from quisk_tpu.ops.diversity import DiversityCombiner  # noqa: F401
from quisk_tpu.ops.eq import CFCompressor, GraphicEQ  # noqa: F401
from quisk_tpu.ops.fir import (ConvFIR, MatmulFIR,  # noqa: F401
                               OverlapSaveFIR, make_fir)
from quisk_tpu.ops.iir import (Biquad, DCBlock, OnePole,  # noqa: F401
                              PhaseRotator, Preemphasis)
from quisk_tpu.ops.ewscan import ew_cumsum  # noqa: F401
from quisk_tpu.ops.nco import NCO  # noqa: F401
from quisk_tpu.ops.noise import (AutoNotch, NoiseBlanker,  # noqa: F401
                                 SpectralNoiseBlanker)
from quisk_tpu.ops.nr import BlockLMS, SpectralNR, SyncAMDemod  # noqa: F401
from quisk_tpu.ops.resample import FracDecim, Interpolator  # noqa: F401
from quisk_tpu.ops.spectrum import SpectrumAnalyzer, measure_frequency  # noqa: F401
from quisk_tpu.ops.squelch import FMSquelch, SSBSquelch  # noqa: F401
