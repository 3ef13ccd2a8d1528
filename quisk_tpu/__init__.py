"""quisk_tpu — a TPU-native software-defined-radio DSP framework.

A from-scratch reimagination of the capabilities of Quisk (jimahlstrom/quisk)
as batched, sharded JAX/XLA/Pallas array programs: where the reference
processes one 1-20 ms sample block for 1-3 channels in sequential C loops
(reference: quisk.c:2289 quisk_process_samples), this framework processes
``[channels, block]`` arrays for thousands of channels per step, with
``lax.scan`` carrying DSP state across blocks and ``shard_map`` distributing
channels/time across a TPU mesh.

Layout
------
- ``quisk_tpu.ops``      kernel library: filter design, overlap-save FIR,
                         polyphase resamplers, NCO, demodulators, AGC,
                         squelch, noise blanker/notch, spectrum analysis
- ``quisk_tpu.rx``       receive-chain composition + decimation planner
- ``quisk_tpu.tx``       transmit chain (mic processing, ALC, modulators)
- ``quisk_tpu.parallel`` mesh/sharding helpers, time-shard halo exchange
- ``quisk_tpu.io``       IQ file I/O, signal generators, native ingest
- ``quisk_tpu.app``      config system, spectrum/graph service, CLI
- ``quisk_tpu.oracle``   float64 NumPy reference implementations used as
                         the conformance oracle in tests (the reference
                         ships no test suite; see SURVEY.md §4)
"""

__version__ = "0.1.0"

from quisk_tpu.modes import Mode  # noqa: F401
from quisk_tpu.rx import RxChain, RxChainConfig  # noqa: F401
from quisk_tpu.tx import TxChain, TxChainConfig  # noqa: F401
