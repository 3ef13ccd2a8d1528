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
