"""Complex-safe jit boundary packing.

The axon TPU runtime supports complex64 *inside* compiled programs (FFTs,
complex mul, lax.complex all verified working) but NOT at the host<->device
boundary: transferring a complex array to the device, creating one eagerly,
or fetching one back all fail with UNIMPLEMENTED.  The framework therefore
keeps complex leaves as host numpy arrays in op pytrees and crosses the jit
boundary with (re, im) float32 pairs:

    step = make_boundary_step(lambda chain, state, x: chain.step(state, x))
    packed_chain  = pack_tree(chain)
    packed_state  = pack_tree(chain.init_state())
    packed_state, audio = step(packed_chain, packed_state, x.real, x.imag)

Inside the wrapped function every CPair is rebuilt with lax.complex (a pure
device-side op), and returned complex leaves are split back into pairs, so
no complex value ever touches the boundary.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CPair:
    """A complex array carried as two real float32 arrays."""

    re: jnp.ndarray
    im: jnp.ndarray

    def cx(self) -> jnp.ndarray:
        return jax.lax.complex(self.re, self.im)


def _is_complex_leaf(leaf) -> bool:
    dt = getattr(leaf, "dtype", None)
    return dt is not None and np.issubdtype(dt, np.complexfloating)


def pack_tree(tree):
    """Replace every complex leaf with a CPair of float32 leaves.

    Works on host pytrees (numpy/jnp leaves) and inside jit on traced
    values.
    """

    def f(leaf):
        if _is_complex_leaf(leaf):
            if isinstance(leaf, np.ndarray):
                return CPair(re=jnp.asarray(leaf.real, jnp.float32),
                             im=jnp.asarray(leaf.imag, jnp.float32))
            return CPair(re=jnp.real(leaf).astype(jnp.float32),
                         im=jnp.imag(leaf).astype(jnp.float32))
        return leaf

    return jax.tree.map(f, tree)


def unpack_tree(tree):
    """Rebuild complex leaves from CPairs (device-side lax.complex)."""

    def f(node):
        if isinstance(node, CPair):
            return node.cx()
        return node

    return jax.tree.map(f, tree, is_leaf=lambda n: isinstance(n, CPair))


def make_boundary_step(fn):
    """Wrap fn(*trees) so all args/returns cross the boundary complex-free.

    Returns a jit-compiled function taking packed trees and returning packed
    trees.
    """

    @jax.jit
    def wrapped(*packed):
        args = tuple(unpack_tree(p) for p in packed)
        out = fn(*args)
        return pack_tree(out)

    return wrapped
