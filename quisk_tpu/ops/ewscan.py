"""Exponentially-weighted cumulative sum as blocked triangular matmuls.

``ew_cumsum`` evaluates the first-order recurrence

    y[n] = alpha * y[n-1] + x[n],      y[-1] = y0

for EVERY n of a [C, B] block.  A per-sample ``lax.scan`` at the raw IQ
rate (B ~ 40k samples) is dominated by per-iteration overhead, and both
``jnp.cumsum`` and ``lax.associative_scan`` on [1024, 42k] measure >10 ms
on the TPU (CLAUDE.md "cumsum is worse").  Instead the recurrence is
solved exactly in two matmul levels that run on the MXU:

  1. split B into J sub-blocks of L=128 lanes; within a sub-block the
     prefix states are ``P = x_sub @ W^T`` with the lower-triangular
     Toeplitz weight ``W[i, k] = alpha^(i-k)``;
  2. the J sub-block carry-ins follow the same recurrence at ratio
     alpha^L over the J block-end states — one more [J, J] triangular
     matmul — and are blended back as ``alpha^(i+1) * carry``.

Both dots use ``Precision.HIGHEST`` (Mosaic/XLA otherwise truncate f32
operands to bf16, CLAUDE.md).  Exact to f32 rounding; conformance vs a
float64 sequential oracle in tests/test_frontend.py.

``ops/iir._first_order_chunked`` is the traced-coefficient sibling of
this scheme (OnePole/DCBlock carry their coefficient as pytree data);
keep the two in sync when touching either.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.lax import Precision

_L = 128  # lane-aligned sub-block width


def ew_cumsum(x: jnp.ndarray, alpha: float, y0: jnp.ndarray) -> jnp.ndarray:
    """All states of ``y[n] = alpha*y[n-1] + x[n]``.

    x: [C, B] real; alpha: python float (static); y0: [C] the carried
    state y[-1].  Returns y [C, B]; the next block's carry is y[:, -1].
    """
    C, B = x.shape
    a = float(alpha)
    L = min(_L, B) if B % _L else _L
    Bp = -(-B // L) * L
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B)))
    J = Bp // L

    i = np.arange(L)
    W = np.tril(np.power(a, np.maximum(i[:, None] - i[None, :], 0),
                         dtype=np.float64)).astype(np.float32)
    aL = a ** L
    j = np.arange(J)
    V = np.tril(np.power(aL, np.maximum(j[:, None] - j[None, :], 0),
                         dtype=np.float64)).astype(np.float32)
    ramp = np.power(a, i + 1.0).astype(np.float32)        # alpha^(i+1)
    ramp_j = np.power(aL, j + 1.0).astype(np.float32)     # alpha^(L(j+1))

    xb = x.reshape(C, J, L)
    # P[c, j, i] = sum_{k<=i} alpha^(i-k) x[c, j, k]
    P = jnp.einsum("cjl,il->cji", xb, jnp.asarray(W),
                   precision=Precision.HIGHEST)
    T = P[:, :, -1]                                        # block-end sums
    # dcend[c, j] = T[c, j] + aL*dcend[c, j-1], dcend[-1] = y0
    dcend = jnp.einsum("cm,jm->cj", T, jnp.asarray(V),
                       precision=Precision.HIGHEST)
    dcend = dcend + jnp.asarray(ramp_j)[None, :] * y0[:, None]
    carry_in = jnp.concatenate([y0[:, None], dcend[:, :-1]], axis=1)
    y = P + jnp.asarray(ramp)[None, None, :] * carry_in[:, :, None]
    return y.reshape(C, Bp)[:, :B]
