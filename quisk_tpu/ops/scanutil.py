"""Unrolled lax.scan for per-sample recurrences.

Several reference algorithms are inherently sequential per-sample state
machines (wcpAGC's 5-state hang machine, process_alc's ramp logic, the
fmd.c/amd.c PLLs).  They vectorize over channels but not over time, and a
bare B-step ``lax.scan`` pays the TPU per-iteration overhead B times for
O(C) vector work per step — the iteration overhead, not the math,
dominates (measured: the TX ALC at [1024, 2048] spent tens of ms in scan
stepping).  ``unrolled_scan`` runs the EXACT same recurrence with U
sequential sample-updates inlined into each scan body: B/U iterations,
identical semantics, XLA fuses each body into one kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unrolled_scan(step, carry, xs, unroll: int = 16):
    """``lax.scan(step, carry, xs)`` with ``unroll`` steps per scan body.

    ``xs``: pytree of arrays with a common leading (time) axis B; ``step``
    maps (carry, slice) -> (carry, y) where y is a pytree of arrays.
    Returns (carry, ys) with every y-leaf stacked to leading axis B —
    exactly what a plain lax.scan returns.
    """
    leaves = jax.tree.leaves(xs)
    B = leaves[0].shape[0]
    U = unroll
    while B % U:
        U //= 2

    xs_r = jax.tree.map(lambda a: a.reshape(B // U, U, *a.shape[1:]), xs)

    def body(c, x_u):
        ys = []
        for u in range(U):
            c, y = step(c, jax.tree.map(lambda a: a[u], x_u))
            ys.append(y)
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *ys)
        return c, stacked

    carry, ys = jax.lax.scan(body, carry, xs_r)
    return carry, jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), ys)
