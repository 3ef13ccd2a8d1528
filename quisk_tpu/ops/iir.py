"""First-order IIR sections as parallel (associative-scan) recurrences.

The reference sprinkles one-pole filters through the demod chain — AM DC
removal (quisk.c:2002-2025), FM de-emphasis at 300 Hz (quisk.c:2057-2064),
TX pre-emphasis (microphone.c:452-465).  A recurrence
``y[n] = a*y[n-1] + b*x[n]`` is a linear scan, so instead of a sequential
per-sample loop we evaluate it with ``jax.lax.associative_scan`` over the
block axis — O(log B) depth, fully vectorised over channels, and the carried
state is just the last output sample.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _combine(lhs, rhs):
    """Associative combinator of first-order affine maps y -> a*y + b."""
    a1, b1 = lhs
    a2, b2 = rhs
    return a2 * a1, a2 * b1 + b2


def _first_order_scan(x: jnp.ndarray, a, b, y_prev: jnp.ndarray) -> jnp.ndarray:
    """All outputs of y[n] = a*y[n-1] + b*x[n] given y[-1] = y_prev.

    x: [C, B]; a, b scalar or [C, 1]; y_prev: [C]. Returns y [C, B].

    Two formulations, same math:
    - associative_scan (log B levels, each touching the FULL [C, B] pair
      of carry planes) for short blocks / per-channel coefficients;
    - chunked MXU (scalar ``a``, B % 128 == 0, B >= 2048): within-chunk
      outputs are one [C, nch, 128] x [128, 128] lower-triangular decay
      matmul, chunk-boundary carries a tiny scan over [C, B/128].  At
      PFB shapes ([4096, 16384]) the associative scan's ~14 levels are
      several GB of HBM traffic; the matmul reads/writes the data once
      (A/B in BENCH_DETAIL, the bulk of the PFB demod stage).
    """
    a_arr = jnp.asarray(a)
    if a_arr.ndim == 0 and x.shape[-1] >= 2048 and x.shape[-1] % 128 == 0:
        return _first_order_chunked(x, a_arr, b, y_prev)
    A = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape)
    Bv = jnp.asarray(b, x.dtype) * x

    A_cum, B_cum = jax.lax.associative_scan(_combine, (A, Bv), axis=-1)
    return B_cum + A_cum * y_prev[:, None]


def _first_order_chunked(x: jnp.ndarray, a, b, y_prev: jnp.ndarray,
                         L: int = 128) -> jnp.ndarray:
    """Chunked evaluation of y[n] = a*y[n-1] + b*x[n] (scalar a).

    Within chunk j (start carry c_j): y[n] = a^(n+1) c_j + sum_k a^(n-k)
    u[k] — the sum is a matmul with the [L, L] triangular T[n,k] =
    a^(n-k); carries follow c_{j+1} = a^L c_j + e_j with e_j the chunk's
    last carry-free output, a (B/L)-long affine recurrence (tiny scan).

    Same scheme as ops/ewscan.ew_cumsum (the capture-path DC blocker);
    this version additionally handles a TRACED (pytree-data, possibly
    negative) coefficient — the basis powers are built in-graph via
    |a|^d * sign(a)^d — where ew_cumsum wants a static python float."""
    C, B = x.shape
    nch = B // L
    A = a.astype(x.dtype)
    u = (jnp.asarray(b, x.dtype) * x).reshape(C, nch, L)
    n = jnp.arange(L)
    d = n[:, None] - n[None, :]
    # powers via |a|^d * sign(a)^d: float pow of a negative base is NaN,
    # and ``a`` may be negative (e.g. the -b0 feedback in Biquad.df1)
    dm = jnp.maximum(d, 0).astype(x.dtype)
    sgn = jnp.where(A < 0, -1.0, 1.0).astype(x.dtype)
    mag = jnp.abs(A)
    pw = (mag ** dm) * jnp.where(dm % 2 == 0, 1.0, sgn)
    T = jnp.where(d >= 0, pw, 0.0)
    yin = jnp.einsum("cjk,nk->cjn", u, T,
                     precision=jax.lax.Precision.HIGHEST)
    e = yin[:, :, -1]                                  # [C, nch]
    aL = (mag ** L) * (sgn ** (L % 2) if L % 2 else 1.0)
    Aj = jnp.full((C, nch), aL, x.dtype)

    Acum, Ecum = jax.lax.associative_scan(_combine, (Aj, e), axis=-1)
    s = Ecum + Acum * y_prev[:, None]                  # end state of chunk j
    c = jnp.concatenate([y_prev[:, None], s[:, :-1]], axis=-1)
    n1 = (n + 1).astype(x.dtype)
    decay = (mag ** n1) * jnp.where((n + 1) % 2 == 0, 1.0, sgn)  # [L]
    y = yin + c[:, :, None] * decay[None, None, :]
    return y.reshape(C, B)


def _first_order_scan_tm(x: jnp.ndarray, a, b,
                         y_prev: jnp.ndarray) -> jnp.ndarray:
    """Time-major twin of :func:`_first_order_scan`.

    x: [..., T, C] with TIME on axis -2 and channels riding the lanes —
    the layout the PFB's IDFT matmul produces ([n_out, K]); running the
    recurrence here avoids the [K, n_out] corner turn that cost the r4
    pipeline a full-batch HBM round trip.  a, b scalar; y_prev [..., C].
    Chunked-MXU path for long T (each chunk is a [L, L] x [L, C] matmul —
    the lane axis is the SIMD width, better MXU utilization than the
    channel-major [C, nch, L] x [L, L] form); associative scan otherwise.
    """
    a_arr = jnp.asarray(a)
    T = x.shape[-2]
    if a_arr.ndim == 0 and T >= 2048 and T % 128 == 0:
        return _first_order_chunked_tm(x, a_arr, b, y_prev)
    A = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape)
    Bv = jnp.asarray(b, x.dtype) * x

    A_cum, B_cum = jax.lax.associative_scan(_combine, (A, Bv), axis=-2)
    return B_cum + A_cum * y_prev[..., None, :]


def _first_order_chunked_tm(x: jnp.ndarray, a, b, y_prev: jnp.ndarray,
                            L: int = 128) -> jnp.ndarray:
    """Chunked y[n] = a*y[n-1] + b*x[n] over axis -2 (time-major).

    Same triangular-decay factorization as :func:`_first_order_chunked`;
    the within-chunk pass is einsum("...jlc,nl->...jnc") — an [L, L] x
    [L, C] matmul per chunk with channels on the lanes."""
    T, C = x.shape[-2:]
    lead = x.shape[:-2]
    nch = T // L
    A = a.astype(x.dtype)
    u = (jnp.asarray(b, x.dtype) * x).reshape(*lead, nch, L, C)
    n = jnp.arange(L)
    d = n[:, None] - n[None, :]
    dm = jnp.maximum(d, 0).astype(x.dtype)
    sgn = jnp.where(A < 0, -1.0, 1.0).astype(x.dtype)
    mag = jnp.abs(A)
    pw = (mag ** dm) * jnp.where(dm % 2 == 0, 1.0, sgn)
    Tm = jnp.where(d >= 0, pw, 0.0)
    yin = jnp.einsum("...jlc,nl->...jnc", u, Tm,
                     precision=jax.lax.Precision.HIGHEST)
    e = yin[..., :, -1, :]                              # [..., nch, C]
    aL = (mag ** L) * (sgn ** (L % 2) if L % 2 else 1.0)
    Aj = jnp.full((*lead, nch, C), aL, x.dtype)

    Acum, Ecum = jax.lax.associative_scan(_combine, (Aj, e), axis=-2)
    s = Ecum + Acum * y_prev[..., None, :]              # chunk end states
    c = jnp.concatenate([y_prev[..., None, :], s[..., :-1, :]], axis=-2)
    n1 = (n + 1).astype(x.dtype)
    decay = (mag ** n1) * jnp.where((n + 1) % 2 == 0, 1.0, sgn)   # [L]
    y = yin + c[..., :, None, :] * decay[:, None]
    return y.reshape(*lead, T, C)


@struct.dataclass
class OnePole:
    """y[n] = a*y[n-1] + b*x[n].  Lowpass: a = exp(-2 pi fc / fs), b = 1-a."""

    a: jnp.ndarray
    b: jnp.ndarray

    @classmethod
    def lowpass(cls, fc_hz: float, fs: float, dtype=jnp.float32):
        a = float(np.exp(-2.0 * np.pi * fc_hz / fs))
        return cls(a=jnp.asarray(a, dtype), b=jnp.asarray(1.0 - a, dtype))

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((channels,), dtype=dtype)

    def __call__(self, y_prev: jnp.ndarray, x: jnp.ndarray):
        y = _first_order_scan(x, self.a, self.b, y_prev)
        return y[:, -1], y

    def apply_tm(self, y_prev: jnp.ndarray, x: jnp.ndarray):
        """Time-major form: x [..., T, C], y_prev [..., C]."""
        y = _first_order_scan_tm(x, self.a, self.b, y_prev)
        return y[..., -1, :], y


@struct.dataclass
class DCBlock:
    """DC blocker y[n] = x[n] - x[n-1] + a*y[n-1] (Lyons; reference AM path).

    State is (x_prev [C], y_prev [C]).
    """

    a: jnp.ndarray

    @classmethod
    def create(cls, pole: float = 0.995, dtype=jnp.float32):
        return cls(a=jnp.asarray(pole, dtype))

    def init_state(self, channels: int, dtype=jnp.float32):
        z = jnp.zeros((channels,), dtype=dtype)
        return z, z

    def __call__(self, state, x: jnp.ndarray):
        x_prev, y_prev = state
        d = x - jnp.concatenate([x_prev[:, None], x[:, :-1]], axis=-1)
        y = _first_order_scan(d, self.a, 1.0, y_prev)
        return (x[:, -1], y[:, -1]), y

    def apply_tm(self, state, x: jnp.ndarray):
        """Time-major form: x [..., T, C], state pair [..., C] each."""
        x_prev, y_prev = state
        d = x - jnp.concatenate([x_prev[..., None, :], x[..., :-1, :]],
                                axis=-2)
        y = _first_order_scan_tm(d, self.a, 1.0, y_prev)
        return (x[..., -1, :], y[..., -1, :]), y


@struct.dataclass
class Biquad:
    """Second-order IIR section (direct form I) as a parallel recurrence.

    The reference's WDSP uses biquad notch/peak sections for the FM CTCSS
    snotch and audio peaking filters (wdsp/iir.c snotch/speak/mpeak).  The
    feedback pair ``(y[n-1], y[n-2])`` evolves linearly, so the whole block
    is evaluated with one associative scan over 2x2 affine maps — O(log B)
    depth, channels on the vector lanes.

    State: (x1, x2, y1, y2) each [C].
    """

    b0: jnp.ndarray
    b1: jnp.ndarray
    b2: jnp.ndarray
    a1: jnp.ndarray
    a2: jnp.ndarray

    @classmethod
    def notch(cls, f0_hz: float, fs: float, q: float = 30.0):
        """RBJ cookbook notch (zero at f0; parity wdsp/iir.c snotch)."""
        w0 = 2.0 * np.pi * f0_hz / fs
        alpha = np.sin(w0) / (2.0 * q)
        a0 = 1.0 + alpha
        return cls(b0=jnp.float32(1.0 / a0),
                   b1=jnp.float32(-2.0 * np.cos(w0) / a0),
                   b2=jnp.float32(1.0 / a0),
                   a1=jnp.float32(-2.0 * np.cos(w0) / a0),
                   a2=jnp.float32((1.0 - alpha) / a0))

    @classmethod
    def peak(cls, f0_hz: float, fs: float, q: float = 10.0,
             gain_db: float = 12.0):
        """RBJ peaking EQ (parity wdsp/iir.c speak/mpeak)."""
        A = 10.0 ** (gain_db / 40.0)
        w0 = 2.0 * np.pi * f0_hz / fs
        alpha = np.sin(w0) / (2.0 * q)
        a0 = 1.0 + alpha / A
        return cls(b0=jnp.float32((1.0 + alpha * A) / a0),
                   b1=jnp.float32(-2.0 * np.cos(w0) / a0),
                   b2=jnp.float32((1.0 - alpha * A) / a0),
                   a1=jnp.float32(-2.0 * np.cos(w0) / a0),
                   a2=jnp.float32((1.0 - alpha) / a0))

    @classmethod
    def highpass(cls, f0_hz: float, fs: float, q: float = 0.7071):
        w0 = 2.0 * np.pi * f0_hz / fs
        alpha = np.sin(w0) / (2.0 * q)
        c = np.cos(w0)
        a0 = 1.0 + alpha
        return cls(b0=jnp.float32((1.0 + c) / 2.0 / a0),
                   b1=jnp.float32(-(1.0 + c) / a0),
                   b2=jnp.float32((1.0 + c) / 2.0 / a0),
                   a1=jnp.float32(-2.0 * c / a0),
                   a2=jnp.float32((1.0 - alpha) / a0))

    def init_state(self, channels: int, dtype=jnp.float32):
        z = jnp.zeros((channels,), dtype=dtype)
        return (z, z, z, z)

    def __call__(self, state, x: jnp.ndarray):
        x1, x2, y1, y2 = state
        C, B = x.shape
        # feedforward part f[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]
        xm1 = jnp.concatenate([x1[:, None], x[:, :-1]], axis=-1)
        xm2 = jnp.concatenate([x2[:, None], x1[:, None], x[:, :-2]], axis=-1)
        f = self.b0 * x + self.b1 * xm1 + self.b2 * xm2
        # feedback: s[n] = A s[n-1] + [f[n], 0], s = (y[n], y[n-1])
        A = jnp.broadcast_to(
            jnp.stack([jnp.stack([-self.a1, -self.a2]),
                       jnp.stack([jnp.float32(1.0), jnp.float32(0.0)])]),
            (C, B, 2, 2))
        bv = jnp.stack([f, jnp.zeros_like(f)], axis=-1)       # [C, B, 2]

        def combine(lhs, rhs):
            A1, b1v = lhs
            A2, b2v = rhs
            hp = jax.lax.Precision.HIGHEST
            return (jnp.matmul(A2, A1, precision=hp),
                    jnp.einsum("...ij,...j->...i", A2, b1v, precision=hp)
                    + b2v)

        A_cum, b_cum = jax.lax.associative_scan(combine, (A, bv), axis=1)
        s0 = jnp.stack([y1, y2], axis=-1)                     # [C, 2]
        y = (jnp.einsum("cbij,cj->cbi", A_cum, s0,
                        precision=jax.lax.Precision.HIGHEST) + b_cum)[..., 0]
        return (x[:, -1], x[:, -2], y[:, -1], y[:, -2]), y


@struct.dataclass
class Preemphasis:
    """First-difference pre-emphasis y[n] = x[n] - c*x[n-1] (~6 dB/octave,
    parity: microphone.c:452-465).  State is x_prev [C]."""

    c: jnp.ndarray                 # scalar, or [C] per-channel coefficient

    @classmethod
    def create(cls, c: float = 0.97, dtype=jnp.float32):
        return cls(c=jnp.asarray(c, dtype))

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((channels,), dtype=dtype)

    def __call__(self, x_prev: jnp.ndarray, x: jnp.ndarray):
        xm1 = jnp.concatenate([x_prev[:, None], x[:, :-1]], axis=-1)
        c = self.c if self.c.ndim == 0 else self.c[:, None]
        return x[:, -1], x - c * xm1


@struct.dataclass
class PhaseRotator:
    """Cascaded first-order allpass phase rotator (wdsp/iir.c:557-640).

    The WDSP TX graph runs ``nstages`` (default 8) identical allpass
    sections ``y[n] = b0*x[n] + x[n-1] - b0*y[n-1]`` with
    ``b0 = (g-1)/(g+1), g = tan(pi*fc/fs)`` (calc_phrot, iir.c:557-568;
    TXA default fc=338 Hz, 8 stages, TXA.c:71-78) on the real mic audio
    to disperse speech phase and lower the peak-to-average ratio before
    compression.  Each section is the first-order recurrence
    ``y[n] = (-b0)*y[n-1] + w[n]`` with ``w[n] = b0*x[n] + x[n-1]``, so
    the block is nstages sequential associative scans (O(nstages log B)
    depth), channels on the vector lanes.

    State: (x1, y1) each [nstages, C] — the per-stage trailing samples.
    """

    nstages: int = struct.field(pytree_node=False)
    b0: jnp.ndarray

    @classmethod
    def create(cls, fc_hz: float = 338.0, fs: float = 48000.0,
               nstages: int = 8, dtype=jnp.float32):
        g = float(np.tan(np.pi * fc_hz / fs))
        return cls(nstages=int(nstages),
                   b0=jnp.asarray((g - 1.0) / (g + 1.0), dtype))

    def init_state(self, channels: int, dtype=jnp.float32):
        z = jnp.zeros((self.nstages, channels), dtype=dtype)
        return z, z

    def __call__(self, state, x: jnp.ndarray):
        x1, y1 = state
        nx1, ny1 = [], []
        for n in range(self.nstages):
            w = self.b0 * x + jnp.concatenate(
                [x1[n][:, None], x[:, :-1]], axis=-1)
            y = _first_order_scan(w, -self.b0, 1.0, y1[n])
            nx1.append(x[:, -1])
            ny1.append(y[:, -1])
            x = y
        return (jnp.stack(nx1), jnp.stack(ny1)), x
