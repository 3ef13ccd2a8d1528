"""Rate changers: half-band cascades, polyphase interpolators, and the
fractional (Lagrange) resampler.

Parity targets:
- 45-tap half-band decimate-by-2 cascades: filter.c:377-417
  ``quisk_cDecim2HB45`` (chains of these implement /2^a, quisk.c:1731-1843)
- polyphase interpolate / decimate / rational resample: filter.c:131-321,
  wdsp/resample.c
- fractional decimation by 4-point polynomial interpolation:
  quisk.c:579-678 ``fFracDecim/cFracDecim`` (the 24/25 stage landing
  exactly on 48 k, quisk.c:1658, 2654-2659)

Design stance: integer-factor stages are streaming FIRs (ConvFIR, which XLA
lowers to MXU convolutions); interpolation is ``lhs_dilation`` in the same
conv; the fractional stage is a per-output-sample 4-tap inner product whose
sub-sample phases repeat with period L for a rational ratio M/L, so it is a
gather + tiny matmul, not a sequential loop.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from quisk_tpu.ops import design
from quisk_tpu.ops.fir import ConvFIR


@struct.dataclass
class HalfbandDecim2:
    """Decimate-by-2 half-band FIR (default 45 taps / ~120 dB)."""

    fir: ConvFIR

    @classmethod
    def create(cls, block: int, ntaps: int = 45, atten_db: float = 120.0,
               complex_state: bool = True):
        taps = design.halfband(ntaps, atten_db)
        return cls(fir=ConvFIR.create(taps, block, decim=2,
                                      complex_state=complex_state))

    @property
    def block(self):
        return self.fir.block

    def init_state(self, channels: int):
        return self.fir.init_state(channels)

    def __call__(self, state, x):
        return self.fir(state, x)


@struct.dataclass
class Interpolator:
    """Integer upsampler: zero-stuff by L then image-reject FIR, executed
    as ONE polyphase banded-Toeplitz matmul on the MXU.

    Each output phase p is an independent FIR of the *input-rate* signal
    with the tap subset h[p::L]; all L phases share one overlapping-patch
    extraction, so the whole upsample is patches [C, nblk, R+S] x
    M [R+S, R*L] with column r*L+p carrying phase p's (reversed) taps at
    row offset r — a row-major reshape of the product interleaves the
    phases back into time order.  (The previous formulation — feature-1
    ``conv_general_dilated`` with ``lhs_dilation=L`` — never reaches the
    MXU and dominated the TX chain on TPU; CLAUDE.md "Performance facts".)
    Output identical to the dilated conv up to f32 dot reassociation.
    """

    M: jnp.ndarray                 # [R+S, R*L] banded polyphase matrix
    interp: int = struct.field(pytree_node=False)
    ntaps: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    R: int = struct.field(pytree_node=False)
    complex_state: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, interp: int, block: int, fs_out: float,
               atten_db: float = 90.0, complex_state: bool = True):
        taps = design.interpolator(interp, fs_out, atten_db)
        T, L = len(taps), interp
        S = -(-(T - 2) // L) + 1                       # history span
        R = 128
        while block % R:
            R //= 2
        Td = S + 1                                     # phase-kernel reach
        hpad = np.zeros(T + 2 * L, np.float64)
        hpad[:T] = taps
        M = np.zeros((R + S, R * L), np.float32)
        # y[(iR+r)L+p] = sum_d h[L(Td-2-d) + p+1] * patch[r + d], where
        # patch[k] = xe[iR + k] (derived from the dilated-conv alignment:
        # output m of the B*L tail slice reads xe[(m + (S-1)L + 1 + T-1 -
        # j)/L] for j = m mod ... — the band below reproduces it exactly,
        # verified against the conv formulation to f32 roundoff)
        for p in range(L):
            for d in range(Td):
                j = L * (Td - 2 - d) + p + 1
                if 0 <= j < T:
                    for r in range(R):
                        M[r + d, r * L + p] = hpad[j]
        return cls(M=jnp.asarray(M), interp=interp, ntaps=T, block=block,
                   R=R, complex_state=complex_state)

    @property
    def _span(self) -> int:
        # history length so the dilated VALID conv yields >= block*interp
        # outputs: (span-1)*interp >= ntaps-2
        return -(-(self.ntaps - 2) // self.interp) + 1

    def init_state(self, channels: int):
        if self.complex_state:   # host numpy: complex64 cannot cross the
            return np.zeros((channels, self._span), np.complex64)  # boundary
        return jnp.zeros((channels, self._span), dtype=jnp.float32)

    def _matmul_up(self, xe: jnp.ndarray, B: int) -> jnp.ndarray:
        from quisk_tpu.ops import precision as _prec
        S = self._span
        R = self.R
        nblk = B // R
        idx = (jnp.arange(nblk) * R)[:, None] + jnp.arange(R + S)[None, :]

        def go(lhs):
            patches = lhs[:, idx]                     # [*, nblk, R+S]
            y = jax.lax.dot_general(
                patches, self.M, (((2,), (0,)), ((), ())),
                precision=_prec.DECIM_DOT,
                preferred_element_type=jnp.float32)   # [*, nblk, R*L]
            return y.reshape(lhs.shape[0], -1)

        if jnp.iscomplexobj(xe):
            c = xe.shape[0]
            lhs = jnp.concatenate(
                [jnp.real(xe), jnp.imag(xe)], axis=0).astype(jnp.float32)
            out = go(lhs)
            return jax.lax.complex(out[:c], out[c:])
        return go(xe.astype(jnp.float32))

    def __call__(self, hist, x):
        """x [C, B] -> y [C, B*interp]."""
        xe = jnp.concatenate([hist, x], axis=-1)
        y = self._matmul_up(xe, x.shape[-1])
        return xe[..., xe.shape[-1] - self._span:], y


def _lagrange4_weights(mu: np.ndarray) -> np.ndarray:
    """4-point (cubic Lagrange) interpolation weights for fractional offset
    mu in [0,1) between sample index 1 and 2 of a 4-sample window."""
    m = mu
    w0 = -m * (m - 1.0) * (m - 2.0) / 6.0
    w1 = (m + 1.0) * (m - 1.0) * (m - 2.0) / 2.0
    w2 = -(m + 1.0) * m * (m - 2.0) / 2.0
    w3 = (m + 1.0) * m * (m - 1.0) / 6.0
    return np.stack([w0, w1, w2, w3], axis=-1)


@struct.dataclass
class FracDecim:
    """Rational fractional decimator by M/L (output rate = input * L / M).

    For each output n the read position is ``p = n * M/L``; the integer parts
    advance in a fixed repeating pattern of period L and the fractional parts
    cycle through L fixed phases, so weights are a constant [L, 4] table and
    the kernel is a static gather + length-4 inner product.  Matches
    quisk.c:579-678 (4-point polynomial interpolation) with exact rational
    phase bookkeeping instead of its accumulated float ``fdecim`` counter.
    """

    weights: jnp.ndarray                                  # [n_out, 4] f32
    gather_idx: jnp.ndarray                               # [n_out] int32
    ratio_num: int = struct.field(pytree_node=False)      # M (input step)
    ratio_den: int = struct.field(pytree_node=False)      # L
    block: int = struct.field(pytree_node=False)          # input block
    n_out: int = struct.field(pytree_node=False)
    hist_len: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, ratio: Fraction | float, block: int):
        """ratio = input_rate / output_rate (> 1 decimates), e.g. 25/24."""
        r = Fraction(ratio).limit_denominator(1 << 16)
        M, L = r.numerator, r.denominator
        # choose block a multiple of M so each block yields exactly
        # block * L / M outputs and the phase pattern repeats per block
        if (block * L) % M:
            raise ValueError(f"block {block} must make block*L divisible by M "
                             f"(M={M}, L={L})")
        n_out = block * L // M
        # output n reads at position n*M/L (in samples, block-relative);
        # window spans floor(p)-1 .. floor(p)+2, so keep 2 history samples
        # before the block plus 1 lookahead handled by delaying output by
        # one sample: define p_n = (n*M)/L - 1 (one-sample latency).
        num = np.arange(n_out, dtype=np.int64) * M
        ip = num // L                       # integer part
        mu = (num - ip * L).astype(np.float64) / L
        hist_len = 3                         # covers idx-1..idx+2 at p-1
        idx = ip + hist_len - 2              # gather start (idx-1 in stream)
        w = _lagrange4_weights(mu).astype(np.float32)
        return cls(weights=jnp.asarray(w), gather_idx=jnp.asarray(idx, jnp.int32),
                   ratio_num=M, ratio_den=L, block=block, n_out=n_out,
                   hist_len=hist_len)

    def init_state(self, channels: int):
        # host numpy: complex64 cannot cross the host<->device boundary
        return np.zeros((channels, self.hist_len), np.complex64)

    def __call__(self, hist, x):
        xe = jnp.concatenate([hist, x.astype(jnp.complex64)], axis=-1)
        # windows [C, n_out, 4]
        win = xe[:, self.gather_idx[:, None] + jnp.arange(4)[None, :]]
        y = jnp.einsum("cnk,nk->cn", win, self.weights.astype(jnp.complex64),
                       precision=jax.lax.Precision.HIGHEST)
        new_hist = xe[..., xe.shape[-1] - self.hist_len:]
        return new_hist, y
