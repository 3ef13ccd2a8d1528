"""Matmul DFT: Cooley-Tukey factored onto the MXU.

TPU FFT is the documented weak unit (~0.1-0.2 TFLOP/s effective on this
chip, CLAUDE.md) while f32 matmuls with ``Precision.HIGHEST`` run tens of
TFLOP/s.  For transform sizes that factor as K = K1*K2 the four-step
algorithm turns one K-point (I)DFT into two batched small matmuls plus an
elementwise twiddle:

  n = K2*n1 + n2,  c = c1 + K1*c2
  A[n2, c1] = sum_n1 v[K2 n1 + n2] W_K1[n1 c1]        (matmul over n1)
  B[n2, c1] = A[n2, c1] * W_K[n2 c1]                  (twiddle)
  Y[c2, c1] = sum_n2 B[n2, c1] W_K2[n2 c2]            (matmul over n2)
  y[c1 + K1 c2] = Y[c2, c1]

~2*K*(K1+K2) complex MACs per transform vs the FFT's ~K log2 K — 10-20x
more FLOPs, but the MXU's throughput advantage over the TPU FFT unit is
larger (A/B numbers in BENCH_DETAIL.md; this is the VERDICT r3 item-3
rewrite, same playbook as the banded-matmul widening conv).

Complex arithmetic is done as explicit real matmuls with the
3-multiplication (Karatsuba) split — with HIGHEST-precision f32 dots each
saved matmul is a real 25% of the MXU passes.

Parity note: the reference leans on FFTW everywhere (wdsp/fftcv_mults
fir.c:29, analyzer.c); this module exists because the TPU's fast unit for
the same math is the systolic array, not a dedicated FFT engine.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

_HI = jax.lax.Precision.HIGHEST


def plan_split(K: int) -> tuple[int, int]:
    """Balanced K = K1*K2 factor split (K1 <= K2), preferring near-square
    factors so both matmuls tile the 128x128 MXU well."""
    best = None
    for k1 in range(int(np.sqrt(K)), 0, -1):
        if K % k1 == 0:
            best = (k1, K // k1)
            break
    if best is None or best[0] == 1:
        raise ValueError(f"K={K} has no nontrivial factor split")
    return best


def _cmatmul(ar, ai, br_bi, pattern):
    """(ar + i*ai) x (br + i*bi) with 3 HIGHEST-precision real matmuls
    (Karatsuba split); ``pattern`` is the einsum contraction."""
    br, bi, bsum = br_bi
    t1 = jnp.einsum(pattern, ar, br, precision=_HI)
    t2 = jnp.einsum(pattern, ai, bi, precision=_HI)
    t3 = jnp.einsum(pattern, ar + ai, bsum, precision=_HI)
    return t1 - t2, t3 - t1 - t2


@struct.dataclass
class MatmulDFT:
    """K-point (I)DFT over the trailing axis as two MXU matmuls.

    ``inverse=True`` computes the UNNORMALIZED inverse (= K * ifft), the
    form the PFB commutator wants; ``inverse=False`` the forward DFT.
    Output ordering matches numpy's fft exactly.
    """

    w1: tuple          # (re, im, re+im) of [K1, K1] stage-1 matrix
    w2: tuple          # (re, im, re+im) of [K2, K2] stage-2 matrix
    tw: tuple          # (re, im) of [K2, K1] twiddle
    K: int = struct.field(pytree_node=False)
    K1: int = struct.field(pytree_node=False)
    K2: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, K: int, inverse: bool = True,
               split: tuple[int, int] | None = None):
        K1, K2 = split or plan_split(K)
        if K1 * K2 != K:
            raise ValueError("split must multiply to K")
        s = 1.0 if inverse else -1.0
        n1 = np.arange(K1)
        n2 = np.arange(K2)
        W1 = np.exp(s * 2j * np.pi * np.outer(n1, n1) / K1)
        W2 = np.exp(s * 2j * np.pi * np.outer(n2, n2) / K2)
        T = np.exp(s * 2j * np.pi * np.outer(n2, n1) / K)
        def pack(M):
            r = jnp.asarray(M.real, jnp.float32)
            i = jnp.asarray(M.imag, jnp.float32)
            return (r, i, r + i)
        return cls(w1=pack(W1), w2=pack(W2),
                   tw=(jnp.asarray(T.real, jnp.float32),
                       jnp.asarray(T.imag, jnp.float32)),
                   K=K, K1=K1, K2=K2)

    def apply_ri(self, vr: jnp.ndarray, vi: jnp.ndarray):
        """Real/imag planes in, real/imag planes out (trailing axis K)."""
        lead = vr.shape[:-1]
        ar = vr.reshape(*lead, self.K1, self.K2)
        ai = vi.reshape(*lead, self.K1, self.K2)
        # stage 1: contract n1 -> [..., K2(n2), K1(c1)]
        br, bi = _cmatmul(ar, ai, self.w1, "...nk,nc->...kc")
        # twiddle (elementwise [K2, K1])
        twr, twi = self.tw
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        # stage 2: contract n2 -> [..., K2(c2), K1(c1)]; flat index
        # c = c1 + K1*c2 so that layout reshapes straight to [..., K]
        yr, yi = _cmatmul(cr, ci, self.w2, "...nc,nm->...mc")
        return yr.reshape(*lead, self.K), yi.reshape(*lead, self.K)

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        yr, yi = self.apply_ri(jnp.real(v), jnp.imag(v))
        return jax.lax.complex(yr, yi)

    def apply_real(self, x: jnp.ndarray):
        """Real input [..., K] -> full K-bin (re, im) planes.  Stage 1
        needs only two real matmuls (imag operand is zero)."""
        lead = x.shape[:-1]
        ar = x.reshape(*lead, self.K1, self.K2)
        w1r, w1i, _ = self.w1
        br = jnp.einsum("...nk,nc->...kc", ar, w1r, precision=_HI)
        bi = jnp.einsum("...nk,nc->...kc", ar, w1i, precision=_HI)
        twr, twi = self.tw
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        yr, yi = _cmatmul(cr, ci, self.w2, "...nc,nm->...mc")
        return yr.reshape(*lead, self.K), yi.reshape(*lead, self.K)

    def apply_ri_real_out(self, vr: jnp.ndarray, vi: jnp.ndarray):
        """(re, im) planes in [..., K] -> REAL plane of the transform
        only (two stage-2 matmuls instead of three)."""
        lead = vr.shape[:-1]
        ar = vr.reshape(*lead, self.K1, self.K2)
        ai = vi.reshape(*lead, self.K1, self.K2)
        br, bi = _cmatmul(ar, ai, self.w1, "...nk,nc->...kc")
        twr, twi = self.tw
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        w2r, w2i, _ = self.w2
        yr = (jnp.einsum("...nc,nm->...mc", cr, w2r, precision=_HI)
              - jnp.einsum("...nc,nm->...mc", ci, w2i, precision=_HI))
        return yr.reshape(*lead, self.K)


@struct.dataclass
class MatmulRDFT:
    """N-point real-input DFT pair (rfft/irfft) as plain MXU matmuls.

    For the 512-pt STFTs (SpectralNR/SpectralNoiseBlanker/SSB squelch)
    the transform is small enough that a single [N, N/2+1] matmul beats
    the TPU's FFT unit despite ~20x the FLOPs (same rationale as
    MatmulDFT; A/B in BENCH_DETAIL).  Forward returns (re, im) planes —
    callers that only need |X|^2 never materialize a complex array.
    """

    fr: jnp.ndarray      # [N, F] cos(2 pi n k / N)
    fi: jnp.ndarray      # [N, F] -sin(2 pi n k / N)
    br: jnp.ndarray      # [F, N] inverse cos basis (c_k/N folded in)
    bi: jnp.ndarray      # [F, N] inverse -sin basis
    N: int = struct.field(pytree_node=False)
    F: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, N: int):
        F = N // 2 + 1
        n = np.arange(N)[:, None]
        k = np.arange(F)[None, :]
        ang = 2.0 * np.pi * n * k / N
        # inverse: y[n] = 1/N sum_k c_k (Yr cos - Yi sin), c = 2 except
        # the DC and Nyquist bins (Hermitian fold of the full spectrum)
        c = np.full(F, 2.0)
        c[0] = 1.0
        if N % 2 == 0:
            c[-1] = 1.0
        return cls(fr=jnp.asarray(np.cos(ang), jnp.float32),
                   fi=jnp.asarray(-np.sin(ang), jnp.float32),
                   br=jnp.asarray((c[:, None] / N) * np.cos(ang.T),
                                  jnp.float32),
                   bi=jnp.asarray(-(c[:, None] / N) * np.sin(ang.T),
                                  jnp.float32),
                   N=N, F=F)

    def rfft_ri(self, x: jnp.ndarray):
        """x [..., N] real -> (Xr, Xi) [..., F]."""
        Xr = jnp.einsum("...n,nk->...k", x, self.fr, precision=_HI)
        Xi = jnp.einsum("...n,nk->...k", x, self.fi, precision=_HI)
        return Xr, Xi

    def irfft_ri(self, Yr: jnp.ndarray, Yi: jnp.ndarray) -> jnp.ndarray:
        """(Yr, Yi) [..., F] -> y [..., N] real (matches np.fft.irfft)."""
        return (jnp.einsum("...k,kn->...n", Yr, self.br, precision=_HI)
                + jnp.einsum("...k,kn->...n", Yi, self.bi, precision=_HI))


@struct.dataclass
class CTRDFT:
    """rfft/irfft pair over the trailing axis via the two-stage
    Cooley-Tukey MatmulDFT — for N (1024-4096+) where the single-stage
    [N, N/2+1] basis of MatmulRDFT costs ~N/(K1+K2) times more MACs.

    Forward runs the real-input full-K DFT and slices the half spectrum;
    inverse Hermitian-extends the half spectrum and keeps only the real
    output plane.  Matches np.fft.rfft/irfft ordering and scaling.
    """

    fwd: MatmulDFT
    inv: MatmulDFT
    N: int = struct.field(pytree_node=False)
    F: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, N: int, split: tuple[int, int] | None = None):
        if N % 2:
            raise ValueError("CTRDFT needs even N")
        return cls(fwd=MatmulDFT.create(N, inverse=False, split=split),
                   inv=MatmulDFT.create(N, inverse=True, split=split),
                   N=N, F=N // 2 + 1)

    def rfft_ri(self, x: jnp.ndarray):
        yr, yi = self.fwd.apply_real(x)
        return yr[..., : self.F], yi[..., : self.F]

    def irfft_ri(self, Yr: jnp.ndarray, Yi: jnp.ndarray) -> jnp.ndarray:
        # Hermitian extension: bins N/2+1 .. N-1 = conj of bins N/2-1 .. 1
        fr = jnp.concatenate([Yr, Yr[..., 1:-1][..., ::-1]], axis=-1)
        fi = jnp.concatenate([Yi, -Yi[..., 1:-1][..., ::-1]], axis=-1)
        return self.inv.apply_ri_real_out(fr, fi) * (1.0 / self.N)


def make_rdft(N: int, ct_threshold: int = 1024):
    """The winning rfft/irfft formulation for size N on this TPU:
    single-stage MatmulRDFT below ``ct_threshold`` (contraction dim N
    tiles the 128-lane MXU well and the basis fits VMEM), two-stage
    Cooley-Tukey above it (A/B'd at 1024/4096 in BENCH_DETAIL)."""
    if N < ct_threshold:
        return MatmulRDFT.create(N)
    return CTRDFT.create(N)
