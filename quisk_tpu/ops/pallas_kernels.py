"""Pallas TPU kernels for the chain front-end.

The hot front half of the RX chain is tune (NCO phasor + complex multiply)
followed by the first decimating FIR — together they touch the full-rate
input twice in HBM when expressed as separate XLA ops.  The fused kernel
here does both in one pass: each program DMAs an overlapping input window
into VMEM, synthesizes the NCO phasor in-register from the uint32 phase
word (drift-free integer phase, as quisk_tpu.ops.nco), applies the mix,
forms the blocked-Toeplitz patch matrices and contracts them with the
constant tap matrix on the MXU (the MatmulFIR formulation).

Layout per program (grid = C/TC x N/(R*TN)):
  ext [C, B + T - 1]  raw input with T-1 history samples in front
  window W = R*s*TN + T - 1 samples -> TN dots of [TC, K] x [K, R]
State carried by the wrapper op: (phase0 [C] uint32 at ext[0], raw history
[C, T-1] complex) — history is raw (pre-mix); the kernel re-tunes it with
the phase captured at its first sample, so block boundaries are exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI_OVER_2_32 = np.float32(2.0 * np.pi / 4294967296.0)


def _fused_kernel(word_ref, phase_ref, xr_hbm, xi_hbm, M_ref, *rest,
                  W, K, R, TN, s, TC, gained=False):
    if gained:
        (gw_hbm, U_ref, yr_ref, yi_ref, xr_s, xi_s, g_s, sems) = rest
    else:
        (yr_ref, yi_ref, xr_s, xi_s, sems) = rest
        gw_hbm = U_ref = g_s = None
    ci = pl.program_id(0)
    ti = pl.program_id(1)
    col = ti * (R * s * TN)
    row = ci * TC
    Wp = xr_s.shape[-1]              # W rounded up to the 128-lane tiling

    cp_r = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(row, TC), pl.ds(col, Wp)], xr_s, sems.at[0])
    cp_i = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(row, TC), pl.ds(col, Wp)], xi_s, sems.at[1])
    cp_r.start()
    cp_i.start()
    if gained:
        GWp = g_s.shape[-1]
        cp_g = pltpu.make_async_copy(
            gw_hbm.at[pl.ds(row, TC), pl.ds(ti * GWp, GWp)], g_s,
            sems.at[2])
        cp_g.start()
        cp_g.wait()
    cp_r.wait()
    cp_i.wait()

    # NCO mix IN PLACE, in lane chunks: a whole-window formulation needs
    # ~7 live [TC, Wp] temporaries (iota, phase, angle, cos, sin, mixed
    # re/im) — 24 MB of scoped VMEM at the fused-cascade window depths,
    # past the 16 MB stack limit.  Chunking keeps the live set to the two
    # DMA scratch buffers (overwritten with the mixed signal) plus
    # [TC, CH]-sized phasor temporaries.
    #
    # Phase words are int32: two's-complement wraparound equals uint32
    # mod-2^32 arithmetic, and the angle scale maps 2^32 -> 2pi, so the
    # signed interpretation only shifts angles by multiples of 2pi
    # (Mosaic cannot cast uint32->f32).
    CH = 1024
    for c0 in range(0, Wp, CH):
        ch = min(CH, Wp - c0)        # tail chunk (Wp is only 128-aligned)
        n = (jax.lax.broadcasted_iota(jnp.int32, (TC, ch), 1)
             + jnp.int32(col + c0))
        ph = phase_ref[:] + word_ref[:] * n       # [TC,1] bcast * [TC,ch]
        ang = ph.astype(jnp.float32) * _TWO_PI_OVER_2_32
        c = jnp.cos(ang)
        sn = jnp.sin(ang)
        a = xr_s[:, c0:c0 + ch]
        b = xi_s[:, c0:c0 + ch]
        if gained:
            # noise-blanker gain on the 16:1 coarse grid, upsampled by a
            # constant 2-diagonal linear-interp matrix on the MXU; rows
            # beyond the tail chunk's group span are zero in U, so the
            # fixed-width 66-group slice is safe
            gsl = g_s[:, (c0 // 16):(c0 // 16) + 66]
            g = jnp.dot(gsl, U_ref[:, :ch],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            a = a * g
            b = b * g
        # mix down: x * conj(e^{j ang})
        xr_s[:, c0:c0 + ch] = a * c + b * sn
        xi_s[:, c0:c0 + ch] = b * c - a * sn
    tr = xr_s
    tiq = xi_s

    M = M_ref[:]
    for j in range(TN):
        a = j * R * s
        pr = tr[:, a: a + K]
        pi = tiq[:, a: a + K]
        # Mosaic's default MXU dot truncates f32 inputs to bf16 (measured
        # 2e-3 relative error — 55 dB, far below the filter's stopband);
        # precision.DECIM_DOT picks the f32-emulation tier (trace-time).
        # Mosaic cannot lower Precision.HIGH — fall back to HIGHEST here
        # (the XLA MatmulFIR stages do honor HIGH).
        from quisk_tpu.ops import precision as _prec
        kprec = (_prec.DECIM_DOT
                 if _prec.DECIM_DOT != jax.lax.Precision.HIGH
                 else jax.lax.Precision.HIGHEST)
        yr_ref[:, j * R:(j + 1) * R] = jnp.dot(
            pr, M, precision=kprec,
            preferred_element_type=jnp.float32)
        yi_ref[:, j * R:(j + 1) * R] = jnp.dot(
            pi, M, precision=kprec,
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("W", "K", "R", "TN", "s", "TC",
                                    "interpret"))
def _fused_call(word2d, phase2d, xr, xi, M, gwin=None, U=None, *,
                W, K, R, TN, s, TC, interpret=False):
    C, L = xr.shape
    N = (L - (K - R * s)) // s            # outputs: (L - (T-1)) / s
    grid = (C // TC, N // (R * TN))
    # Mosaic DMA slices must be 128-lane aligned: round the window up and
    # pad the input so every tile's padded window is in bounds
    Wp = -(-W // 128) * 128
    pad = (grid[1] - 1) * (R * s * TN) + Wp - L
    if pad > 0:
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
    gained = gwin is not None
    kern = functools.partial(_fused_kernel, W=W, K=K, R=R, TN=TN, s=s,
                             TC=TC, gained=gained)
    in_specs = [
        pl.BlockSpec((TC, 1), lambda ci, ti: (ci, 0),
                     memory_space=pltpu.VMEM),      # word
        pl.BlockSpec((TC, 1), lambda ci, ti: (ci, 0),
                     memory_space=pltpu.VMEM),      # phase
        pl.BlockSpec(memory_space=pltpu.ANY),        # xr (manual DMA)
        pl.BlockSpec(memory_space=pltpu.ANY),        # xi
        pl.BlockSpec((K, R), lambda ci, ti: (0, 0),
                     memory_space=pltpu.VMEM),      # M
    ]
    scratch = [
        pltpu.VMEM((TC, Wp), jnp.float32),
        pltpu.VMEM((TC, Wp), jnp.float32),
    ]
    operands = [word2d, phase2d, xr, xi, M]
    if gained:
        GWp = gwin.shape[-1] // grid[1]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),    # gwin (manual DMA)
            pl.BlockSpec((U.shape[0], U.shape[1]), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),   # interp matrix
        ]
        scratch.append(pltpu.VMEM((TC, GWp), jnp.float32))
        operands += [gwin, U]
    scratch.append(pltpu.SemaphoreType.DMA((3 if gained else 2,)))
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TC, R * TN), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, R * TN), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, N), jnp.float32),
            jax.ShapeDtypeStruct((C, N), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return yr, yi


@struct.dataclass
class FusedTuneDecimate:
    """NCO mix + first decimating FIR in one Pallas pass.

    Drop-in for (NCO, first ConvFIR/MatmulFIR stage): state is
    (phase0 [C] uint32 at the first history sample, raw history
    [C, T-1] complex64 host numpy).  Output identical to mixing the block
    then filtering with streaming history (same dot order as MatmulFIR).

    Constraints: C % 128 == 0, (block/decim) % (128*TN) == 0.

    With ``with_gain=True`` the kernel additionally accepts a noise-
    blanker gain on the 16:1 coarse grid (``gain16`` in __call__,
    covering ext = [hist | x]) and applies it to the raw window in VMEM
    right before the NCO mix — the blanker's separate full-rate
    apply pass (read x + write the blanked block) disappears.
    """

    M: jnp.ndarray                 # [K, R]
    word: jnp.ndarray              # [C] uint32
    U: jnp.ndarray | None          # [66, 1024] coarse-gain interp matrix
    ntaps: int = struct.field(pytree_node=False)
    block: int = struct.field(pytree_node=False)
    decim: int = struct.field(pytree_node=False)
    R: int = struct.field(pytree_node=False)
    TN: int = struct.field(pytree_node=False)
    TC: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, taps, tune_hz, sample_rate: float, block: int,
               decim: int, channels: int, TN: int = 8, TC: int = 128,
               with_gain: bool = False):
        from quisk_tpu.ops.nco import freq_word
        taps = np.asarray(taps, np.float64)
        T = taps.shape[-1]
        R = 128
        N = block // decim
        # TN: largest tile that stays 128-aligned AND fits the scoped-VMEM
        # stack (16 MB): live set = two (re, im) scratch windows (the mix
        # overwrites them in place) + the [K, R] tap matrix + ~6 chunk
        # temporaries of the in-place NCO loop.  Deep fused cascades reach
        # T ~ 1400, W ~ 4000 floats per channel row.
        K_dot = R * decim + T - 1
        temps = 6 * TC * 1024 * 4

        def gain_vmem(tn):
            if not with_gain:
                return 0
            wp = -(-(R * decim * tn + T - 1) // 128) * 128
            gwp = -(-(wp // 16 + 66) // 128) * 128
            return gwp * TC * 4 + 66 * 1024 * 4
        while TN > 1 and (N % (R * TN)
                          or ((R * decim * TN + T - 1) * TC * 8
                              + K_dot * R * 4 + temps
                              + gain_vmem(TN)) > (14 << 20)):
            TN //= 2
        if channels % TC or N % (R * TN):
            raise ValueError("needs C % 128 == 0 and (block/decim) % 128 == 0")
        K = R * decim + T - 1
        h_rev = taps[::-1]
        M = np.zeros((K, R), np.float32)
        for r in range(R):
            M[r * decim: r * decim + T, r] = h_rev
        w = freq_word(np.broadcast_to(np.atleast_1d(tune_hz), (channels,)),
                      sample_rate)
        U = None
        if with_gain:
            # ext sample e sits at offset (e+off) % 16 of coarse group
            # (e+off)//16, where off re-aligns the T-1 history samples
            # onto the stream's 16-grid; linear interp between group g
            # (valued at its first sample) and g+1
            off = (-(T - 1)) % 16
            Um = np.zeros((66, 1024), np.float32)
            for j in range(1024):
                gg, p = divmod(j + off, 16)
                Um[gg, j] += 1.0 - p / 16.0
                Um[gg + 1, j] += p / 16.0
            U = jnp.asarray(Um)
        return cls(M=jnp.asarray(M), word=w, U=U, ntaps=T, block=block,
                   decim=decim, R=R, TN=TN, TC=TC)

    @property
    def gain_off(self) -> int:
        return (-(self.ntaps - 1)) % 16

    @property
    def gain_hist_groups(self) -> int:
        """Coarse groups covering the T-1 raw history samples."""
        return (self.ntaps - 1 + self.gain_off) // 16

    def init_state(self, channels: int):
        # phase is at ext[0] = the first history sample; a fresh stream has
        # phase 0 at its first real sample = history length T-1 later, so
        # start the history phase at -(T-1)*word (exact uint32 wrap)
        ph0 = (-(np.asarray(self.word).astype(np.int64)
                 * (self.ntaps - 1)) % (1 << 32)).astype(np.uint32)
        return (jnp.asarray(ph0),
                np.zeros((channels, self.ntaps - 1), np.complex64))

    def __call__(self, state, x: jnp.ndarray, gain16=None):
        phase0, hist = state
        ext = jnp.concatenate([hist, x], axis=-1)
        xr = jnp.real(ext).astype(jnp.float32)
        xi = jnp.imag(ext).astype(jnp.float32)
        K = self.R * self.decim + self.ntaps - 1
        W = self.R * self.decim * self.TN + self.ntaps - 1
        word_i32 = jax.lax.bitcast_convert_type(self.word, jnp.int32)
        phase_i32 = jax.lax.bitcast_convert_type(phase0, jnp.int32)
        gwin = U = None
        if gain16 is not None:
            if self.U is None:
                raise ValueError("create(with_gain=True) required for gain16")
            C = x.shape[0]
            GH = self.gain_hist_groups
            GB = x.shape[-1] // 16
            if gain16.shape[-1] != GH + GB:
                raise ValueError(
                    f"gain16 must cover ext: want {GH + GB} groups, "
                    f"got {gain16.shape[-1]}")
            # per-tile contiguous gain windows so the kernel's DMA starts
            # stay 128-lane aligned (a static-index gather; cheap — the
            # coarse grid is 1/16 of the raw block)
            Wp = -(-W // 128) * 128
            GWp = -(-(Wp // 16 + 66) // 128) * 128
            n_t = (self.block // self.decim) // (self.R * self.TN)
            starts = (np.arange(n_t) * (self.R * self.decim * self.TN)
                      ) // 16
            gp = jnp.pad(gain16, ((0, 0), (0, starts[-1] + GWp
                                           - gain16.shape[-1])),
                         mode="edge")
            idx = starts[:, None] + np.arange(GWp)[None, :]
            gwin = gp[:, idx].reshape(C, n_t * GWp)
            U = self.U
        yr, yi = _fused_call(
            word_i32[:, None], phase_i32[:, None], xr, xi, self.M,
            gwin, U,
            W=W, K=K, R=self.R, TN=self.TN, s=self.decim, TC=self.TC,
            interpret=jax.default_backend() != "tpu")
        new_hist = ext[:, ext.shape[-1] - (self.ntaps - 1):]
        new_phase = phase0 + self.word * jnp.uint32(self.block)
        return (new_phase, new_hist), jax.lax.complex(yr, yi)

    # NumPy reference for conformance tests (tune-then-filter semantics)
    def reference(self, state, x: np.ndarray):
        phase0, hist = np.asarray(state[0]), np.asarray(state[1])
        ext = np.concatenate([hist, np.asarray(x)], axis=-1)
        C, L = ext.shape
        n = np.arange(L, dtype=np.uint64)
        ph = (phase0[:, None].astype(np.uint64)
              + np.asarray(self.word)[:, None].astype(np.uint64) * n) % (1 << 32)
        ang = ph.astype(np.float64) * (2.0 * np.pi / 2**32)
        tuned = ext * np.exp(-1j * ang)
        T = self.ntaps
        taps = None
        # reconstruct taps from M's first column (h reversed at offset 0)
        h_rev = np.asarray(self.M)[:T, 0]
        y = np.zeros((C, self.block // self.decim), np.complex128)
        for k in range(y.shape[-1]):
            seg = tuned[:, k * self.decim: k * self.decim + T]
            y[:, k] = seg @ h_rev
        return y
