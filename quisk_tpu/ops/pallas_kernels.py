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
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI_OVER_2_32 = np.float32(2.0 * np.pi / 4294967296.0)


class _NBSpec(NamedTuple):
    """Static plan for fused noise-blanker DETECTION inside the front
    kernel (VERDICT r3 item 1): the blanker's only remaining cost was one
    full-rate HBM read of the raw IQ to compute the 16:1 coarse gain —
    samples the kernel already holds in VMEM.  The window is extended by
    an LB-sample halo in front (moving-average + widening lookback) and
    LA behind (widening lookahead), group magnitude sums/maxes are
    reduced in-kernel (MXU one-hot dots + a shift-max tree), and the
    coarse gain comes out both as the per-sample multiplier (via the
    existing U interp dot) and as a [C, B/16] side output that the chain
    carries as next block's history gain."""

    LB: int          # front halo, 128-aligned (>= 16*HC + avg_win + 16)
    LA: int          # back halo, 128-aligned (>= 16*HC + 32)
    GH: int          # coarse groups covering the T-1 raw history samples
    HC: int          # widening half-window in coarse groups
    W4: int          # moving-average window in coarse groups (avg_win/16)
    avg_win: int     # moving-average window in raw samples
    j0: int          # scratch index of the first x-group boundary
    Gq: int          # whole coarse groups in the scratch window
    Gp: int          # allocated (padded) stats width
    delta: int       # slab index k -> stats index r = k + delta
    base16: int      # gout index m -> stats index r = m + base16
    GB: int          # total x-groups in the block (B/16)
    GWp: int         # gain-slab width (matches the U contract)
    Gout: int        # output gain groups per tile (R*s*TN/16)
    GoutP: int       # Gout rounded up to the 128-lane tiling
    rc: tuple        # coarse raised-cosine widening taps (len 2*HC+1)


def _shift_lanes(a, d, TC):
    """a[:, r] -> a[:, r + d] with zero fill (d may be negative)."""
    n = a.shape[-1]
    z = jnp.zeros((TC, abs(d)), jnp.float32)
    if d == 0:
        return a
    if d > 0:
        return jnp.concatenate([a[:, d:], z], axis=-1)
    return jnp.concatenate([z, a[:, :n + d]], axis=-1)


def _nb_detect_in_kernel(nb, ti, col, TC, xr_s, xi_s, g_s, S_s, X_s,
                         gh_ref, on_ref, lim_ref, G16_ref, Sel_ref,
                         go_ref):
    """Compute the coarse blanker gain from the window already in VMEM
    (quisk.c:680 semantics on the 16:1 grid — identical math to
    NoiseBlanker._coarse_gain, asserted by tests/test_pallas_fused.py)."""
    # group stats: sums via a one-hot MXU dot, maxes via a shift-max tree
    # + a selection dot (Mosaic has no 16-wide lane reduction)
    S_s[:] = jnp.zeros_like(S_s)
    X_s[:] = jnp.zeros_like(X_s)
    GCH = 32                       # groups per chunk (512 lanes)
    for k in range(0, nb.Gq, GCH):
        gc = min(GCH, nb.Gq - k)
        c0 = nb.j0 + 16 * k
        a = xr_s[:, c0:c0 + 16 * gc]
        b = xi_s[:, c0:c0 + 16 * gc]
        m = jnp.sqrt(a * a + b * b)
        S_s[:, k:k + gc] = jnp.dot(
            m, G16_ref[:16 * gc, :gc],
            preferred_element_type=jnp.float32)
        t = m
        for d in (8, 4, 2, 1):
            t = jnp.maximum(t, _shift_lanes(t, d, TC))
        X_s[:, k:k + gc] = jnp.dot(
            t, Sel_ref[:16 * gc, :gc],
            preferred_element_type=jnp.float32)
    S = S_s[:]
    X = X_s[:]
    # trailing moving average over avg_win raw samples (W4 groups)
    acc = S
    for d in range(1, nb.W4):
        acc = acc + _shift_lanes(S, -d, TC)
    avg = acc * (1.0 / nb.avg_win)
    thr = lim_ref[0, 0] * jnp.maximum(avg, 1e-12)
    # pulse detection, masked to real x-groups (zero outside the block —
    # the host path zero-pads pc the same way)
    gfirst = col // 16 - nb.base16
    ga = (jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
          + jnp.int32(gfirst))
    inx = jnp.logical_and(ga >= 0, ga < nb.GB)
    pulse = jnp.where(jnp.logical_and(X > thr, inx), 1.0, 0.0)
    # raised-cosine widening on the coarse grid (static taps)
    pw = jnp.zeros_like(pulse)
    for i, w in enumerate(nb.rc):
        pw = pw + np.float32(w) * _shift_lanes(pulse, i - nb.HC, TC)
    gain = jnp.clip(1.0 - pw, 0.0, 1.0)
    on = on_ref[:]                     # [TC, 1] stage toggle as data
    gain = 1.0 + on * (gain - 1.0)
    # per-sample gain slab for the U interp dot: slab k <-> stats r=k+delta;
    # history region (ext-group < GH) takes last block's carried gain
    slab = gain[:, nb.delta:nb.delta + nb.GWp]
    kk = (jax.lax.broadcasted_iota(jnp.int32, (TC, nb.GWp), 1)
          + jnp.int32(col // 16))
    hmask = jnp.where(kk < nb.GH, 1.0, 0.0)
    g_s[:] = hmask * gh_ref[:] + (1.0 - hmask) * slab
    # coarse-gain side output (the chain's next-block history carry);
    # the block is 128-lane padded — the host slices the Gout real groups
    go_ref[:] = gain[:, nb.base16:nb.base16 + nb.GoutP]


def _fused_kernel(word_ref, phase_ref, xr_hbm, xi_hbm, M_ref, *rest,
                  W, K, R, TN, s, TC, gained=False, nb=None):
    if nb is not None:
        (gh_ref, U_ref, on_ref, lim_ref, G16_ref, Sel_ref,
         yr_ref, yi_ref, go_ref,
         xr_s, xi_s, g_s, S_s, X_s, sems) = rest
        gw_hbm = None
    elif gained:
        (gw_hbm, U_ref, yr_ref, yi_ref, xr_s, xi_s, g_s, sems) = rest
    else:
        (yr_ref, yi_ref, xr_s, xi_s, sems) = rest
        gw_hbm = U_ref = g_s = None
    ci = pl.program_id(0)
    ti = pl.program_id(1)
    col = ti * (R * s * TN)
    row = ci * TC
    # with fused NB detection the scratch window carries an LB-sample
    # halo in front and LA behind (the input is front-padded by LB on the
    # host, so the DMA start stays `col` and stays 128-aligned); the
    # FIR/NCO region is scratch [LB, LB+Wp)
    LB = nb.LB if nb is not None else 0
    Wp = xr_s.shape[-1] - (LB + (nb.LA if nb is not None else 0))

    cp_r = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(row, TC), pl.ds(col, xr_s.shape[-1])], xr_s,
        sems.at[0])
    cp_i = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(row, TC), pl.ds(col, xi_s.shape[-1])], xi_s,
        sems.at[1])
    cp_r.start()
    cp_i.start()
    if gained and nb is None:
        GWp = g_s.shape[-1]
        cp_g = pltpu.make_async_copy(
            gw_hbm.at[pl.ds(row, TC), pl.ds(ti * GWp, GWp)], g_s,
            sems.at[2])
        cp_g.start()
        cp_g.wait()
    cp_r.wait()
    cp_i.wait()

    if nb is not None:
        _nb_detect_in_kernel(nb, ti, col, TC, xr_s, xi_s, g_s, S_s, X_s,
                             gh_ref, on_ref, lim_ref, G16_ref, Sel_ref,
                             go_ref)

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
    # (nb mode halves the chunk: the detection scratch + window halos
    # leave less headroom for the mix-loop temporaries.  r5 note: CH=1024
    # with nb was tried under the 48 MB limit and HUNG Mosaic compilation
    # >15 min — keep 512; the honest NB marginal is ~1.6 ms anyway.)
    CH = 512 if nb is not None else 1024
    for c0 in range(0, Wp, CH):
        ch = min(CH, Wp - c0)        # tail chunk (Wp is only 128-aligned)
        n = (jax.lax.broadcasted_iota(jnp.int32, (TC, ch), 1)
             + jnp.int32(col + c0))
        ph = phase_ref[:] + word_ref[:] * n       # [TC,1] bcast * [TC,ch]
        ang = ph.astype(jnp.float32) * _TWO_PI_OVER_2_32
        c = jnp.cos(ang)
        sn = jnp.sin(ang)
        a = xr_s[:, LB + c0:LB + c0 + ch]
        b = xi_s[:, LB + c0:LB + c0 + ch]
        if gained or nb is not None:
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
        xr_s[:, LB + c0:LB + c0 + ch] = a * c + b * sn
        xi_s[:, LB + c0:LB + c0 + ch] = b * c - a * sn
    tr = xr_s
    tiq = xi_s

    M = M_ref[:]
    for j in range(TN):
        a = LB + j * R * s
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
                                    "nb", "interpret"))
def _fused_call(word2d, phase2d, xr, xi, M, gwin=None, U=None,
                ghist=None, on=None, limit=None, *,
                W, K, R, TN, s, TC, nb=None, interpret=False):
    C, L = xr.shape
    N = (L - (K - R * s)) // s            # outputs: (L - (T-1)) / s
    grid = (C // TC, N // (R * TN))
    # Mosaic DMA slices must be 128-lane aligned: round the window up and
    # pad the input so every tile's padded window is in bounds
    Wp = -(-W // 128) * 128
    Wtot = Wp + ((nb.LB + nb.LA) if nb is not None else 0)
    if nb is not None:
        # front halo: pad LB zeros ahead so the DMA start stays `col`
        # (128-aligned) while reaching LB samples back
        xr = jnp.pad(xr, ((0, 0), (nb.LB, 0)))
        xi = jnp.pad(xi, ((0, 0), (nb.LB, 0)))
        L += nb.LB
    pad = (grid[1] - 1) * (R * s * TN) + Wtot - L
    if pad > 0:
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
    gained = gwin is not None
    kern = functools.partial(_fused_kernel, W=W, K=K, R=R, TN=TN, s=s,
                             TC=TC, gained=gained, nb=nb)
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
        pltpu.VMEM((TC, Wtot), jnp.float32),
        pltpu.VMEM((TC, Wtot), jnp.float32),
    ]
    operands = [word2d, phase2d, xr, xi, M]
    out_specs = [
        pl.BlockSpec((TC, R * TN), lambda ci, ti: (ci, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, R * TN), lambda ci, ti: (ci, ti),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((C, N), jnp.float32),
        jax.ShapeDtypeStruct((C, N), jnp.float32),
    ]
    if nb is not None:
        # one-hot group-sum matrix and every-16th-lane selection matrix
        # for the in-kernel coarse stats (compile-time constants)
        G16 = np.zeros((512, 32), np.float32)
        for j in range(512):
            G16[j, j // 16] = 1.0
        Sel = np.zeros((512, 32), np.float32)
        for g in range(32):
            Sel[16 * g, g] = 1.0
        in_specs += [
            pl.BlockSpec((TC, nb.GWp), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),   # history gain
            pl.BlockSpec((U.shape[0], U.shape[1]), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),   # interp matrix
            pl.BlockSpec((TC, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),   # nb toggle
            pl.BlockSpec((1, 1), lambda ci, ti: (0, 0),
                         memory_space=pltpu.SMEM),   # nb limit
            pl.BlockSpec((512, 32), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),   # G16
            pl.BlockSpec((512, 32), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),   # Sel
        ]
        operands += [ghist, U, on, jnp.reshape(limit, (1, 1)),
                     jnp.asarray(G16), jnp.asarray(Sel)]
        out_specs.append(
            pl.BlockSpec((TC, nb.GoutP), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM))   # coarse gain out
        out_shape.append(
            jax.ShapeDtypeStruct((C, grid[1] * nb.GoutP), jnp.float32))
        scratch += [pltpu.VMEM((TC, nb.GWp), jnp.float32),   # gain slab
                    pltpu.VMEM((TC, nb.Gp), jnp.float32),    # S
                    pltpu.VMEM((TC, nb.Gp), jnp.float32)]    # X
    elif gained:
        GWp = gwin.shape[-1] // grid[1]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),    # gwin (manual DMA)
            pl.BlockSpec((U.shape[0], U.shape[1]), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),   # interp matrix
        ]
        scratch.append(pltpu.VMEM((TC, GWp), jnp.float32))
        operands += [gwin, U]
    scratch.append(pltpu.SemaphoreType.DMA(
        (3 if (gained and nb is None) else 2,)))
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        # v5e has 128 MB VMEM; the default 16 MB scoped limit rejects
        # multi-block programs where XLA parks the kernel's [C, N] f32
        # output pair in VMEM (16.03 MB measured for the NFM /4 front at
        # nblk>=4).  The TN chooser still budgets 11-14 MB for the
        # kernel's OWN live set — the slack only covers XLA's
        # output/operand placement around the call.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(*operands)
    return outs


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
    nbspec: _NBSpec | None = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, taps, tune_hz, sample_rate: float, block: int,
               decim: int, channels: int, TN: int = 8, TC: int = 128,
               with_gain: bool = False, nb_detect: dict | None = None,
               vmem_budget: int | None = None):
        """``nb_detect={'avg_win': .., 'kwidth': ..}`` fuses the noise
        blanker's DETECTION into the kernel as well (see _NBSpec); call
        via :meth:`call_nb`.  ``with_gain`` keeps the older mode where a
        host-computed coarse gain rides in as an input.  ``vmem_budget``
        overrides the TN chooser's model budget (bytes) — the pallas_call
        runs with vmem_limit_bytes=48MB, so larger tiles than the
        conservative defaults are admissible when measurement supports
        them."""
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

        def nb_plan(tn):
            """_NBSpec + extra VMEM bytes for the nb_detect mode at TN=tn."""
            wp = -(-(R * decim * tn + T - 1) // 128) * 128
            gwp = -(-(wp // 16 + 66) // 128) * 128
            HC = (nb_detect["kwidth"] // 2) // 16
            avg_win = nb_detect["avg_win"]
            LB = -(-(16 * HC + avg_win + 16) // 128) * 128
            LA = -(-(16 * HC + 48) // 128) * 128
            base = LB + T - 1
            j0 = base % 16
            Gq = (LB + wp + LA - j0) // 16
            off_u = (-(T - 1)) % 16
            GH = (T - 1 + off_u) // 16
            base16 = (base - j0) // 16
            delta = base16 - GH
            Gout = (R * decim * tn) // 16
            GoutP = -(-Gout // 128) * 128
            Gp = -(-max(Gq, delta + gwp, base16 + GoutP) // 128) * 128
            KC = 2 * HC + 1
            rc = tuple(float(v) for v in
                       0.5 + 0.5 * np.cos(np.linspace(-np.pi, np.pi, KC)))
            spec = _NBSpec(LB=LB, LA=LA, GH=GH, HC=HC,
                           W4=avg_win // 16, avg_win=avg_win, j0=j0,
                           Gq=Gq, Gp=Gp, delta=delta, base16=base16,
                           GB=block // 16, GWp=gwp, Gout=Gout,
                           GoutP=GoutP, rc=rc)
            extra = ((LB + LA) * TC * 8          # window halos
                     + gwp * TC * 4              # gain slab
                     + 2 * Gp * TC * 4           # S/X stats
                     + 2 * 512 * 32 * 4          # G16/Sel
                     + gwp * TC * 4 + 66 * 1024 * 4    # ghist + U
                     - 3 * TC * 512 * 4)         # mix chunk halved (CH=512)
            return spec, extra

        def gain_vmem(tn):
            if nb_detect is not None:
                return nb_plan(tn)[1]
            if not with_gain:
                return 0
            wp = -(-(R * decim * tn + T - 1) // 128) * 128
            gwp = -(-(wp // 16 + 66) // 128) * 128
            return gwp * TC * 4 + 66 * 1024 * 4
        # Mosaic's own scoped-VMEM accounting runs ~30% above this model
        # (measured: model 13.2M -> compiler 17.09M at TN=2 with nb), and
        # the pallas_call now runs with vmem_limit_bytes = 48 MB, so the
        # nb budget admits TN=4 at the flagship depth — A/B'd whole-chain
        # featured: TN=1 17.36 -> TN=4 15.46 ms/block (the window halo is
        # (T-1)/(R*d*TN) extra DMA per tile on a DMA-bound kernel).  The
        # plain budget stays at 14 MB: TN=2 vs 4/8 measured within noise
        # without nb, and smaller tiles leave XLA more placement slack.
        budget = vmem_budget if vmem_budget is not None else (
            (28 << 20) if nb_detect is not None else (14 << 20))
        while TN > 1 and (N % (R * TN)
                          or ((R * decim * TN + T - 1) * TC * 8
                              + K_dot * R * 4 + temps
                              + gain_vmem(TN)) > budget):
            TN //= 2
        if channels % TC or N % (R * TN):
            raise ValueError("needs C % 128 == 0 and (block/decim) % 128 == 0")
        nbspec = None
        if nb_detect is not None:
            if nb_detect["avg_win"] % 16:
                raise ValueError("nb_detect needs avg_win % 16 == 0")
            nbspec, _ = nb_plan(TN)
            wp = -(-(R * decim * TN + T - 1) // 128) * 128
            # stats must cover every group the gain slab / gout read,
            # plus the widening halo (construction guarantees it; guard
            # against planner drift)
            # real (used) groups need valid stats incl. the widening halo;
            # the GoutP lane padding only needs DEFINED values (Gp covers
            # it; zero-stats there give gain 1 and the host slices it off)
            need = max(nbspec.delta + wp // 16 + 2,
                       nbspec.base16 + nbspec.Gout) + nbspec.HC
            if need > nbspec.Gq:
                raise AssertionError(
                    f"nb_detect halo too small: need {need} > Gq {nbspec.Gq}")
        K = R * decim + T - 1
        h_rev = taps[::-1]
        M = np.zeros((K, R), np.float32)
        for r in range(R):
            M[r * decim: r * decim + T, r] = h_rev
        w = freq_word(np.broadcast_to(np.atleast_1d(tune_hz), (channels,)),
                      sample_rate)
        U = None
        if with_gain or nb_detect is not None:
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
                   decim=decim, R=R, TN=TN, TC=TC, nbspec=nbspec)

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

    def call_nb(self, state, x: jnp.ndarray, hist_gain: jnp.ndarray,
                on: jnp.ndarray, limit):
        """Fused-NB-detection step (create(nb_detect=...)): the blanker
        gain is computed in-kernel from the raw window (one HBM read
        total).  ``hist_gain`` [C, GH] is the carried coarse gain of the
        T-1 history samples, ``on`` [C, 1] the stage toggle, ``limit``
        the detection threshold (data).  Returns
        ``(new_state, y, gain [C, B/16])`` — carry ``gain[:, -GH:]``."""
        if self.nbspec is None:
            raise ValueError("create(nb_detect=...) required")
        nb = self.nbspec
        phase0, hist = state
        ext = jnp.concatenate([hist, x], axis=-1)
        xr = jnp.real(ext).astype(jnp.float32)
        xi = jnp.imag(ext).astype(jnp.float32)
        K = self.R * self.decim + self.ntaps - 1
        W = self.R * self.decim * self.TN + self.ntaps - 1
        word_i32 = jax.lax.bitcast_convert_type(self.word, jnp.int32)
        phase_i32 = jax.lax.bitcast_convert_type(phase0, jnp.int32)
        C = x.shape[0]
        if hist_gain.shape[-1] != nb.GH:
            raise ValueError(f"hist_gain wants {nb.GH} groups, "
                             f"got {hist_gain.shape[-1]}")
        gh = jnp.pad(hist_gain.astype(jnp.float32),
                     ((0, 0), (0, nb.GWp - nb.GH)))
        yr, yi, gout = _fused_call(
            word_i32[:, None], phase_i32[:, None], xr, xi, self.M,
            None, self.U, gh, on.astype(jnp.float32),
            jnp.float32(limit),
            W=W, K=K, R=self.R, TN=self.TN, s=self.decim, TC=self.TC,
            nb=nb, interpret=jax.default_backend() != "tpu")
        new_hist = ext[:, ext.shape[-1] - (self.ntaps - 1):]
        new_phase = phase0 + self.word * jnp.uint32(self.block)
        if nb.GoutP != nb.Gout:        # drop the per-tile lane padding
            gout = gout.reshape(C, -1, nb.GoutP)[:, :, :nb.Gout]
            gout = gout.reshape(C, -1)
        return ((new_phase, new_hist), jax.lax.complex(yr, yi),
                gout[:, :x.shape[-1] // 16])

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


# ---------------------------------------------------------------- PFB poly
def _pfb_poly_kernel(ar, ai, br, bi, h_ref, vr_ref, vi_ref, *, TF, M, P):
    """One tile of the 2x-oversampled PFB polyphase accumulation.

    a/b are consecutive TF-frame tiles of the [F_in, M] half-frame view
    (b = a's successor, so rows m..m+2P-1 are available for every local
    output frame m); h is the [P, 2M] reversed prototype.  Output frame
    m, half hh: v[m, hh*M + q] = sum_p a_or_b[m + 2p + hh, q] * h[p,
    hh*M + q].  All slices static -> pure VPU FMAs on VMEM data; each
    input frame is read from HBM twice total (once as a, once as b)
    instead of once per (p, hh) term.
    """
    for hh in range(2):
        accr = jnp.zeros((TF, M), jnp.float32)
        acci = jnp.zeros((TF, M), jnp.float32)
        for p in range(P):
            off = 2 * p + hh
            w = h_ref[p, hh * M:(hh + 1) * M]
            if off == 0:
                wr, wi = ar[...], ai[...]
            else:
                wr = jnp.concatenate([ar[off:], br[:off]], axis=0)
                wi = jnp.concatenate([ai[off:], bi[:off]], axis=0)
            accr += wr * w
            acci += wi * w
        vr_ref[:, hh * M:(hh + 1) * M] = accr
        vi_ref[:, hh * M:(hh + 1) * M] = acci


def pfb_poly_oversampled(gr: jnp.ndarray, gi: jnp.ndarray,
                         h_poly: jnp.ndarray, n_out: int,
                         TF: int = 128, interpret: bool | None = None):
    """Polyphase accumulation of OversampledPFB as a Pallas kernel.

    gr/gi: [F_in, M] real/imag half-frame views (F_in = n_out + 2P - 1),
    h_poly: [P, K] prototype (UNreversed; reversal folded here).
    Returns (vr, vi) [n_out, 2M] — the concatenated halves, pre the
    final lane reversal (the caller's [..., ::-1] and IDFT are
    unchanged).  The shifted-VIEW XLA formulation re-reads the input
    once per (p, hh) term (~16x); this kernel holds a TF-frame tile plus
    its successor in VMEM and accumulates all 16 terms from there.
    """
    P, K = h_poly.shape
    M = K // 2
    F_in = gr.shape[0]
    assert F_in == n_out + 2 * P - 1
    while TF > 8 and n_out % TF:
        TF //= 2
    if n_out % TF or M % 128:
        raise ValueError("pfb_poly needs n_out % TF == 0 and M % 128 == 0")
    hrev = h_poly[::-1, ::-1]
    grid = (n_out // TF,)
    pad = (grid[0] + 1) * TF - F_in
    gr = jnp.pad(gr, ((0, pad), (0, 0)))
    gi = jnp.pad(gi, ((0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_pfb_poly_kernel, TF=TF, M=M, P=P)
    vr, vi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TF, M), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),       # tile t (x4)
            pl.BlockSpec((TF, M), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, M), lambda t: (t + 1, 0),
                         memory_space=pltpu.VMEM),       # successor tile
            pl.BlockSpec((TF, M), lambda t: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),       # taps
        ],
        out_specs=[
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_out, K), jnp.float32),
                   jax.ShapeDtypeStruct((n_out, K), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(gr, gi, gr, gi, jnp.asarray(hrev, jnp.float32))
    return vr, vi


def _pfb_poly_crit_kernel(ar, ai, br, bi, h_ref, vr_ref, vi_ref, *, TF, K, P):
    """Critically-sampled variant: v[m, q] = sum_p a_or_b[m + p, q] *
    h[p, q] (hop == frame, no halves)."""
    accr = jnp.zeros((TF, K), jnp.float32)
    acci = jnp.zeros((TF, K), jnp.float32)
    for p in range(P):
        if p == 0:
            wr, wi = ar[...], ai[...]
        else:
            wr = jnp.concatenate([ar[p:], br[:p]], axis=0)
            wi = jnp.concatenate([ai[p:], bi[:p]], axis=0)
        accr += wr * h_ref[p]
        acci += wi * h_ref[p]
    vr_ref[...] = accr
    vi_ref[...] = acci


def pfb_poly_critical(gr: jnp.ndarray, gi: jnp.ndarray,
                      h_poly: jnp.ndarray, n_out: int,
                      TF: int = 64, interpret: bool | None = None):
    """Critically-sampled PFB accumulation (PFBChannelizer): gr/gi
    [F_in, K] frame views (F_in = n_out + P - 1), h_poly [P, K]
    UNreversed.  Returns (vr, vi) [n_out, K] pre the lane reversal."""
    P, K = h_poly.shape
    F_in = gr.shape[0]
    assert F_in == n_out + P - 1
    while TF > 8 and n_out % TF:
        TF //= 2
    if n_out % TF or K % 128:
        raise ValueError("pfb_poly needs n_out % TF == 0 and K % 128 == 0")
    hrev = h_poly[::-1, ::-1]
    grid = (n_out // TF,)
    pad = (grid[0] + 1) * TF - F_in
    gr = jnp.pad(gr, ((0, pad), (0, 0)))
    gi = jnp.pad(gi, ((0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_pfb_poly_crit_kernel, TF=TF, K=K, P=P)
    vr, vi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, K), lambda t: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, K), lambda t: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_out, K), jnp.float32),
                   jax.ShapeDtypeStruct((n_out, K), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(gr, gi, gr, gi, jnp.asarray(hrev, jnp.float32))
    return vr, vi


# =====================================================================
# PFB cross-branch IDFT stage-2 + demod, fused (r5)
# =====================================================================
# Why: the r5 time-major XLA pipeline (PFBRxPipeline) measured WITHIN
# NOISE of the r4 corner-turn path (53.7 vs 54.2 ms/block same-window
# A/B) — XLA materializes every dot product's output, so the IDFT's
# Karatsuba intermediates (t1/t2/t3 + re/im planes, ~4 GB of HBM round
# trips at [16384, 4096]) dominate regardless of how the demod reads
# are arranged.  This kernel runs twiddle -> commutator sign -> stage-2
# matmul -> rotation (folded into the constants) -> per-mode demod
# (branchless masks) -> one-pole IIRs (triangular-matmul chunks, carries
# riding VMEM scratch across the SEQUENTIAL grid) -> audio select ->
# per-channel power accumulation entirely in VMEM: HBM traffic is one
# read of the stage-1 planes + one write of the audio.
#
# Layout: the stage-2 contraction runs with n2 on the LANES.  K = K1*K2
# with K2 = 128 exactly (one lane register), so every HBM buffer is a
# clean [rows, 128] array and no lane-changing reshapes are needed
# (Mosaic cannot re-lane).  Stage-1 (XLA) emits B[t, c1, n2]; the kernel
# dot is [TT*K1, 128] x [128, 128].  Output channel at flat position
# p = c1*K2 + c2 is IFFT bin c = c1 + K1*c2 — a fixed digit-reversal
# permutation; all per-channel constants (mode masks, rotation) are
# permuted host-side and consumers unpermute with `chan_perm`.
# Parity: the reference demodulates each bank inline after its filter
# without materializing intermediates (quisk.c:2517-2652).

_ATAN_COEF = (0.9999999981420096, -0.33333292795894176, 0.19998532554425255,
              -0.142648921778703, 0.10958362661538337, -0.08427631092531766,
              0.0584578444957222, -0.031750552322638056,
              0.011257636005632484, -0.001877562048467843)


def _atan2_poly(y, x):
    """Branchless f32 atan2 from Mosaic-supported ops (no atan2
    primitive in Pallas TPU lowering — probed 2026-08-20).  atan(a) on
    [0, 1] as an odd degree-19 polynomial (Chebyshev LS fit in s = a^2,
    max error 9.2e-8 rad < f32 ulp at pi), then octant corrections by
    selects.  atan2(0, 0) returns 0 like np."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-37)
    s = a * a
    acc = jnp.full_like(s, np.float32(_ATAN_COEF[-1]))
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * s + np.float32(c)
    r = acc * a
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _pfb_demod_kernel(bb_ref, st_ref, twr_ref, twi_ref,
                      w2r_ref, w2i_ref, w2s_ref, am_ref, fm_ref,
                      tdc_ref, tde_ref, dec_ref,
                      audio_ref, spec_ref, stout_ref, *,
                      TT, K1, K2, g_ssb, g_am, g_fm, b_de):
    i = pl.program_id(0)
    HI = jax.lax.Precision.HIGHEST

    # input rows are (t, re|im, c1): the XLA stage-1 dot emits (br | bi)
    # stacked along its output-column dim (sublane splits are lane-free)
    b4 = bb_ref[:].reshape(TT, 2, K1, K2)
    b3r = b4[:, 0]
    b3i = b4[:, 1]
    twr = twr_ref[:][None]                    # [1, K1, K2]
    twi = twi_ref[:][None]
    cr = b3r * twr - b3i * twi
    ci = b3r * twi + b3i * twr
    # (-1)^(m*c) half-frame hop parity: parity(c) == parity(c1) (K1 even)
    t_glob = i * TT + jax.lax.broadcasted_iota(jnp.int32, (TT, K1, 1), 0)
    c1_idx = jax.lax.broadcasted_iota(jnp.int32, (TT, K1, 1), 1)
    sgn = jnp.where((t_glob % 2) * (c1_idx % 2) == 1, -1.0, 1.0)
    cr = cr * sgn
    ci = ci * sgn
    A = cr.reshape(TT * K1, K2)
    B = ci.reshape(TT * K1, K2)
    t1 = jnp.dot(A, w2r_ref[:], precision=HI,
                 preferred_element_type=jnp.float32)
    t2 = jnp.dot(B, w2i_ref[:], precision=HI,
                 preferred_element_type=jnp.float32)
    t3 = jnp.dot(A + B, w2s_ref[:], precision=HI,
                 preferred_element_type=jnp.float32)
    zr = (t1 - t2).reshape(TT, K1, K2)        # rows (t, c1), lanes c2
    zi = (t3 - t1 - t2).reshape(TT, K1, K2)

    @pl.when(i == 0)
    def _():
        spec_ref[:] = jnp.zeros_like(spec_ref)
        stout_ref[:] = st_ref[:]

    spec_ref[:] = spec_ref[:] + jnp.sum(zr * zr + zi * zi, axis=0)
    st = stout_ref[:].reshape(5, K1, K2)      # carries entering this tile

    # SSB/CW: audio = g * Re
    a_ssb = np.float32(g_ssb) * zr
    # AM: envelope -> DC blocker y = (x - x[-1]) + a*y[-1]
    env = jnp.sqrt(zr * zr + zi * zi)
    env_m1 = jnp.concatenate([st[3][None], env[:-1]], axis=0)
    d = env - env_m1
    # FM: discriminator arg(z * conj(z[-1])) -> gain -> de-emphasis
    zr_m1 = jnp.concatenate([st[0][None], zr[:-1]], axis=0)
    zi_m1 = jnp.concatenate([st[1][None], zi[:-1]], axis=0)
    dr = zr * zr_m1 + zi * zi_m1
    di = zi * zr_m1 - zr * zi_m1
    disc = jnp.where(dr * dr + di * di > 1e-24, _atan2_poly(di, dr), 0.0)
    u = np.float32(b_de * g_fm) * disc
    # one-pole recurrences as per-c1 triangular time matmuls (the grid is
    # sequential, so the previous tile's last row IS this tile's carry)
    tdc = tdc_ref[:]
    tde = tde_ref[:]
    dc_dec = dec_ref[:, 0:1]
    de_dec = dec_ref[:, 1:2]
    ydc_parts, yde_parts = [], []
    for c1 in range(K1):
        ydc = jnp.dot(tdc, d[:, c1, :], precision=HI,
                      preferred_element_type=jnp.float32)
        ydc_parts.append(ydc + dc_dec * st[4][c1][None])
        yde = jnp.dot(tde, u[:, c1, :], precision=HI,
                      preferred_element_type=jnp.float32)
        yde_parts.append(yde + de_dec * st[2][c1][None])
    y_dc = jnp.stack(ydc_parts, axis=1)       # [TT, K1, K2]
    y_de = jnp.stack(yde_parts, axis=1)
    a_am = np.float32(g_am) * y_dc
    a_fm = y_de
    # branchless per-channel family select (masks are data)
    is_am = am_ref[:][None]
    is_fm = fm_ref[:][None]
    audio = a_ssb + is_am * (a_am - a_ssb) + is_fm * (a_fm - a_ssb)
    audio_ref[:] = audio.reshape(TT * K1, K2)
    # carries for the next tile / next block (explicit static slices:
    # a [-1] value index lowers to dynamic_slice, which Mosaic lacks)
    last = TT - 1
    new_st = jnp.concatenate([zr[last], zi[last], y_de[last],
                              env[last], y_dc[last]], axis=0)
    stout_ref[:] = new_st


@functools.partial(jax.jit, static_argnames=("TT", "K1", "K2", "g_ssb",
                                             "g_am", "g_fm", "b_de",
                                             "interpret"))
def pfb_demod_call(bb, st, twr, twi, w2r, w2i, w2s, am, fm,
                   tdc, tde, dec, *, TT, K1, K2, g_ssb, g_am, g_fm,
                   b_de, interpret=False):
    """bb [n_out*2*K1, K2] stacked (br | bi) stage-1 planes ->
    (audio [n_out*K1, K2], spec [K1, K2] power SUM over time,
    st' [5*K1, K2])."""
    rows = bb.shape[0] // 2
    n_out = rows // K1
    grid = (n_out // TT,)
    blk = TT * K1
    cm = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_pfb_demod_kernel, TT=TT, K1=K1, K2=K2,
                          g_ssb=g_ssb, g_am=g_am, g_fm=g_fm, b_de=b_de),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * blk, K2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # (br | bi)
            pl.BlockSpec((5 * K1, K2), cm, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, K2), cm, memory_space=pltpu.VMEM),   # twr
            pl.BlockSpec((K1, K2), cm, memory_space=pltpu.VMEM),   # twi
            pl.BlockSpec((K2, K2), cm, memory_space=pltpu.VMEM),   # w2r
            pl.BlockSpec((K2, K2), cm, memory_space=pltpu.VMEM),   # w2i
            pl.BlockSpec((K2, K2), cm, memory_space=pltpu.VMEM),   # w2s
            pl.BlockSpec((K1, K2), cm, memory_space=pltpu.VMEM),   # am
            pl.BlockSpec((K1, K2), cm, memory_space=pltpu.VMEM),   # fm
            pl.BlockSpec((TT, TT), cm, memory_space=pltpu.VMEM),   # tdc
            pl.BlockSpec((TT, TT), cm, memory_space=pltpu.VMEM),   # tde
            pl.BlockSpec((TT, 128), cm, memory_space=pltpu.VMEM),  # dec
        ],
        out_specs=[
            pl.BlockSpec((blk, K2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # audio
            pl.BlockSpec((K1, K2), cm, memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * K1, K2), cm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, K2), jnp.float32),
            jax.ShapeDtypeStruct((K1, K2), jnp.float32),
            jax.ShapeDtypeStruct((5 * K1, K2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(bb, st, twr, twi, w2r, w2i, w2s, am, fm, tdc, tde, dec)
    return out
