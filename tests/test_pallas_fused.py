"""Fused Pallas tune+decimate kernel vs the unfused chain (interpret mode
on CPU; the same code runs compiled on TPU — bench.py exercises it)."""

import numpy as np
import pytest

from quisk_tpu.modes import Mode
from quisk_tpu.ops import design
from quisk_tpu.ops.pallas_kernels import FusedTuneDecimate
from quisk_tpu.rx import RxChain, RxChainConfig

FS = 384000.0


def test_fused_op_matches_reference():
    C, B = 128, 2048
    taps = design.halfband(45)
    tune = [(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)]
    op = FusedTuneDecimate.create(taps, tune, FS, B, 2, C, TN=2)
    st = op.init_state(C)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, B))
         + 1j * rng.standard_normal((C, B))).astype(np.complex64)
    ref = op.reference(st, x)
    st2, y = op(st, x)
    y = np.asarray(y)
    snr = 10 * np.log10(np.mean(np.abs(ref) ** 2)
                        / np.mean(np.abs(y - ref) ** 2))
    assert snr > 100.0, snr
    # streaming continuity
    x2 = (rng.standard_normal((C, B))
          + 1j * rng.standard_normal((C, B))).astype(np.complex64)
    ref2 = op.reference((np.asarray(st2[0]), np.asarray(st2[1])), x2)
    _, y2 = op(st2, x2)
    snr2 = 10 * np.log10(np.mean(np.abs(ref2) ** 2)
                         / np.mean(np.abs(np.asarray(y2) - ref2) ** 2))
    assert snr2 > 100.0, snr2


@pytest.mark.parametrize("fs,fused_decim,mode", [
    (384000.0, 8, int(Mode.USB)),   # /8 = 2*2*2: three HB45s fuse
    (960000.0, 20, int(Mode.USB)),  # flagship /20 = 2*2*5: whole cascade
    (192000.0, 4, int(Mode.FM)),    # NFM config #3 front (bench_nfm)
])
@pytest.mark.slow
def test_fused_chain_equals_unfused(fs, fused_decim, mode):
    C = 128
    cfg = dict(sample_rate=fs, channels=C, audio_block=512, agc=True)
    tune = [(-fs / 4 + (i + 0.5) * fs / (2 * C)) for i in range(C)]
    modes = mode
    a = RxChain.create(RxChainConfig(**cfg), tune_hz=tune, mode=modes)
    b = RxChain.create(RxChainConfig(**cfg, fused_frontend=True),
                       tune_hz=tune, mode=modes)
    assert b.front is not None
    assert b.front.decim == fused_decim, b.front.decim
    assert not b.stages          # no unfused decimators remain
    rng = np.random.default_rng(1)
    nblk = 4
    x = (rng.standard_normal((C, nblk * a.block_in))
         + 1j * rng.standard_normal((C, nblk * a.block_in))
         ).astype(np.complex64)
    sa, sb = a.init_state(), b.init_state()
    for i in range(nblk):
        blk = x[:, i * a.block_in:(i + 1) * a.block_in]
        sa, ya = a.step(sa, blk)
        sb, yb = b.step(sb, blk)
        ya, yb = np.asarray(ya), np.asarray(yb)
        if i < 2:
            continue          # AGC lookahead: first blocks are silent
        snr = 10 * np.log10(np.mean(ya ** 2)
                            / (np.mean((ya - yb) ** 2) + 1e-30))
        assert snr > 90.0, (i, snr)


def test_fused_gain_matches_manual_apply():
    """with_gain=True: the kernel applies a 16:1 coarse gain to the raw
    window in VMEM before the mix; must equal scaling ext by the
    linearly-upsampled gain outside (the blanker's standalone apply)."""
    C, B = 128, 2048
    taps = design.halfband(45)        # T=45 -> off=4, 3 history groups
    tune = [(-FS / 4 + (i + 0.5) * FS / (2 * C)) for i in range(C)]
    op = FusedTuneDecimate.create(taps, tune, FS, B, 2, C, TN=2,
                                  with_gain=True)
    assert op.U is not None
    off, GH = op.gain_off, op.gain_hist_groups
    assert (off + op.ntaps - 1) % 16 == 0
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((C, B))
         + 1j * rng.standard_normal((C, B))).astype(np.complex64)
    g16 = rng.uniform(0.0, 1.0, (C, GH + B // 16)).astype(np.float32)

    def upsampled(gext, L):
        gp = np.concatenate([gext, gext[:, -1:]], axis=-1)
        e = np.arange(L)
        gg, p = np.divmod(e + off, 16)
        return gp[:, gg] * (1 - p / 16.0) + gp[:, gg + 1] * (p / 16.0)

    st = op.init_state(C)
    _, y = op(st, x, gain16=g16)
    g = upsampled(g16, B + op.ntaps - 1)
    hist = np.asarray(st[1]) * g[:, : op.ntaps - 1]
    ref = op.reference((np.asarray(st[0]), hist),
                       x * g[:, op.ntaps - 1:])
    snr = 10 * np.log10(np.mean(np.abs(ref) ** 2)
                        / np.mean(np.abs(np.asarray(y) - ref) ** 2))
    assert snr > 80.0, snr


@pytest.mark.slow
def test_chain_fused_nb_gain_equals_standalone_apply():
    """Featured wideband chain: blanker detection+gain fused into the
    front kernel (the default) vs the standalone full-rate op (forced by
    dropping the kernel's NB plan) — same audio."""
    fs, C = 960000.0, 128
    cfg = RxChainConfig(sample_rate=fs, channels=C, audio_block=512,
                        agc=False, noise_blanker=2, fused_frontend=True)
    tune = [(-fs / 4 + (i + 0.5) * fs / (2 * C)) for i in range(C)]
    ch = RxChain.create(cfg, tune_hz=tune, mode=int(Mode.USB))
    assert ch._nb_fused
    ch_sep = ch.replace(front=ch.front.replace(nbspec=None))
    assert not ch_sep._nb_fused
    rng = np.random.default_rng(3)
    nblk = 3
    x = 0.05 * (rng.standard_normal((C, nblk * ch.block_in))
                + 1j * rng.standard_normal((C, nblk * ch.block_in))
                ).astype(np.complex64)
    x[:, 50000:50006] += 30.0        # impulse hits both paths identically
    outs = {}
    for name, c in (("fused", ch), ("separate", ch_sep)):
        st = c.init_state()
        ys = []
        for i in range(nblk):
            st, y = c.step(st, x[:, i * c.block_in:(i + 1) * c.block_in])
            ys.append(np.asarray(y))
        outs[name] = np.concatenate(ys, axis=-1)
    a, b = outs["fused"], outs["separate"]
    snr = 10 * np.log10(np.mean(np.abs(b) ** 2)
                        / max(np.mean(np.abs(a - b) ** 2), 1e-30))
    assert snr > 45.0, snr


@pytest.mark.slow
def test_in_kernel_nb_detect_equals_host_detect():
    """call_nb (detection + gain inside the kernel, VERDICT r3 item 1)
    must equal the with_gain path fed by the host NoiseBlanker.detect —
    exactly, streaming across blocks, including the carried coarse gain."""
    import jax.numpy as jnp
    from quisk_tpu.ops.noise import NoiseBlanker

    fs, C, decim = 960000.0, 128, 20
    B = 2048 * decim
    taps = design.decimator(decim, fs)
    tune = [(-fs / 4 + (i + 0.5) * fs / (2 * C)) for i in range(C)]
    nb = NoiseBlanker.create(fs, level=2)
    assert nb.pool == 16
    f_old = FusedTuneDecimate.create(taps, tune, fs, B, decim, C,
                                     with_gain=True)
    f_new = FusedTuneDecimate.create(
        taps, tune, fs, B, decim, C,
        nb_detect={"avg_win": nb.avg_win, "kwidth": nb.kwidth})
    GH = f_new.nbspec.GH
    assert GH == f_new.gain_hist_groups
    rng = np.random.default_rng(0)
    ons = jnp.ones((C, 1), jnp.float32)
    st_old, st_new = f_old.init_state(C), f_new.init_state(C)
    nbst = nb.init_state(C)
    nbg = jnp.ones((C, GH), jnp.float32)
    for blk in range(3):
        xb = (rng.standard_normal((C, B))
              + 1j * rng.standard_normal((C, B))).astype(np.complex64)
        for c in range(0, C, 7):         # impulses to blank
            for p in rng.integers(0, B, 5):
                xb[c, p] += 40.0 * np.exp(1j * rng.uniform(0, 2 * np.pi))
        xb = jnp.asarray(xb)
        nbst, gc = nb.detect(nbst, xb)
        gc = 1.0 + ons * (gc - 1.0)
        gext = jnp.concatenate([nbg, gc], axis=-1)
        st_old, y_old = f_old(st_old, xb, gain16=gext)
        st_new, y_new, gout = f_new.call_nb(st_new, xb, nbg, ons, nb.limit)
        assert float(jnp.max(jnp.abs(gout - gc))) == 0.0, blk
        err = float(jnp.max(jnp.abs(y_old - y_new)))
        assert err == 0.0, (blk, err)
        nbg = gout[:, -GH:]
    # toggle off: gain must be exactly 1 (pass-through)
    off = jnp.zeros((C, 1), jnp.float32)
    xb = jnp.asarray((rng.standard_normal((C, B))
                      + 1j * rng.standard_normal((C, B))
                      ).astype(np.complex64))
    _, _, g_off = f_new.call_nb(st_new, xb, jnp.ones((C, GH)), off,
                                nb.limit)
    assert float(jnp.min(g_off)) == 1.0


def test_featured_front_fuses_whole_cascade_at_tn4():
    """The 960k featured config must fuse the WHOLE /20 cascade with NB
    detection at TN=4 (nb budget 28MB under the 48MB kernel vmem limit;
    A/B'd whole-chain: TN=1 17.36 -> TN=4 15.46 ms/block).  Guards the
    TN chooser model against regressions that silently shrink the tile
    (more window-halo DMA on a DMA-bound kernel)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.rx import RxChain, RxChainConfig

    cfg = RxChainConfig(sample_rate=960000.0, channels=1024,
                        audio_block=2048, agc=True, fused_frontend=True,
                        noise_blanker=2)
    ch = RxChain.create(cfg, tune_hz=0.0, mode=int(Mode.USB))
    assert ch.front is not None and ch.front.decim == 20
    assert ch.front.nbspec is not None
    assert ch.front.TN == 4, ch.front.TN
    assert len(ch.stages) == 0          # nothing left unfused

    cfg2 = cfg.__class__(**{**cfg.__dict__, "noise_blanker": 0})
    ch2 = RxChain.create(cfg2, tune_hz=0.0, mode=int(Mode.USB))
    assert ch2.front.TN == 2 and ch2.front.nbspec is None
