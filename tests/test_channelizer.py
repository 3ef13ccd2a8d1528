"""PFB channelizer: channel isolation, tone recovery, streaming, and
equivalence with the tune+filter+decimate approach."""

import numpy as np
import pytest
import jax.numpy as jnp

from quisk_tpu.ops.channelizer import PFBChannelizer

FS = 1024000.0
K = 64
B = 16 * K * 8          # 8192


def _stream(op, x, nblk):
    st = op.init_state(x.shape[0])
    outs = []
    for i in range(nblk):
        st, y = op(st, x[:, i * B:(i + 1) * B])
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_pfb_tone_lands_in_its_channel():
    op = PFBChannelizer.create(K, B)
    n = 8 * B
    t = np.arange(n) / FS
    c_target = 11
    f0 = c_target * FS / K + 1500.0          # 1.5 kHz into channel 11
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)[None]
    y = _stream(op, x, 8)                    # [1, K, n/K]
    pw = np.mean(np.abs(y[0, :, 64:]) ** 2, axis=-1)
    assert np.argmax(pw) == c_target
    # isolation: every other channel far down
    others = np.delete(pw, c_target)
    assert 10 * np.log10(pw[c_target] / others.max()) > 50.0
    # the channel stream contains the 1.5 kHz offset tone at rate fs/K
    ch = y[0, c_target, 64:]
    f = np.fft.fftfreq(len(ch), K / FS)
    k = np.argmax(np.abs(np.fft.fft(ch)))
    assert abs(f[k] - 1500.0) < FS / K / len(ch) * 2


def test_pfb_streaming_invariance():
    op = PFBChannelizer.create(K, B)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 4 * B))
         + 1j * rng.standard_normal((2, 4 * B))).astype(np.complex64)
    y_stream = _stream(op, x, 4)
    # one shot with block = full length
    op2 = PFBChannelizer.create(K, 4 * B)
    st = op2.init_state(2)
    _, y_once = op2(st, x)
    assert np.allclose(y_stream, np.asarray(y_once), atol=1e-4)


def test_pfb_matches_tune_filter_decimate():
    """A PFB channel equals tune-to-center -> prototype lowpass ->
    decimate-by-K (the per-channel chain's approach)."""
    op = PFBChannelizer.create(K, B, taps_per_branch=8)
    rng = np.random.default_rng(1)
    n = 4 * B
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y = _stream(op, x[None], 4)[0]
    from quisk_tpu.ops.channelizer import pfb_prototype
    h = pfb_prototype(K, 8)
    c = 5
    t = np.arange(n)
    mixed = x * np.exp(-2j * np.pi * c / K * t)
    full = np.convolve(mixed, h)[: n]
    # PFB output y[c, m] is the filtered signal at time m*K + K - 1
    # (true streaming convolution alignment); compare at that phase
    want = full[K - 1::K]
    got = y[c]
    # skip the filter warmup region
    err = got[8:] - want[8:len(got)]
    snr = 10 * np.log10(np.mean(np.abs(want[8:len(got)]) ** 2)
                        / np.mean(np.abs(err) ** 2))
    assert snr > 60.0, snr


def test_oversampled_pfb_matches_tune_filter_halfhop():
    """An oversampled channel equals tune -> prototype lowpass ->
    decimate-by-K/2 (alias-free across the full channel width)."""
    from quisk_tpu.ops.channelizer import OversampledPFB, pfb_prototype
    op = OversampledPFB.create(K, B, taps_per_branch=8)
    rng = np.random.default_rng(2)
    n = 4 * B
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y = _stream(op, x[None], 4)[0]          # [K, 2n/K]
    h = pfb_prototype(K, 8)
    c = 7
    t = np.arange(n)
    mixed = x * np.exp(-2j * np.pi * c / K * t)
    full = np.convolve(mixed, h)[:n]
    want = full[K // 2 - 1::K // 2]
    got = y[c]
    m = min(len(got), len(want))
    err = got[16:m] - want[16:m]
    snr = 10 * np.log10(np.mean(np.abs(want[16:m]) ** 2)
                        / np.mean(np.abs(err) ** 2))
    assert snr > 60.0, snr


def test_oversampled_pfb_channel_edge_tone():
    """A tone halfway between two channel centers is recoverable from
    either adjacent channel (critically-sampled PFB would fold it)."""
    from quisk_tpu.ops.channelizer import OversampledPFB
    op = OversampledPFB.create(K, B)
    n = 8 * B
    c = 20
    f_norm = (c + 0.5) / K                   # exactly on the channel edge
    x = np.exp(2j * np.pi * f_norm * np.arange(n)).astype(np.complex64)[None]
    y = _stream(op, x, 8)
    ch = y[0, c, 64:]
    # at 2*fs/K channel rate, the tone sits at +fs/(2K) = quarter rate —
    # inside the oversampled Nyquist, recover its frequency exactly
    f = np.fft.fftfreq(len(ch), K / (2 * FS))
    k = np.argmax(np.abs(np.fft.fft(ch)))
    assert abs(f[k] - FS / (2 * K)) < 2 * (2 * FS / K) / len(ch)


@pytest.mark.parametrize("cls_name", ["PFBChannelizer", "OversampledPFB"])
def test_pallas_poly_matches_views(cls_name):
    """The Pallas polyphase-accumulation kernel == the shifted-view XLA
    formulation, streaming state included."""
    import quisk_tpu.ops.channelizer as chz

    cls = getattr(chz, cls_name)
    K, B = 512, 512 * 16
    a = cls.create(K, B)
    b = cls.create(K, B, pallas_poly=True)
    rng = np.random.default_rng(9)
    sa, sb = a.init_state(2), b.init_state(2)
    for _ in range(2):
        x = (rng.standard_normal((2, B))
             + 1j * rng.standard_normal((2, B))).astype(np.complex64)
        sa, ya = a(sa, jnp.asarray(x))
        sb, yb = b(sb, jnp.asarray(x))
        err = float(jnp.max(jnp.abs(ya - yb)))
        assert err < 1e-4, (cls_name, err)


def test_pfb_rx_pipeline_matches_unfused():
    """PFBRxPipeline (time-major fused demod) == OversampledPFB +
    channel-major GroupedDemod, audio transposed — streaming state,
    spectrum, and all three demod families included."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import OversampledPFB, PFBRxPipeline
    from quisk_tpu.ops.demod import GroupedDemod

    S, nblk = 2, 3
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    mode_vec = [modes[(4 * i) // K] for i in range(K)]
    ch_rate = 2.0 * FS / K
    pipe = PFBRxPipeline.create(K, B, mode_vec, channel_rate=ch_rate,
                                mxu_dft=False)
    pfb = OversampledPFB.create(K, B, taps_per_branch=8)
    dm = GroupedDemod.create(mode_vec, sample_rate=ch_rate, channels=K)

    rng = np.random.default_rng(3)
    st_f = pipe.init_state(S)
    st_p, st_d = pfb.init_state(S), [dm.init_state(K) for _ in range(S)]
    for _ in range(nblk):
        x = (rng.standard_normal((S, B))
             + 1j * rng.standard_normal((S, B))).astype(np.complex64)
        st_f, (audio_tm, spec) = pipe(st_f, jnp.asarray(x))
        st_p, ch = pfb(st_p, jnp.asarray(x))          # [S, K, n_out]
        for s in range(S):
            st_d[s], a_cm = dm(st_d[s], ch[s])        # [K, n_out]
            got = np.asarray(audio_tm)[s].T           # [K, n_out]
            err = np.max(np.abs(got - np.asarray(a_cm)))
            assert err < 2e-4, (s, err)
            sp_ref = np.mean(np.abs(np.asarray(ch)[s]) ** 2, axis=-1)
            assert np.allclose(np.asarray(spec)[s], sp_ref, rtol=1e-4,
                               atol=1e-6)


def test_pfb_rx_pipeline_mxu_dft_close():
    """Fused pipeline with the MXU matmul IDFT stays within the f32
    matmul-vs-fft error budget of the fft variant."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import PFBRxPipeline

    mode_vec = [int(Mode.AM)] * (K // 2) + [int(Mode.FM)] * (K // 2)
    a = PFBRxPipeline.create(K, B, mode_vec, channel_rate=2 * FS / K,
                             mxu_dft=False)
    b = PFBRxPipeline.create(K, B, mode_vec, channel_rate=2 * FS / K,
                             mxu_dft=True)
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((1, B))
         + 1j * rng.standard_normal((1, B))).astype(np.complex64)
    sa, sb = a.init_state(1), b.init_state(1)
    sa, (au_a, sp_a) = a(sa, jnp.asarray(x))
    sb, (au_b, sp_b) = b(sb, jnp.asarray(x))
    assert np.allclose(np.asarray(au_a), np.asarray(au_b), atol=2e-3)
    assert np.allclose(np.asarray(sp_a), np.asarray(sp_b), rtol=1e-3)


def test_pfb_pallas_demod_matches_xla_pipeline():
    """The fused Pallas IDFT+demod kernel (interpret mode on CPU) ==
    the XLA time-major pipeline: audio equal up to the documented
    channel permutation, spectrum unpermuted, streaming state carried
    across blocks and tile boundaries (TT=8 on n_out=32 exercises 4
    tiles per block with IIR/FM carries riding the sequential grid)."""
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import PFBRxPipeline

    Kc, Bc = 256, 256 * 16
    S, nblk = 2, 3
    modes = [int(Mode.USB), int(Mode.LSB), int(Mode.AM), int(Mode.FM)]
    mode_vec = [modes[(4 * i) // Kc] for i in range(Kc)]
    ch_rate = 2.0 * FS / Kc
    ref = PFBRxPipeline.create(Kc, Bc, mode_vec, channel_rate=ch_rate,
                               mxu_dft=False)
    pk = PFBRxPipeline.create(Kc, Bc, mode_vec, channel_rate=ch_rate,
                              pallas_demod=True, TT=8)
    perm = pk.chan_perm
    assert np.array_equal(perm[pk.chan_pos], np.arange(Kc))

    rng = np.random.default_rng(11)
    st_r, st_p = ref.init_state(S), pk.init_state(S)
    n_out = 2 * Bc // Kc
    for blk in range(nblk):
        x = (rng.standard_normal((S, Bc))
             + 1j * rng.standard_normal((S, Bc))).astype(np.complex64)
        st_r, (a_ref, sp_ref) = ref(st_r, jnp.asarray(x))
        st_p, (a_pal, sp_pal) = pk(st_p, jnp.asarray(x))
        a_pal = np.asarray(a_pal).reshape(S, n_out, Kc)[:, :, pk.chan_pos]
        err = np.max(np.abs(a_pal - np.asarray(a_ref)))
        assert err < 5e-3, (blk, err)
        assert np.allclose(np.asarray(sp_pal), np.asarray(sp_ref),
                           rtol=2e-3, atol=1e-5), blk
