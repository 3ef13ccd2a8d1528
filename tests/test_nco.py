"""NCO: exact integer phase accumulation, drift-free across blocks."""

import numpy as np

from quisk_tpu.ops.nco import NCO, freq_word
from quisk_tpu.oracle import dsp


def test_freq_word_roundtrip():
    w = np.asarray(freq_word([7000.0, -7000.0], 48000.0))
    assert w[0] == round(7000.0 / 48000.0 * 2**32)
    # negative frequency wraps modulo 2^32
    assert (int(w[0]) + int(w[1])) % 2**32 == 0


def test_phase_matches_oracle_and_is_continuous():
    fs, B, nblk = 48000.0, 1024, 64
    freqs = [7000.0, -12345.0, 0.0, 23999.9]
    nco = NCO.create(freqs, fs, B, channels=4)
    phase = nco.init_state(4)
    zs = []
    for _ in range(nblk):
        phase, z = nco.phasor(phase)
        zs.append(np.asarray(z))
    z = np.concatenate(zs, axis=-1)
    for c, f in enumerate(freqs):
        ang = dsp.nco_phase(0, B * nblk, f, fs)
        ref = np.exp(1j * ang)
        # float32 sin/cos of an exact angle: tight elementwise bound even
        # after 64 blocks (no drift).
        err = np.max(np.abs(ref - z[c]))
        assert err < 5e-6, f"channel {c}: {err}"


def test_mix_down():
    fs, B = 48000.0, 2048
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, B)) + 1j * rng.standard_normal((1, B))
         ).astype(np.complex64)
    nco = NCO.create([7000.0], fs, B, channels=1)
    _, y = nco(nco.init_state(1), x)
    ref = dsp.mix_down(x[0].astype(np.complex128), 7000.0, fs)
    assert dsp.snr_db(ref, np.asarray(y)[0]) > 110
