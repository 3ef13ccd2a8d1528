"""A genuine multi-process (DCN) run: two jax.distributed processes form one
8-device mesh, each ingests half the channel axis, and the sharded receive
step must match the unsharded oracle bit-for-bit-within-float32.

This executes the ``jax.make_array_from_process_local_data`` path of
quisk_tpu.parallel.multihost with process_count == 2 (the reference's
two-machine remote-operation split, ac2yd/remote.c, runs for real; so must
ours).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 2-process jax.distributed job

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NPROC = 2
CHANNELS = 16
BLOCKS = 6
# the 1025-tap channel filter's group delay means the first ~3 audio blocks
# are warmup transient; the FM discriminator's angle() on that near-zero
# signal is numerically chaotic, so conformance compares after it
SKIP = 1024


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_matches_oracle(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "quisk_tpu.parallel.dcn_worker",
             "--pid", str(pid), "--nproc", str(NPROC), "--port", str(port),
             "--outdir", str(tmp_path), "--channels", str(CHANNELS),
             "--blocks", str(BLOCKS)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"process_count={NPROC}" in out, out

    # stitch the per-process shards back into the global audio
    rows = {}
    count_seen = None
    for pid in range(NPROC):
        z = np.load(tmp_path / f"audio_p{pid}.npz")
        rows[(int(z["lo"]), int(z["hi"]))] = z["audio"]
        count_seen = int(z["process_count"])
    assert count_seen == NPROC
    spans = sorted(rows)
    assert spans[0][0] == 0 and spans[-1][1] == CHANNELS
    audio = np.concatenate([rows[s] for s in spans], axis=0)

    # unsharded oracle: the identical chain and capture in this process
    import __graft_entry__
    from quisk_tpu.io import sources
    chain = __graft_entry__._flagship(channels=CHANNELS, sample_rate=192000.0,
                                      audio_block=256, agc=False)
    n = BLOCKS * chain.block_in
    tunes = np.asarray(chain.tune_base)
    modes = np.asarray(chain.demod.mode)
    iq = np.stack([
        sources.station_iq(modes[c], 192000.0, n, float(tunes[c]), seed=c)
        for c in range(CHANNELS)])
    st = chain.init_state()
    st, ref = chain.process(st, iq)
    ref = np.asarray(ref)

    assert audio.shape == ref.shape
    err = np.abs(audio[:, SKIP:] - ref[:, SKIP:])
    scale = np.abs(ref[:, SKIP:]).max() + 1e-9
    assert err.max() / scale < 1e-4, err.max() / scale


@pytest.mark.slow
def test_two_process_pfb_channelizer_matches_unsharded(tmp_path):
    """BASELINE config #5 'across >=2 hosts': the sharded PFB step on a
    2-process jax.distributed mesh — polyphase halos ride DCN between
    the processes — matches the unsharded OversampledPFB + MixedDemod
    pipeline on every channel."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    blocks = 2
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "quisk_tpu.parallel.dcn_worker",
             "--pid", str(pid), "--nproc", "2", "--port", str(port),
             "--outdir", str(tmp_path), "--blocks", str(blocks), "--pfb"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"

    import jax
    import jax.numpy as jnp
    from quisk_tpu.modes import Mode
    from quisk_tpu.ops.channelizer import OversampledPFB
    from quisk_tpu.ops.demod import MixedDemod

    n_global = 8
    K = 16 * n_global
    B = K * 8 * n_global
    modes = [int(Mode.USB), int(Mode.AM), int(Mode.FM)]
    pfb = OversampledPFB.create(K, B, taps_per_branch=8, mxu_dft=True)
    dm = MixedDemod.create([modes[(3 * i) // K] for i in range(K)],
                           sample_rate=96000.0, channels=K)
    rng = np.random.default_rng(7)
    hist, st = pfb.init_state(1), dm.init_state(K)
    audio = None
    for _ in range(blocks):
        xh = (rng.standard_normal((1, B)) + 1j * rng.standard_normal((1, B))
              ).astype(np.complex64)
        hist, ch = pfb(hist, jnp.asarray(xh))
        st, audio = dm(st, ch.reshape(K, -1))
    ref = np.asarray(audio)

    got = np.zeros_like(ref)
    seen = 0
    for pid in range(2):
        z = np.load(tmp_path / f"pfb_p{pid}.npz")
        assert int(z["process_count"]) == 2
        lo, hi = int(z["lo"]), int(z["hi"])
        got[lo:hi] = z["audio"]
        seen += hi - lo
    assert seen == K
    err = np.max(np.abs(got - ref))
    assert err < 1e-3, err
