"""Guard the driver-facing bench harness: bench.py must stay importable
and its timing helper honest without a TPU attached (the driver runs
``python bench.py`` unconditionally at end of round)."""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_bench_imports_and_has_driver_surface():
    import bench

    for fn in ("bench_flagship", "bench_stages", "bench_featured",
               "bench_featured_stages", "bench_nfm", "bench_pfb",
               "bench_tx", "main", "_timed_best"):
        assert callable(getattr(bench, fn)), fn


def test_timed_best_takes_minimum_window():
    import jax.numpy as jnp

    import bench

    calls = {"n": 0}
    out = jnp.zeros(4)

    def dispatch(state):
        calls["n"] += 1
        # one window is made slow: the best-window estimate must land on
        # the fast cluster, not the mean (the contended-tunnel defence)
        time.sleep(0.02 if calls["n"] <= 2 else 0.001)
        return state, out

    dt = bench._timed_best(dispatch, out, iters=8, windows=4)
    assert 0.0005 < dt < 0.01, dt
