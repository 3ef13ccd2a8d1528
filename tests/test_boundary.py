"""The complex-free jit boundary: pack/unpack roundtrips, nested trees,
and the wrapped-step contract."""

import numpy as np
import jax
import jax.numpy as jnp

from quisk_tpu.utils.boundary import (CPair, make_boundary_step, pack_tree,
                                      unpack_tree)


def test_pack_unpack_roundtrip_mixed_tree():
    tree = {
        "c_np": np.arange(6, dtype=np.complex64).reshape(2, 3) * (1 + 2j),
        "f_np": np.ones((2, 2), np.float32),
        "c_jnp": jnp.asarray([1 + 1j, 2 - 2j], jnp.complex64),
        "nested": (np.complex64(3 + 4j) * np.ones(4), [jnp.zeros(3), ()]),
        "scalar": 7,
    }
    packed = pack_tree(tree)
    # every complex leaf became a CPair of float32
    assert isinstance(packed["c_np"], CPair)
    assert packed["c_np"].re.dtype == jnp.float32
    assert isinstance(packed["nested"][0], CPair)
    assert not isinstance(packed["f_np"], CPair)
    back = unpack_tree(packed)
    assert np.allclose(np.asarray(back["c_np"]), tree["c_np"])
    assert np.allclose(np.asarray(back["c_jnp"]), np.asarray(tree["c_jnp"]))
    assert np.allclose(np.asarray(back["nested"][0]), tree["nested"][0])
    assert back["scalar"] == 7


def test_boundary_step_no_complex_crosses():
    def fn(params, x):
        # complex math inside jit; complex state returned
        y = x * params["w"]
        return {"w": params["w"] * (0.5 + 0.5j)}, jnp.real(y)

    step = make_boundary_step(fn)
    params = pack_tree({"w": np.full((4,), 2 - 1j, np.complex64)})
    x = pack_tree(np.full((4,), 1 + 1j, np.complex64))
    new_params, out = step(params, x)
    # outputs are packed: no complex leaf anywhere
    for leaf in jax.tree.leaves((new_params, out)):
        assert not np.issubdtype(np.asarray(leaf).dtype, np.complexfloating)
    assert np.allclose(np.asarray(out), np.real((1 + 1j) * (2 - 1j)))
    # the packed state feeds back in
    _, out2 = step(new_params, x)
    assert np.allclose(np.asarray(out2),
                       np.real((1 + 1j) * (2 - 1j) * (0.5 + 0.5j)))


def test_boundary_step_matches_direct_computation():
    from quisk_tpu.ops.fir import OverlapSaveFIR
    from quisk_tpu.ops import design
    taps = design.bandpass_analytic(129, 300.0, 3000.0, 48000.0)
    op = OverlapSaveFIR.create(taps, 1024)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 1024))
         + 1j * rng.standard_normal((2, 1024))).astype(np.complex64)
    # direct (CPU eager)
    st = op.init_state(2)
    _, y_direct = op(st, x)
    # through the packed boundary
    step = make_boundary_step(lambda o, s, xx: o(s, xx))
    _, py = step(pack_tree(op), pack_tree(op.init_state(2)), pack_tree(x))
    y_packed = np.asarray(py.re) + 1j * np.asarray(py.im)
    assert np.allclose(np.asarray(y_direct), y_packed, atol=1e-6)
