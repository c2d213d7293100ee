"""Pallas fused message kernel: parity vs the XLA paths (interpreter on CPU)."""

import numpy as np
import pytest


def test_fused_messages_match_edge_mode(rng):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from fast_eng_super_resolution_tpu.ops.pallas_mp import fused_edge_messages

    e, k, w = 700, 24, 16  # deliberately not multiples of the block size
    h = rng.normal(size=(e, k)).astype(np.float32)
    x_src = rng.normal(size=(e, w)).astype(np.float32)
    w3 = rng.normal(size=(k, w * w)).astype(np.float32) * 0.1
    b3 = rng.normal(size=(w * w,)).astype(np.float32) * 0.1

    expected = np.einsum("ei,eio->eo", x_src,
                         (h @ w3 + b3).reshape(e, w, w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_edge_messages(jnp.asarray(h), jnp.asarray(x_src),
                                             jnp.asarray(w3), jnp.asarray(b3)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_kernelnn_pallas_mode_matches_factored(rng):
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from conftest import make_random_graph
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    g = make_random_graph(rng, n=60, e=256, c_in=4, c_out=4)
    base = KernelNN(width=16, ker_width=8, depth=2, in_width=4, out_width=4)
    params = base.init(jax.random.PRNGKey(0))
    ref = np.asarray(base.apply(params, g["x"], g["senders"], g["receivers"],
                                g["edge_attr"]))
    pallas_model = KernelNN(16, 8, 2, 1, 4, 4, mode="pallas")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_model.apply(params, g["x"], g["senders"],
                                            g["receivers"], g["edge_attr"]))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
