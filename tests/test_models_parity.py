"""Golden parity tests: JAX models vs the reference's shipped checkpoints.

The two .pth files under /root/reference/logs/models are the parity oracle
identified in SURVEY.md §4: load the real trained weights, run a fixed random
subdomain graph through (a) an independent torch implementation of the
reference math (tests/torch_oracle.py) and (b) our JAX models, and compare.
"""

import os

import numpy as np
import pytest

from conftest import make_random_graph

REF = "/root/reference/logs/models"
NEURALOP_PTH = os.path.join(REF, "collection_duct_neuralop", "partition_0.pth")
TEECNET_PTH = os.path.join(REF, "collection_duct_teecnet", "partition_0.pth")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NEURALOP_PTH), reason="reference checkpoints unavailable"
)


def _graph(rng):
    return make_random_graph(rng, n=120, e=900, c_in=4, c_out=4)


def test_kernelnn_matches_reference_checkpoint(rng):
    from fast_eng_super_resolution_tpu.core.checkpoint import load_pth_state_dict
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    import torch_oracle

    g = _graph(rng)
    sd = load_pth_state_dict(NEURALOP_PTH)
    edge_index = np.stack([g["senders"], g["receivers"]])
    # teecnet_duct.yaml:15 width=43, num_layers=5 -> depth=5 (utils.py:41)
    expected = torch_oracle.kernelnn_forward(sd, g["x"], edge_index, g["edge_attr"], depth=5)

    model = KernelNN(width=43, ker_width=43, depth=5, ker_in=1, in_width=4, out_width=4)
    params = model.import_pth(sd)
    for mode in ("edge", "edge3d", "factored"):
        out = np.asarray(
            KernelNN(43, 43, 5, 1, 4, 4, mode=mode).apply(
                params, g["x"], g["senders"], g["receivers"], g["edge_attr"]
            )
        )
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_teecnet_matches_reference_checkpoint(rng):
    from fast_eng_super_resolution_tpu.core.checkpoint import load_pth_state_dict
    from fast_eng_super_resolution_tpu.models.teecnet import TEECNet
    import torch_oracle

    g = _graph(rng)
    sd = load_pth_state_dict(TEECNET_PTH)
    edge_index = np.stack([g["senders"], g["receivers"]])
    expected = torch_oracle.teecnet_forward(sd, g["x"], edge_index, g["edge_attr"], num_layers=5)

    model = TEECNet(in_channels=4, width=43, out_channels=4, num_layers=5)
    params = model.import_pth(sd)
    for mode in ("edge", "edge3d", "factored"):
        out = np.asarray(
            TEECNet(4, 43, 4, 5, mode=mode).apply(
                params, g["x"], g["senders"], g["receivers"], g["edge_attr"]
            )
        )
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_pth_roundtrip(rng):
    from fast_eng_super_resolution_tpu.core.checkpoint import load_pth_state_dict
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    sd = load_pth_state_dict(NEURALOP_PTH)
    model = KernelNN(width=43, ker_width=43, depth=5, ker_in=1, in_width=4, out_width=4)
    params = model.import_pth(sd)
    sd2 = model.export_pth(params)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])


def test_padding_invariance(rng):
    """Padded nodes/edges must not change real-node outputs."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.core.graph import pad_graph
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    import jax

    g = _graph(rng)
    model = KernelNN(width=16, ker_width=8, depth=3, ker_in=1, in_width=4, out_width=4)
    params = model.init(jax.random.PRNGKey(0))

    out_raw = np.asarray(
        model.apply(params, g["x"], g["senders"], g["receivers"], g["edge_attr"])
    )
    padded = pad_graph(g["x"], g["y"], g["pos"], g["senders"], g["receivers"],
                       g["edge_attr"], n_pad=160, e_pad=1024)
    out_pad = np.asarray(
        model.apply(params, padded.x, padded.senders, padded.receivers,
                    padded.edge_attr, edge_mask=padded.edge_mask)
    )
    np.testing.assert_allclose(out_pad[: g["x"].shape[0]], out_raw, rtol=1e-5, atol=1e-6)


def test_lut_mode_approximates_reference_checkpoint(rng):
    """Tabulated (LUT) kernel vs exact edge mode on the real trained weights:
    the ReLU edge MLP of a scalar is piecewise linear, so a dense table is a
    near-exact surrogate."""
    from fast_eng_super_resolution_tpu.core.checkpoint import load_pth_state_dict
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    g = _graph(rng)
    sd = load_pth_state_dict(NEURALOP_PTH)
    exact = KernelNN(43, 43, 5, 1, 4, 4, mode="edge")
    params = exact.import_pth(sd)
    ref = np.asarray(exact.apply(params, g["x"], g["senders"], g["receivers"],
                                 g["edge_attr"]))
    lut = KernelNN(43, 43, 5, 1, 4, 4, mode="lut", lut_knots=512)
    got = np.asarray(lut.apply(params, g["x"], g["senders"], g["receivers"],
                               g["edge_attr"]))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-3, rel

    # coarse table degrades gracefully
    lut64 = KernelNN(43, 43, 5, 1, 4, 4, mode="lut", lut_knots=64)
    got64 = np.asarray(lut64.apply(params, g["x"], g["senders"], g["receivers"],
                                   g["edge_attr"]))
    rel64 = np.linalg.norm(got64 - ref) / np.linalg.norm(ref)
    assert rel < rel64 < 0.1, (rel, rel64)
