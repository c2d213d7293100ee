"""Unit tests for segment ops, losses, and the remaining model zoo."""

import numpy as np
import pytest

from conftest import make_random_graph


def test_segment_mean_matches_numpy(rng):
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.ops.segment import masked_segment_mean

    e, n, c = 64, 10, 3
    data = rng.normal(size=(e, c)).astype(np.float32)
    seg = rng.integers(0, n, size=e).astype(np.int32)
    mask = rng.random(e) > 0.3
    out = np.asarray(masked_segment_mean(jnp.asarray(data), jnp.asarray(seg), n, jnp.asarray(mask)))
    expected = np.zeros((n, c), np.float32)
    for i in range(n):
        sel = (seg == i) & mask
        if sel.sum():
            expected[i] = data[sel].mean(axis=0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_gradient_loss_matches_torch_math(rng):
    """Mirror GradientbasedLoss.forward (scheduler_gnn.py:481-501) in numpy."""
    from fast_eng_super_resolution_tpu.ops.loss import compute_node_weight, gradient_based_loss

    g = make_random_graph(rng, n=30, e=100)
    pred = rng.normal(size=(30, 4)).astype(np.float32)
    s, r, ea, y = g["senders"], g["receivers"], g["edge_attr"], g["y"]

    grad_pred = (pred[s] - pred[r]) / ea
    grad_y = (y[s] - y[r]) / ea
    ew = np.max(grad_pred - grad_y, axis=1)
    nw = np.zeros(30)
    np.add.at(nw, r, ew)
    nw = np.minimum(nw, 1.0)
    expected = np.mean((pred - y) ** 2) * nw.sum()

    got = float(gradient_based_loss(pred, y, s, r, ea))
    np.testing.assert_allclose(got, expected, rtol=1e-4)

    # compute_node_weight (scheduler_gnn.py:503-515): scatter at senders, no clamp
    nw2 = np.zeros(30)
    np.add.at(nw2, s, ew)
    expected_w = nw2.sum() * np.ones(30)
    got_w = np.asarray(compute_node_weight(pred, y, s, r, ea, 30))
    np.testing.assert_allclose(got_w, expected_w, rtol=1e-4)


def test_loss_padding_invariance(rng):
    from fast_eng_super_resolution_tpu.core.graph import pad_graph
    from fast_eng_super_resolution_tpu.ops.loss import training_loss

    g = make_random_graph(rng, n=30, e=100)
    pred = rng.normal(size=(30, 4)).astype(np.float32)
    raw = float(training_loss(pred, g["y"], g["senders"], g["receivers"], g["edge_attr"]))

    p = pad_graph(g["x"], g["y"], g["pos"], g["senders"], g["receivers"], g["edge_attr"],
                  n_pad=64, e_pad=128)
    pred_pad = np.zeros((64, 4), np.float32)
    pred_pad[:30] = pred
    padded = float(training_loss(pred_pad, np.asarray(p.y), np.asarray(p.senders),
                                 np.asarray(p.receivers), np.asarray(p.edge_attr),
                                 edge_mask=np.asarray(p.edge_mask),
                                 node_mask=np.asarray(p.node_mask)))
    np.testing.assert_allclose(padded, raw, rtol=1e-4)


def test_fno_forward_shapes():
    import jax

    from fast_eng_super_resolution_tpu.models.fno import FNO2d

    m = FNO2d(modes1=4, modes2=4, width=8, in_feats=3)
    params = m.init(jax.random.PRNGKey(0))
    x = np.ones((2, 16, 16, 3), np.float32)
    out = np.asarray(m.apply(params, x))
    assert out.shape == (2, 16, 16, 128)
    assert np.isfinite(out).all()


def test_fno_spectral_conv_matches_torch(rng):
    """SpectralConv2d parity vs direct torch.fft math (model.py:35-49)."""
    import torch

    from fast_eng_super_resolution_tpu.models.fno import _spectral_conv

    b, c, h, w, m1, m2 = 2, 3, 12, 10, 3, 4
    x = rng.normal(size=(b, c, h, w)).astype(np.float32)
    w1 = (rng.normal(size=(c, c, m1, m2)) + 1j * rng.normal(size=(c, c, m1, m2))).astype(np.complex64)
    w2 = (rng.normal(size=(c, c, m1, m2)) + 1j * rng.normal(size=(c, c, m1, m2))).astype(np.complex64)

    xt = torch.as_tensor(x)
    x_ft = torch.fft.rfft2(xt)
    out_ft = torch.zeros(b, c, h, w // 2 + 1, dtype=torch.cfloat)
    out_ft[:, :, :m1, :m2] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], torch.as_tensor(w1))
    out_ft[:, :, -m1:, :m2] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], torch.as_tensor(w2))
    expected = torch.fft.irfft2(out_ft, s=(h, w)).numpy()

    p = {"w1_re": w1.real, "w1_im": w1.imag, "w2_re": w2.real, "w2_im": w2.imag}
    got = np.asarray(_spectral_conv(p, x, m1, m2))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_deeponet_and_graphsage_forward(rng):
    import jax

    from fast_eng_super_resolution_tpu.models.deeponet import DeepONet
    from fast_eng_super_resolution_tpu.models.graphsage import GraphSAGE

    d = DeepONet(branch_input_dim=3, trunk_input_dim=2, hidden_dim=16, output_dim=4)
    dp = d.init(jax.random.PRNGKey(1))
    out = np.asarray(d.apply(dp, np.ones((2, 8, 8, 3), np.float32)))
    assert out.shape == (2, 8, 8, 4)

    g = make_random_graph(rng, n=40, e=200)
    s = GraphSAGE(in_channels=4, out_channels=4, num_layers=5)
    sp = s.init(jax.random.PRNGKey(2))
    out = np.asarray(s.apply(sp, g["x"], g["senders"], g["receivers"]))
    assert out.shape == (40, 4)
    assert np.isfinite(out).all()


def test_registry_factory_quirks():
    from fast_eng_super_resolution_tpu.models.registry import init_model
    from fast_eng_super_resolution_tpu.models.fno import FNO2d
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    m = init_model("neuralop", 4, 4, width=43, num_layers=5, n_clusters=1, root="x")
    assert isinstance(m, KernelNN) and m.width == 43 and m.depth == 5

    # fno binds in/out onto modes1/modes2 (utils.py:30-31)
    f = init_model("fno", 8, 6, width=20)
    assert isinstance(f, FNO2d) and f.modes1 == 8 and f.modes2 == 6

    with np.testing.assert_raises(KeyError):
        init_model("deeponet", 4, 4, width=16)
    with np.testing.assert_raises(ValueError):
        init_model("nope", 4, 4)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax

    from fast_eng_super_resolution_tpu.core.checkpoint import load_params, save_params
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    m = KernelNN(width=8, ker_width=4, depth=2, in_width=4, out_width=4)
    params = m.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "p.npz")
    save_params(path, params)
    loaded = load_params(path)

    g = make_random_graph(rng, n=20, e=60)
    flat_a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(params)])
    flat_b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(loaded)])
    np.testing.assert_array_equal(flat_a, flat_b)  # params roundtrip bit-exact

    a = np.asarray(m.apply(params, g["x"], g["senders"], g["receivers"], g["edge_attr"]))
    b = np.asarray(m.apply(loaded, g["x"], g["senders"], g["receivers"], g["edge_attr"]))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_teecnet_powerseries_kernel(rng):
    """TEECNet with the (reference-disconnected) PowerSeries edge kernel."""
    import jax

    from conftest import make_random_graph
    from fast_eng_super_resolution_tpu.models.teecnet import TEECNet

    g = make_random_graph(rng, n=40, e=160, c_in=4, c_out=4)
    m = TEECNet(in_channels=4, width=8, out_channels=4, num_layers=2,
                kernel_type="powerseries", num_powers=3)
    params = m.init(jax.random.PRNGKey(0))
    out = np.asarray(m.apply(params, g["x"], g["senders"], g["receivers"],
                             g["edge_attr"]))
    assert out.shape == (40, 4)
    assert np.isfinite(out).all()

    # gradient flows through the power-series coefficients
    import jax.numpy as jnp

    def loss(p):
        o = m.apply(p, g["x"], g["senders"], g["receivers"], g["edge_attr"])
        return jnp.sum(o ** 2)

    grads = jax.grad(loss)(params)
    gnorm = float(jnp.linalg.norm(grads["kernel"]["ps"]["conv0"]["root_param"]))
    assert gnorm > 0


def test_training_loss_weight_floor(rng):
    """The training path floors the gradient weight at 0 (ops/loss.py
    min_weight): the reference clamps only from above (scheduler_gnn.py:493),
    so a prediction whose gradients undershoot the target's everywhere gets a
    NEGATIVE weight sum and descent then maximizes MSE (observed runaway to
    ~-1e22 after ~100 epochs).  The faithful replica keeps the signed value."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.ops.loss import gradient_weight_scalar

    g = make_random_graph(rng, n=30, e=100)
    s, r, ea = g["senders"], g["receivers"], g["edge_attr"]
    # target with steep gradients, constant prediction -> grad_pred - grad_tgt
    # is -grad_tgt; make every channel-max negative
    y = (np.arange(30, dtype=np.float32)[:, None] * np.ones((1, 4))) * 10
    pred = np.zeros_like(y)
    faithful = float(gradient_weight_scalar(pred, y, s, r, ea))
    floored = float(gradient_weight_scalar(pred, y, s, r, ea, min_weight=0.0))
    assert faithful < 0
    assert floored >= 0.0  # per-node floor: the scalar can never go negative

    # and the composite training loss can no longer go negative there
    from fast_eng_super_resolution_tpu.core.graph import pad_graph
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import batched_loss
    import jax

    gp = pad_graph(pred, y, g["pos"], s, r, ea, 32, 128)
    batch = jax.tree.map(lambda a: jnp.asarray(a)[None], gp)
    model = KernelNN(width=8, ker_width=8, depth=2, in_width=4, out_width=4)
    params = model.init(jax.random.PRNGKey(0))
    assert float(batched_loss(model, params, batch)) >= 0.0


def test_gradient_weight_custom_vjp_parity(rng):
    """Custom-VJP gradient_weight_scalar == autograd path (value AND grads).

    The custom backward (one-hot argmax channels + unsorted segment-sums,
    ops/loss.py:_gw_scalar_bwd) replaces XLA's transpose-of-gather scatters;
    it must be bit-compatible with the FESR_LOSS_VJP=xla reference path,
    including clamp gates and both scatter_to directions.
    """
    import os

    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.ops.loss import gradient_weight_scalar

    n, e, c = 64, 256, 4
    pred = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    ea = jnp.asarray((0.5 + rng.random((e, 1))).astype(np.float32))
    em = jnp.asarray(rng.random(e) > 0.2)
    nm = jnp.asarray(rng.random(n) > 0.1)

    cases = [(em, nm, "receivers", 0.0), (None, None, "senders", None),
             (em, None, "receivers", None), (None, nm, "senders", 0.0)]
    for em_, nm_, to, mw in cases:
        def f(p, t, impl):
            os.environ["FESR_LOSS_VJP"] = impl
            try:
                return gradient_weight_scalar(p, t, s, r, ea, em_, nm_,
                                              1.0, to, mw)
            finally:
                os.environ.pop("FESR_LOSS_VJP", None)

        va = f(pred, tgt, "xla")
        vb = f(pred, tgt, "custom")
        assert abs(float(va) - float(vb)) <= 1e-4 * max(abs(float(va)), 1.0)
        ga = jax.grad(lambda p, t: f(p, t, "xla"), argnums=(0, 1))(pred, tgt)
        gb = jax.grad(lambda p, t: f(p, t, "custom"), argnums=(0, 1))(pred, tgt)
        for ta, tb in zip(ga, gb):
            denom = max(float(jnp.linalg.norm(ta)), 1e-12)
            assert float(jnp.linalg.norm(ta - tb)) / denom < 1e-5


def test_lut_knot_range_ignores_padding(rng):
    """LUT knots span the REAL edge range: padding slots carry
    edge_attr=1.0, which on fine meshes (lengths ~1e-3) stretched the
    table ~100x past the real range and collapsed its resolution (review
    finding)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    n, e_real, e_pad = 32, 200, 256
    model = KernelNN(width=12, ker_width=8, depth=2, in_width=4, out_width=4,
                     mode="lut", lut_knots=256)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, n, e_pad), jnp.int32)
    receivers = jnp.asarray(np.sort(rng.integers(0, n, e_pad)), jnp.int32)
    # real edge lengths ~1e-3; padded slots carry the pad_graph 1.0
    ea = np.full((e_pad, 1), 1.0, np.float32)
    ea[:e_real] = rng.uniform(1e-3, 2e-3, (e_real, 1))
    mask = np.zeros(e_pad, bool)
    mask[:e_real] = True
    got = model.apply(params, x, senders, receivers, jnp.asarray(ea),
                      edge_mask=jnp.asarray(mask))
    exact = KernelNN(width=12, ker_width=8, depth=2, in_width=4, out_width=4,
                     mode="edge3d")
    ref = exact.apply(params, x, senders, receivers, jnp.asarray(ea),
                      edge_mask=jnp.asarray(mask))
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 5e-3, rel  # old global range gave ~knots/500 effective res


def test_lut_fully_masked_graph_finite_grads(rng):
    """A fully-masked graph (padded batch tail under vmap) must produce
    FINITE gradients through the LUT path: inf knot positions NaN'd the
    backward even though the forward was masked to zero (review finding)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    n, e = 16, 64
    model = KernelNN(width=8, ker_width=8, depth=2, in_width=4, out_width=4,
                     mode="lut", lut_knots=64)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    senders = jnp.zeros(e, jnp.int32)
    receivers = jnp.zeros(e, jnp.int32)
    ea = jnp.ones((e, 1), jnp.float32)
    mask = jnp.zeros(e, bool)  # everything padded

    def loss(p):
        out = model.apply(p, x, senders, receivers, ea, edge_mask=mask)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
