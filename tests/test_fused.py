"""Fused Pallas edge-conv (ops/fused_conv.py): interpret-mode parity on CPU.

The real-TPU compile + throughput numbers live in the bench
(1,183k nodes/s at w=48 d=5, 2.85x over the edge3d XLA path, v5e); these
tests pin the math: the fused layer equals the XLA segment-op formulation
(same spec: reference NNConv_old, model.py:521-536) on arbitrary graphs,
including masked edges, isolated nodes, and full-model forward parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _random_graph(rng, n, e, c, k, sorted_recv=True, mask_frac=0.1):
    recv = rng.integers(0, n, e).astype(np.int32)
    if sorted_recv:
        recv = np.sort(recv)
    send = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) > mask_frac
    x = rng.normal(size=(n, c)).astype(np.float32)
    ea = rng.random((e, 1)).astype(np.float32)
    mlp = [{"w": (rng.normal(size=(1, k)) * 0.5).astype(np.float32),
            "b": (rng.normal(size=(k,)) * 0.1).astype(np.float32)},
           {"w": (rng.normal(size=(k, k)) * 0.3).astype(np.float32),
            "b": (rng.normal(size=(k,)) * 0.1).astype(np.float32)},
           {"w": (rng.normal(size=(k, c * c)) * 0.2).astype(np.float32),
            "b": (rng.normal(size=(c * c,)) * 0.1).astype(np.float32)}]
    return recv, send, mask, x, ea, mlp


def _xla_reference(recv, send, mask, x, ea, mlp, n):
    from fast_eng_super_resolution_tpu.ops.message_passing import (
        apply_edge_mlp_hidden)
    from fast_eng_super_resolution_tpu.ops.segment import masked_segment_mean

    c = x.shape[1]
    h = apply_edge_mlp_hidden(mlp, jnp.asarray(ea), jax.nn.relu)
    w_e = h @ mlp[-1]["w"] + mlp[-1]["b"]
    msg = jnp.einsum("ei,eio->eo", jnp.asarray(x)[send],
                     w_e.reshape(len(recv), c, c))
    return np.asarray(masked_segment_mean(msg, jnp.asarray(recv), n,
                                          jnp.asarray(mask)))


def _fused(recv, send, mask, x, ea, mlp, n, rows_blk=16, quantum=64,
           gemm_dtype="float32"):
    from fast_eng_super_resolution_tpu.ops.fused_conv import (
        build_scatter_blocks, fused_edge_conv)
    from fast_eng_super_resolution_tpu.ops.message_passing import (
        apply_edge_mlp_hidden)

    c = x.shape[1]
    blocks = build_scatter_blocks(recv, send, n, mask, rows_blk=rows_blk,
                                  quantum=quantum)
    h_b = apply_edge_mlp_hidden(mlp, jnp.asarray(ea[blocks.edge_perm]),
                                jax.nn.relu)
    out = fused_edge_conv(h_b, jnp.asarray(x),
                          jnp.asarray(blocks.senders_perm),
                          jnp.asarray(mlp[-1]["w"]), jnp.asarray(mlp[-1]["b"]),
                          jnp.asarray(blocks.s_matrix), c_in=c, c_out=c,
                          rows_blk=blocks.rows_blk, blk=blocks.blk,
                          gemm_dtype=gemm_dtype, interpret=True)
    return np.asarray(out)[:n], blocks


@pytest.mark.parametrize("c", [12, 16])  # 12: 2/3-smooth fold; 16: pow2 fold
def test_fused_layer_matches_xla(c):
    rng = np.random.default_rng(0)
    n, e = 100, 900
    recv, send, mask, x, ea, mlp = _random_graph(rng, n, e, c, 24)
    ref = _xla_reference(recv, send, mask, x, ea, mlp, n)
    got, blocks = _fused(recv, send, mask, x, ea, mlp, n)
    assert blocks.blk % 64 == 0
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_fused_handles_unsorted_receivers_and_isolated_nodes():
    rng = np.random.default_rng(1)
    n, e, c = 64, 300, 12
    recv, send, mask, x, ea, mlp = _random_graph(rng, n, e, c, 16,
                                                 sorted_recv=False)
    recv[recv == 7] = 8  # node 7 isolated: mean over zero edges -> 0
    ref = _xla_reference(recv, send, mask, x, ea, mlp, n)
    got, _ = _fused(recv, send, mask, x, ea, mlp, n)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    assert np.all(got[7] == 0)


def test_fused_odd_width_fallback_fold():
    """Non-2/3-smooth c_in (e.g. the reference's 43) uses the chunk-
    accumulate fold — slower but exact."""
    rng = np.random.default_rng(2)
    n, e, c = 40, 200, 11
    recv, send, mask, x, ea, mlp = _random_graph(rng, n, e, c, 8)
    ref = _xla_reference(recv, send, mask, x, ea, mlp, n)
    got, _ = _fused(recv, send, mask, x, ea, mlp, n)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_scatter_blocks_size_guard():
    from fast_eng_super_resolution_tpu.ops.fused_conv import (
        build_scatter_blocks)

    recv = np.sort(np.random.default_rng(0).integers(0, 1000, 5000)).astype(np.int32)
    send = np.zeros(5000, np.int32)
    with pytest.raises(ValueError, match="scatter blocks"):
        build_scatter_blocks(recv, send, 1000, max_s_bytes=1000)


def test_kernelnn_apply_fused_full_forward_parity():
    """Full model: apply_fused == apply (XLA path) on a padded graph."""
    from fast_eng_super_resolution_tpu.core.graph import pad_and_bucket
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import make_sample_pair
    from fast_eng_super_resolution_tpu.core.graph import merge_batch
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    s = make_sample_pair(n_high=(10, 5, 5), n_low=(6, 3, 3), seed=0)
    subs = extract_subdomains(s["pos"], s["mesh"].cells, s["x"], s["y"],
                              2, "all_intersecting")
    raw = [dict(x=g.x, y=g.y, pos=g.pos, senders=g.senders,
                receivers=g.receivers, edge_attr=g.edge_attr,
                global_ids=g.global_node_ids) for g in subs]
    (_, _, batch), = pad_and_bucket(raw)
    merged, _ = merge_batch(batch)
    n = merged.x.shape[0]

    model = KernelNN(width=12, ker_width=8, depth=3, ker_in=1,
                     in_width=4, out_width=4, mode="factored")
    params = model.init(jax.random.PRNGKey(0))
    ref = np.asarray(model.apply(params, merged.x, merged.senders,
                                 merged.receivers, merged.edge_attr,
                                 edge_mask=merged.edge_mask))

    ea_b, sp, sm, rows_blk, blk = model.prepare_fused(
        np.asarray(merged.senders), np.asarray(merged.receivers),
        np.asarray(merged.edge_attr), n, np.asarray(merged.edge_mask),
        rows_blk=16, quantum=64)
    got = np.asarray(model.apply_fused(params, jnp.asarray(merged.x),
                                       jnp.asarray(ea_b), jnp.asarray(sp),
                                       jnp.asarray(sm), rows_blk=rows_blk,
                                       blk=blk, gemm_dtype="float32",
                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_fused_training_loss_and_grads_match_merged():
    """layout='fused' Trainer loss + grads == layout='merged' XLA path
    (interpret mode, f32)."""
    from fast_eng_super_resolution_tpu.core.graph import (merge_batch,
                                                          pad_and_bucket)
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import make_sample_pair
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import (
        Trainer, make_fused_batch, merged_fused_loss, merged_loss)

    s = make_sample_pair(n_high=(10, 5, 5), n_low=(6, 3, 3), seed=0)
    subs = extract_subdomains(s["pos"], s["mesh"].cells, s["x"], s["y"],
                              2, "all_intersecting")
    raw = [dict(x=g.x, y=g.y, pos=g.pos, senders=g.senders,
                receivers=g.receivers, edge_attr=g.edge_attr,
                global_ids=g.global_node_ids) for g in subs]
    (_, _, batch), = pad_and_bucket(raw)
    merged, _ = merge_batch(batch)

    model = KernelNN(width=12, ker_width=8, depth=2, ker_in=1,
                     in_width=4, out_width=4, mode="factored")
    params = model.init(jax.random.PRNGKey(0))
    fused_batch, rows_blk, blk = make_fused_batch(merged, model, rows_blk=16,
                                                  quantum=64)

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: merged_loss(model, p, merged))(params)
    got_loss, got_grads = jax.value_and_grad(
        lambda p: merged_fused_loss(model, p, fused_batch, rows_blk, blk,
                                    gemm_dtype="float32", interpret=True))(params)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-4)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_g, _ = jax.tree_util.tree_flatten(got_grads)
    for a, b in zip(flat_g, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)

    # and a short fused training loop actually learns
    trainer = Trainer(model, lr=2e-3, layout="fused", donate=False,
                      fused_rows_blk=rows_blk, fused_blk=blk,
                      fused_dtype="float32", fused_interpret=True)
    params, opt_state = trainer.init(jax.random.PRNGKey(1))
    first = trainer.evaluate(params, fused_batch)
    for _ in range(10):
        params, opt_state, loss = trainer.step(params, opt_state, fused_batch)
    assert np.isfinite(float(loss))
    assert float(loss) < first, (float(loss), first)


def test_teecnet_fused_matches_apply():
    """TEECNet.apply_fused == TEECNet.apply (dense kernel, interpret mode):
    the fused kernel applies to linear(x_j) with the pre-linear root update
    (reference KernelConv, model.py:426-445)."""
    from fast_eng_super_resolution_tpu.models.teecnet import TEECNet

    rng = np.random.default_rng(3)
    n, e = 120, 1000
    model = TEECNet(in_channels=4, width=12, out_channels=4, num_layers=3)
    assert model.fused_ok
    params = model.init(jax.random.PRNGKey(0))
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    send = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) > 0.1
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ea = (rng.random((e, 1)) + 0.1).astype(np.float32)

    ref = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(send),
                                 jnp.asarray(recv), jnp.asarray(ea),
                                 edge_mask=jnp.asarray(mask)))
    ea_b, sp, sm, rows_blk, blk = model.prepare_fused(
        send, recv, ea, n, mask, rows_blk=16, quantum=64)
    got = np.asarray(model.apply_fused(
        params, jnp.asarray(x), jnp.asarray(ea_b), jnp.asarray(sp),
        jnp.asarray(sm), rows_blk=rows_blk, blk=blk, gemm_dtype="float32",
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def test_teecnet_fused_ad_grad_parity():
    """Gradients of TEECNet's fused training path match the XLA apply."""
    from fast_eng_super_resolution_tpu.models.teecnet import TEECNet

    rng = np.random.default_rng(4)
    n, e = 80, 600
    model = TEECNet(in_channels=4, width=8, out_channels=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(1))
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    send = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) > 0.1
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    ea = (rng.random((e, 1)) + 0.1).astype(np.float32)
    y = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

    def loss_ref(p):
        out = model.apply(p, x, jnp.asarray(send), jnp.asarray(recv),
                          jnp.asarray(ea), edge_mask=jnp.asarray(mask))
        return jnp.mean((out - y) ** 2)

    ea_b, aux, sm, rows_blk, blk = model.prepare_fused_train(
        send, recv, ea, n, mask, rows_blk=16, quantum=64)
    aux_j = {k: jnp.asarray(v) for k, v in aux.items()}

    def loss_fused(p):
        out = model.apply_fused_ad(p, x, jnp.asarray(ea_b), aux_j,
                                   jnp.asarray(sm), rows_blk=rows_blk,
                                   blk=blk, gemm_dtype="float32",
                                   interpret=True)
        return jnp.mean((out - y) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-4)
    fa = jax.tree_util.tree_leaves(g_ref)
    fb = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_teecnet_powerseries_not_fused():
    from fast_eng_super_resolution_tpu.models.teecnet import TEECNet

    m = TEECNet(in_channels=4, width=8, out_channels=4,
                kernel_type="powerseries")
    assert not m.fused_ok


def test_bwd_kernel_matches_dense_reference_small_cin():
    """fused_edge_conv_bwd == autograd of the dense math, for BOTH xe impls,
    at c_in < 8 (exercises the db3 sublane zero-pad) and c_in != c_out."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.ops import fused_conv as fc

    rng = np.random.default_rng(0)
    C_IN, C_OUT, K, RB, BLK, SUB, NB = 4, 6, 4, 8, 256, 128, 2
    C2 = C_IN * C_OUT
    slots, n = NB * BLK, NB * RB
    h = jnp.asarray(rng.normal(size=(slots, K)).astype(np.float32) * .3)
    x = jnp.asarray(rng.normal(size=(n, C_IN)).astype(np.float32))
    sp = jnp.asarray(rng.integers(0, n, slots).astype(np.int32))
    w3 = jnp.asarray(rng.normal(size=(K, C2)).astype(np.float32) * .2)
    b3 = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * .1)
    s_np = np.zeros((n, BLK), np.float32)
    s_np[np.arange(n), rng.integers(0, BLK, n)] = 1.
    s = jnp.asarray(s_np)
    g = jnp.asarray(rng.normal(size=(n, C_OUT)).astype(np.float32))
    S_big = np.zeros((n, slots), np.float32)
    for r in range(n):
        b = r // RB
        S_big[r, b * BLK:(b + 1) * BLK] = s_np[r]
    S_big = jnp.asarray(S_big)

    def loss(w3_, b3_, x_, h_):
        W = (h_ @ w3_ + b3_).reshape(slots, C_IN, C_OUT)
        msg = jnp.sum(W * x_[sp][:, :, None], axis=1)
        return jnp.sum((S_big @ msg) * g)

    ref = jax.grad(loss, argnums=(0, 1, 2, 3))(w3, b3, x, h)
    kw = dict(c_in=C_IN, c_out=C_OUT, rows_blk=RB, blk=BLK, sub=SUB,
              gemm_dtype="float32", interpret=True)
    for impl in ("gemm", "repeat"):
        dh, dxs, dw3, db3 = fc.fused_edge_conv_bwd(g, h, x[sp], w3, b3, s,
                                                   xe_impl=impl, **kw)
        dx = jax.ops.segment_sum(dxs, sp, num_segments=n)
        for a, b in [(ref[0], dw3), (ref[1], db3), (ref[2], dx), (ref[3], dh)]:
            rel = float(jnp.linalg.norm(a - b)
                        / (float(jnp.linalg.norm(a)) or 1.0))
            assert rel < 1e-5, (impl, rel)


def test_lowrank_fused_ad_matches_xla_autograd():
    """Rank-r fused conv custom VJP (fwd + bwd kernels) == XLA autograd of
    the same model, interpret mode, ranks below and above the sublane pad."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.ops.fused_conv import prepare_fused_train

    rng = np.random.default_rng(0)
    n, e = 128, 1000
    for rank in (4, 16):
        m = KernelNN(width=16, ker_width=8, depth=3, ker_in=1, in_width=4,
                     out_width=4, kernel_rank=rank, edges_sorted=True)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        r = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
        ea = jnp.asarray((0.5 + rng.random((e, 1))).astype(np.float32))
        em = jnp.asarray(rng.random(e) > 0.1)
        y = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

        def loss_xla(p):
            return jnp.sum((m.apply(p, x, s, r, ea, edge_mask=em) - y) ** 2)

        ea_b, aux, sm, rb, bk = prepare_fused_train(
            np.asarray(s), np.asarray(r), np.asarray(ea), n, np.asarray(em))
        ea_b, sm = jnp.asarray(ea_b), jnp.asarray(sm)
        aux = {k2: jnp.asarray(v) for k2, v in aux.items()}

        def loss_fused(p):
            out = m.apply_fused_ad(p, x, ea_b, aux, sm, rows_blk=rb, blk=bk,
                                   gemm_dtype="float32", interpret=True)
            return jnp.sum((out - y) ** 2)

        la, lb = float(loss_xla(p)), float(loss_fused(p))
        assert abs(la - lb) / max(abs(la), 1.0) < 1e-5
        ga, gb = jax.grad(loss_xla)(p), jax.grad(loss_fused)(p)
        for ta, tb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            denom = max(float(jnp.linalg.norm(ta)), 1e-12)
            assert float(jnp.linalg.norm(ta - tb)) / denom < 1e-4, rank


def test_compact_s_device_parity():
    """Device-built S (compact generators -> jitted compare-multiply) is
    bit-identical to the dense host build, incl. padding slots (-1 rows),
    multi-block graphs, sum aggregation, and the stacked n_dev variant."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.ops.fused_conv import (
        CompactS, build_scatter_blocks, to_device_s, to_device_s_stacked)

    rng = np.random.default_rng(3)
    for n, e, aggr in ((90, 400, "mean"), (90, 400, "sum"), (17, 5, "mean")):
        recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
        send = rng.integers(0, n, e).astype(np.int32)
        mask = rng.random(e) > 0.15
        dense = build_scatter_blocks(recv, send, n, mask, rows_blk=16,
                                     quantum=32, aggr=aggr)
        comp = build_scatter_blocks(recv, send, n, mask, rows_blk=16,
                                    quantum=32, aggr=aggr, dense=False)
        assert comp.s_matrix is None
        s_dev = to_device_s(comp.compact_s, comp.rows_blk, comp.blk)
        np.testing.assert_array_equal(np.asarray(s_dev), dense.s_matrix)
        # dense host arrays pass through to_device_s unchanged
        np.testing.assert_array_equal(
            np.asarray(to_device_s(dense.s_matrix, dense.rows_blk,
                                   dense.blk)), dense.s_matrix)
        # every other block field is identical across the two modes
        np.testing.assert_array_equal(dense.edge_perm, comp.edge_perm)
        np.testing.assert_array_equal(dense.senders_perm, comp.senders_perm)
        np.testing.assert_array_equal(dense.slot_mask, comp.slot_mask)

    # stacked variant: two same-geometry groups expand blockwise in one jit
    recv = np.sort(rng.integers(0, 64, 300)).astype(np.int32)
    send = rng.integers(0, 64, 300).astype(np.int32)
    b1 = build_scatter_blocks(recv, send, 64, None, rows_blk=16, quantum=128)
    b2 = build_scatter_blocks(recv[::-1].copy(), send, 64, None, rows_blk=16,
                              quantum=128)
    assert b1.blk == b2.blk
    flat = CompactS(
        np.concatenate([b1.compact_s.slot_rows, b2.compact_s.slot_rows]),
        np.concatenate([b1.compact_s.row_weight, b2.compact_s.row_weight]))
    st = np.asarray(to_device_s_stacked(flat, 16, b1.blk, 2))
    np.testing.assert_array_equal(st[0], b1.s_matrix)
    np.testing.assert_array_equal(st[1], b2.s_matrix)
