"""Trainer tests: loss decreases, sharded multi-device step runs, LR schedules."""

import numpy as np
import pytest


def _make_batch(n_graphs=4, seed=0):
    import jax

    from fast_eng_super_resolution_tpu.core.graph import pad_and_bucket
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import make_sample_pair

    s = make_sample_pair(n_high=(12, 6, 6), n_low=(6, 3, 3))
    subs = extract_subdomains(s["pos"], s["mesh"].cells, s["x"], s["y"],
                              n_graphs, "all_intersecting")
    raw = [dict(x=g.x, y=g.y, pos=g.pos, senders=g.senders, receivers=g.receivers,
                edge_attr=g.edge_attr, global_ids=g.global_node_ids) for g in subs]
    buckets = pad_and_bucket(raw)
    assert len(buckets) == 1
    return buckets[0][2]


def test_training_reduces_loss():
    import jax

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import Trainer

    batch = _make_batch()
    model = KernelNN(width=16, ker_width=8, depth=3, in_width=4, out_width=4)
    trainer = Trainer(model, lr=3e-3)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    losses = []
    for _ in range(80):
        params, opt_state, loss = trainer.step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[::20]
    assert np.isfinite(losses).all()


def test_mse_loss_kind_and_eval():
    import jax

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import Trainer

    batch = _make_batch()
    model = KernelNN(width=8, ker_width=4, depth=2, in_width=4, out_width=4)
    trainer = Trainer(model, lr=1e-3, loss_kind="mse")
    params, opt_state = trainer.init(jax.random.PRNGKey(1))
    val0 = trainer.evaluate(params, batch)
    for _ in range(20):
        params, opt_state, _ = trainer.step(params, opt_state, batch)
    assert trainer.evaluate(params, batch) < val0

    pred = trainer.predict(params, batch)
    assert pred.shape == batch.y.shape


def test_sharded_step_on_virtual_mesh():
    """One jit step with the batch sharded over 8 virtual CPU devices —
    the TPU-native replacement for the reference's DDP path."""
    import jax

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate, shard_batch)
    from fast_eng_super_resolution_tpu.parallel.train import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _make_batch(n_graphs=6)  # deliberately not divisible by 8
    mesh = make_mesh()
    batch, real_b = pad_batch_to_multiple(batch, 8)
    assert batch.x.shape[0] == 8 and real_b >= 6

    model = KernelNN(width=8, ker_width=4, depth=2, in_width=4, out_width=4)
    trainer = Trainer(model, lr=1e-3, donate=False)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    params = replicate(params, mesh)
    sharded = shard_batch(batch, mesh)

    p2, _, loss = trainer.step(params, opt_state, sharded)
    assert np.isfinite(float(loss))
    # padded graphs (masked out) must not change the result vs unsharded
    p_ref, _, loss_ref = trainer.step(params, opt_state, batch)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_lr_schedules():
    from fast_eng_super_resolution_tpu.parallel.train import ReduceLROnPlateau, StepLR

    s = StepLR(lr=1.0, step_size=30, gamma=0.1)
    assert s(0) == 1.0 and s(29) == 1.0
    np.testing.assert_allclose(s(30), 0.1)
    np.testing.assert_allclose(s(60), 0.01)

    r = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    for v in [1.0, 0.9, 0.8]:
        assert r.update(v) == 1.0
    # plateau: 3 bad epochs (> patience) triggers halving
    r.update(0.9); r.update(0.9)
    assert r.update(0.9) == 0.5


def test_shard_map_step_matches_jit_step():
    """Explicit psum shard_map step == GSPMD jit step (8 virtual devices)."""
    import jax

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate, shard_batch)
    from fast_eng_super_resolution_tpu.parallel.train import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _make_batch(n_graphs=8)
    mesh = make_mesh()
    model = KernelNN(width=8, ker_width=4, depth=2, in_width=4, out_width=4)
    trainer = Trainer(model, lr=1e-3, donate=False)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    params_rep = replicate(params, mesh)
    sharded = shard_batch(batch, mesh)

    p_jit, _, loss_jit = trainer.step(params_rep, opt_state, sharded)
    sm_step = trainer.make_shard_map_step(mesh)
    p_sm, _, loss_sm = sm_step(params_rep, opt_state, sharded)

    np.testing.assert_allclose(float(loss_sm), float(loss_jit), rtol=1e-4)
    flat_a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_jit)])
    flat_b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_sm)])
    np.testing.assert_allclose(flat_a, flat_b, rtol=1e-2, atol=1e-4)


def test_merged_layout_trainer_matches_batched():
    """merged-layout loss/step == batched vmap version (same math)."""
    import jax

    from fast_eng_super_resolution_tpu.core.graph import merge_batch
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import Trainer

    batch = _make_batch(n_graphs=4)
    merged, _ = merge_batch(batch)
    model = KernelNN(width=8, ker_width=4, depth=2, in_width=4, out_width=4)
    tb = Trainer(model, lr=1e-3, donate=False)
    tm = Trainer(model, lr=1e-3, donate=False, layout="merged")
    params, opt_state = tb.init(jax.random.PRNGKey(0))

    lb = tb.evaluate(params, batch)
    lm = tm.evaluate(params, merged)
    np.testing.assert_allclose(lm, lb, rtol=1e-5)

    pb, _, loss_b = tb.step(params, opt_state, batch)
    pm, _, loss_m = tm.step(params, opt_state, merged)
    np.testing.assert_allclose(float(loss_m), float(loss_b), rtol=1e-5)
    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(pb)])
    fb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(pm)])
    np.testing.assert_allclose(fa, fb, rtol=1e-4, atol=1e-6)


def test_epoch_scan_matches_step_loop():
    """Trainer.epoch (single-dispatch lax.scan over stacked batches) must be
    numerically identical to the per-batch step loop, and stack_batches must
    refuse unequal shapes."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.train import Trainer, stack_batches

    b1 = _make_batch(4, seed=0)
    b2 = jax.tree_util.tree_map(lambda a: a, b1)  # same shapes, same content ok
    model = KernelNN(width=8, ker_width=8, depth=2, in_width=4, out_width=4)
    tr = Trainer(model, lr=1e-3, donate=False)
    params, opt = tr.init(jax.random.PRNGKey(0))

    stacked = stack_batches([b1, b2])
    assert stacked is not None
    order = np.array([1, 0])

    p_a, o_a = params, opt
    losses_a = []
    for i in order:
        p_a, o_a, l = tr.step(p_a, o_a, [b1, b2][i])
        losses_a.append(float(l))
    p_b, o_b, losses_b = tr.epoch(params, opt, stacked, order)
    np.testing.assert_allclose(np.asarray(losses_b), losses_a, rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   atol=1e-7)

    # unequal shapes -> no stacking (caller falls back)
    smaller = jax.tree_util.tree_map(lambda a: a[:2], b1)
    assert stack_batches([b1, smaller]) is None
    assert stack_batches([]) is None


def test_expert_sharded_routed_dispatch_over_mesh():
    """EP-style sharding (round-1 next-step #4): stacked expert params
    sharded on an 'expert' mesh axis, batch sharded on 'data' — the routed
    dispatch compiles under GSPMD (XLA inserts the expert-gather collectives
    over ICI) and matches the replicated result."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.dispatch import (
        make_routed_apply, stack_params)

    devices = jax.devices()
    if len(devices) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devices[:8]).reshape(4, 2), ("data", "expert"))

    model = KernelNN(width=8, ker_width=8, depth=2, ker_in=1,
                     in_width=4, out_width=4)
    params_list = [model.init(jax.random.PRNGKey(i)) for i in range(2)]
    stacked = stack_params(params_list)

    import jax.numpy as jnp

    batch = _make_batch(n_graphs=4)
    labels = jnp.asarray([0, 1, 1, 0], jnp.int32)
    routed = make_routed_apply(model)
    ref = np.asarray(routed(stacked, labels, batch))

    stacked_sharded = jax.device_put(
        stacked, NamedSharding(mesh, P("expert")))
    batch_sharded = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), batch)
    labels_sharded = jax.device_put(labels, NamedSharding(mesh, P("data")))
    out = np.asarray(routed(stacked_sharded, labels_sharded, batch_sharded))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fused_shard_map_step_matches_single_device():
    """Multi-chip fused training (per-device scatter blocks + psum'd loss
    parts/grads over the 'data' axis) == the single-device fused step on the
    concatenated batch.  Pallas interpret mode on the 8-virtual-CPU mesh."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.core.graph import merge_batch
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.parallel.mesh import make_mesh, replicate
    from fast_eng_super_resolution_tpu.parallel.mesh import shard_batch
    from fast_eng_super_resolution_tpu.parallel.train import (
        Trainer, make_fused_batch, make_fused_shard_batches)

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    batch = _make_batch(n_graphs=8)
    model = KernelNN(width=8, ker_width=8, depth=2, in_width=4, out_width=4)

    mesh = make_mesh(jax.devices()[:4])
    sharded, rows_blk, blk = make_fused_shard_batches(batch, model, 4,
                                                      rows_blk=16)
    trainer = Trainer(model, lr=1e-3, donate=False, fused_dtype="float32",
                      layout="fused", fused_rows_blk=rows_blk, fused_blk=blk,
                      fused_interpret=True)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    params_rep = replicate(params, mesh)
    sharded = shard_batch(sharded, mesh)
    sm_step = trainer.make_fused_shard_map_step(mesh, rows_blk, blk,
                                                interpret=True)
    p_sm, _, loss_sm = sm_step(params_rep, opt_state, sharded)

    # single-device reference: fused loss on the whole merged batch
    merged, _ = merge_batch(batch)
    ref_batch, rb2, blk2 = make_fused_batch(merged, model, rows_blk=16)
    ref_trainer = Trainer(model, lr=1e-3, donate=False, layout="fused",
                          fused_rows_blk=rb2, fused_blk=blk2,
                          fused_dtype="float32", fused_interpret=True)
    p_ref, _, loss_ref = ref_trainer.step(params, opt_state, ref_batch)

    np.testing.assert_allclose(float(loss_sm), float(loss_ref), rtol=1e-5)
    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_ref)])
    fb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_sm)])
    np.testing.assert_allclose(fb, fa, rtol=1e-3, atol=1e-5)


def test_grid_trainer_dp_epoch_matches_single_device():
    """Grid-family DP (round 3): epoch_stacked with the per-step batch axis
    sharded on an 8-device data mesh reproduces the single-device epoch —
    params replicated, GSPMD emits the per-step grad psum (the DDP pattern
    for FNO/DeepONet training, scheduler_gnn.py:349-386)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO2d
    from fast_eng_super_resolution_tpu.parallel.grid_train import (
        GridTrainer, shard_grid_epoch)
    from fast_eng_super_resolution_tpu.parallel.mesh import make_mesh, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs virtual devices")

    rng = np.random.default_rng(0)
    xb = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)  # [S, B, H, W, C]
    yb = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)

    model = FNO2d(modes1=3, modes2=3, width=6, in_feats=1, spectral_impl="fft")
    trainer = GridTrainer(model, lr=1e-3, out_channels=1)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), xb[0])

    p_ref, _, losses_ref = trainer.epoch_stacked(params, opt_state,
                                                 jnp.asarray(xb),
                                                 jnp.asarray(yb))

    mesh = make_mesh()
    xs, ys = shard_grid_epoch(jnp.asarray(xb), jnp.asarray(yb), mesh)
    p_dp, _, losses_dp = trainer.epoch_stacked(
        replicate(params, mesh), replicate(opt_state, mesh), xs, ys)

    np.testing.assert_allclose(np.asarray(losses_dp), np.asarray(losses_ref),
                               rtol=1e-5)
    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_ref)])
    fb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_dp)])
    np.testing.assert_allclose(fb, fa, rtol=1e-4, atol=1e-6)


def test_fused_shard_batches_compact_s():
    """expand_s=False ships S as compact generators; expanding them per
    group matches the expand_s=True stacked device S exactly, and
    with_graph=False omits the merged-graph stack."""
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.ops.fused_conv import expand_s
    from fast_eng_super_resolution_tpu.parallel.train import (
        make_fused_shard_batches)

    batch = _make_batch(n_graphs=4)
    model = KernelNN(width=8, ker_width=8, depth=2, in_width=4, out_width=4)
    dense, rb, bk = make_fused_shard_batches(batch, model, 2, rows_blk=16)
    comp, rb2, bk2 = make_fused_shard_batches(batch, model, 2, rows_blk=16,
                                              with_graph=False,
                                              expand_s=False)
    assert (rb, bk) == (rb2, bk2)
    assert comp["graph"] is None and "s" not in comp["fused"]
    # inference callers get only the forward's senders_perm; the backward's
    # senders_dump is stacked/uploaded for training callers alone
    assert set(comp["fused"]["aux"]) == {"senders_perm"}
    assert set(dense["fused"]["aux"]) == {"senders_perm", "senders_dump"}
    sc = comp["fused"]["s_compact"]
    for d in range(2):
        got = np.asarray(expand_s(sc["slot_rows"][d], sc["row_weight"][d],
                                  rows_blk=rb, blk=bk))
        np.testing.assert_array_equal(got, np.asarray(dense["fused"]["s"][d]))
    np.testing.assert_array_equal(np.asarray(comp["fused"]["edge_attr"]),
                                  np.asarray(dense["fused"]["edge_attr"]))
