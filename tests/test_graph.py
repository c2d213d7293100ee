"""core/graph unit tests: padding, bucketing, merging."""

import numpy as np

from conftest import make_random_graph


def test_pad_and_bucket_nonuniform(rng):
    from fast_eng_super_resolution_tpu.core.graph import BucketSpec, pad_and_bucket

    gs = [make_random_graph(rng, n=n, e=e) for n, e in
          ((50, 200), (60, 250), (400, 2000), (420, 2100))]
    raw = [dict(x=g["x"], y=g["y"], pos=g["pos"], senders=g["senders"],
                receivers=g["receivers"], edge_attr=g["edge_attr"]) for g in gs]
    spec = BucketSpec(node_multiple=64, edge_multiple=256, min_nodes=64, min_edges=256)

    buckets = pad_and_bucket(raw, spec, uniform=False)
    assert 2 <= len(buckets) <= 3  # small pair shares a bucket; big ones split
    covered = sorted(i for _, idxs, _ in buckets for i in idxs)
    assert covered == [0, 1, 2, 3]
    for (n_pad, e_pad), idxs, batch in buckets:
        assert batch.x.shape == (len(idxs), n_pad, 4)
        assert batch.senders.shape == (len(idxs), e_pad)
        assert n_pad % 64 == 0 and e_pad % 256 == 0

    single = pad_and_bucket(raw, spec, uniform=True)
    assert len(single) == 1


def test_merge_batch_block_diagonal(rng):
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.core.graph import (merge_batch,
                                                          pad_and_bucket)

    gs = [make_random_graph(rng, n=30, e=100) for _ in range(3)]
    raw = [dict(x=g["x"], y=g["y"], pos=g["pos"], senders=g["senders"],
                receivers=g["receivers"], edge_attr=g["edge_attr"]) for g in gs]
    (_, _, batch), = pad_and_bucket(raw)
    merged, graph_ids = merge_batch(batch)
    b, n = batch.x.shape[0], batch.x.shape[1]
    assert merged.x.shape == (b * n, 4)
    assert graph_ids.shape == (b * n,)
    # edges stay within their graph's node range (block-diagonal)
    s = np.asarray(merged.senders)
    gid_of_edge = np.repeat(np.arange(b), batch.senders.shape[1])
    assert ((s >= gid_of_edge * n) & (s < (gid_of_edge + 1) * n)).all()
    # masked-out padding preserved
    assert int(merged.node_mask.sum()) == int(batch.node_mask.sum())


def test_merge_batch_host_stays_numpy(rng):
    """A host (numpy) batch merges with ZERO device involvement — on the
    axon relay every eager jnp op in the old path cost a ~0.5 s tunnel
    dispatch, and fused prep then fetched the device results straight back
    (the round-3 1M-node cold-prep bottleneck)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.core.graph import (merge_batch,
                                                          pad_and_bucket,
                                                          stack_graphs)

    gs = [make_random_graph(rng, n=30, e=100) for _ in range(3)]
    raw = [dict(x=g["x"], y=g["y"], pos=g["pos"], senders=g["senders"],
                receivers=g["receivers"], edge_attr=g["edge_attr"]) for g in gs]
    (_, _, host_batch), = pad_and_bucket(raw, to_device=False)
    merged, graph_ids = merge_batch(host_batch)
    for leaf in (merged.x, merged.senders, merged.receivers, merged.edge_attr,
                 merged.node_mask, merged.edge_mask, merged.global_ids,
                 graph_ids):
        assert isinstance(leaf, np.ndarray), type(leaf)
    # bit-identical to the device (jnp) path
    (_, _, dev_batch), = pad_and_bucket(raw, to_device=True)
    merged_d, graph_ids_d = merge_batch(dev_batch)
    np.testing.assert_array_equal(merged.senders, np.asarray(merged_d.senders))
    np.testing.assert_array_equal(merged.receivers,
                                  np.asarray(merged_d.receivers))
    np.testing.assert_array_equal(merged.x, np.asarray(merged_d.x))
    np.testing.assert_array_equal(graph_ids, np.asarray(graph_ids_d))


def test_resolve_mode():
    from fast_eng_super_resolution_tpu.ops.message_passing import resolve_mode

    assert resolve_mode("edge") == "edge"
    assert resolve_mode("factored") == "factored"
    # on the CPU test backend, auto -> factored
    assert resolve_mode("auto") == "factored"


def test_sorted_edges_preserved_through_padding_and_merge(rng):
    """pad_graph sorts by receiver; merge_batch keeps global sortedness —
    the invariant behind models' edges_sorted=True fast path."""
    from fast_eng_super_resolution_tpu.core.graph import merge_batch, pad_and_bucket

    gs = [make_random_graph(rng, n=30, e=100) for _ in range(3)]
    raw = [dict(x=g["x"], y=g["y"], pos=g["pos"], senders=g["senders"],
                receivers=g["receivers"], edge_attr=g["edge_attr"]) for g in gs]
    (_, _, batch), = pad_and_bucket(raw)
    r = np.asarray(batch.receivers)
    assert all((np.diff(r[b]) >= 0).all() for b in range(r.shape[0]))
    merged, _ = merge_batch(batch)
    assert (np.diff(np.asarray(merged.receivers)) >= 0).all()


def test_pad_bucket_reserves_padded_node():
    """bucket_for reserves at least one PADDED node, because padded edges
    point at node n_pad-1 — at n == n_pad that aliased a real node and
    consumers without an edge_mask scattered spurious unit-length messages
    into it (review finding)."""
    import pytest

    from fast_eng_super_resolution_tpu.core.graph import BucketSpec, pad_graph

    spec = BucketSpec()
    n_pad, _ = spec.bucket_for(256, 100)
    assert n_pad > 256  # exact multiple still gets a padded node
    with pytest.raises(ValueError, match="padded node"):
        pad_graph(np.zeros((256, 2), np.float32), None,
                  np.zeros((256, 3), np.float32),
                  np.zeros(4, np.int64), np.zeros(4, np.int64),
                  np.ones((4, 1), np.float32), 256, 1024)
    # no padded edges -> exact node fit is fine (nothing can alias)
    g = pad_graph(np.zeros((4, 2), np.float32), None,
                  np.zeros((4, 3), np.float32),
                  np.zeros(6, np.int64), np.zeros(6, np.int64),
                  np.ones((6, 1), np.float32), 4, 6)
    assert g.x.shape == (4, 2)
