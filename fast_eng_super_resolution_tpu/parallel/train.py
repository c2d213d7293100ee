"""The jit training/eval/predict engine over padded graph batches.

Replaces the reference's twin training paths — the single-device epoch loop
(/root/reference/models/scheduler_gnn.py:116-189) and the mp.spawn+DDP worker
(:349-469) — with ONE program: a jit step over a sharded GraphBatch.  On a
device mesh the batch is sharded on the ``data`` axis and XLA inserts the
gradient all-reduce over ICI (the explicit analogue of DDP's implicit
all-reduce at :386); single-chip is the same code with a 1-device mesh.

Loss semantics match the reference's PyG batching: subdomains in a batch are
treated as one merged graph — MSE over all real nodes of the batch times the
summed clamped gradient weight (scheduler_gnn.py:481-501), plus
``0.1 * max |err|`` (:151-154).  See ops/loss.py for the drift notes.

Optimizer: Adam (reference :139, :391) with host-controlled LR mirroring both
reference schedules: StepLR(step_size, gamma) (:392-394) and
ReduceLROnPlateau(factor=0.5, patience=5) (:140).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.graph import GraphBatch
from ..ops.loss import gradient_weight_scalar, linf_loss


def _import_shard_map():
    """shard_map + the name of its replication-check kwarg.

    jax >= 0.8 exports ``jax.shard_map`` (kwarg ``check_vma``); the legacy
    experimental API spells it ``check_rep`` — passing the wrong one is a
    TypeError, so the caller must pair function and kwarg (ADVICE r2).
    """
    try:
        from jax import shard_map  # jax >= 0.8
        return shard_map, "check_vma"
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        return shard_map, "check_rep"


def batched_loss_parts(model, params, batch: GraphBatch):
    """Per-batch partial sums (sq_sum, n_real, w_sum, linf_max) — combinable
    across devices with psum/pmax before the nonlinear composition."""

    def per_graph(g: GraphBatch):
        pred = model.apply(params, g.x, g.senders, g.receivers, g.edge_attr,
                           edge_mask=g.edge_mask)
        m = g.node_mask[:, None].astype(pred.dtype)
        sq_sum = jnp.sum((pred - g.y) ** 2 * m)
        n_real = jnp.sum(m) * pred.shape[-1]
        w = gradient_weight_scalar(pred, g.y, g.senders, g.receivers, g.edge_attr,
                                   g.edge_mask, g.node_mask, min_weight=0.0)
        linf = linf_loss(pred, g.y, g.node_mask)
        return sq_sum, n_real, w, linf

    sq_sum, n_real, w, linf = jax.vmap(per_graph)(batch)
    return jnp.sum(sq_sum), jnp.sum(n_real), jnp.sum(w), jnp.max(linf)


def combine_loss_parts(sq_sum, n_real, w_sum, linf_max, kind: str = "gradient",
                       linf_weight: float = 0.1) -> jnp.ndarray:
    mse = sq_sum / jnp.maximum(n_real, 1.0)
    if kind == "mse":
        return mse
    if kind != "gradient":
        raise ValueError(f"unknown loss kind {kind!r} (expected mse | gradient)")
    return mse * w_sum + linf_weight * linf_max


def batched_loss(model, params, batch: GraphBatch, kind: str = "gradient",
                 linf_weight: float = 0.1) -> jnp.ndarray:
    """Reference-faithful loss over a batch of padded subdomain graphs."""
    parts = batched_loss_parts(model, params, batch)
    return combine_loss_parts(*parts, kind=kind, linf_weight=linf_weight)


def merged_loss(model, params, graph: GraphBatch, kind: str = "gradient",
                linf_weight: float = 0.1) -> jnp.ndarray:
    """Loss over ONE merged (block-diagonal) graph — identical math to
    ``batched_loss`` on the unmerged batch (no cross-graph edges exist), and
    the faithful analogue of the reference's PyG batching, which also merges
    subdomains into one graph per step (scheduler_gnn.py:148-154).  The
    merged layout is ~1.5x faster on TPU (core/graph.py:merge_batch)."""
    pred = model.apply(params, graph.x, graph.senders, graph.receivers,
                       graph.edge_attr, edge_mask=graph.edge_mask)
    m = graph.node_mask[:, None].astype(pred.dtype)
    sq_sum = jnp.sum((pred - graph.y) ** 2 * m)
    n_real = jnp.sum(m) * pred.shape[-1]
    w = gradient_weight_scalar(pred, graph.y, graph.senders, graph.receivers,
                               graph.edge_attr, graph.edge_mask, graph.node_mask,
                               min_weight=0.0)
    linf = linf_loss(pred, graph.y, graph.node_mask)
    return combine_loss_parts(sq_sum, n_real, w, linf, kind, linf_weight)


def merged_fused_loss_parts(model, params, batch: dict, rows_blk: int,
                            blk: int, gemm_dtype: str = "bfloat16",
                            interpret: bool = False):
    """(sq_sum, n_real, w_sum, linf_max) through the fused Pallas conv —
    combinable across devices with psum/pmax before the nonlinear
    composition (same contract as ``batched_loss_parts``)."""
    graph, fused = batch["graph"], batch["fused"]
    pred = model.apply_fused_ad(params, graph.x, fused["edge_attr"],
                                fused["aux"], fused["s"], rows_blk=rows_blk,
                                blk=blk, gemm_dtype=gemm_dtype,
                                interpret=interpret)
    m = graph.node_mask[:, None].astype(pred.dtype)
    sq_sum = jnp.sum((pred - graph.y) ** 2 * m)
    n_real = jnp.sum(m) * pred.shape[-1]
    w = gradient_weight_scalar(pred, graph.y, graph.senders, graph.receivers,
                               graph.edge_attr, graph.edge_mask, graph.node_mask,
                               min_weight=0.0)
    linf = linf_loss(pred, graph.y, graph.node_mask)
    return sq_sum, n_real, w, linf


def merged_fused_loss(model, params, batch: dict, rows_blk: int, blk: int,
                      kind: str = "gradient", linf_weight: float = 0.1,
                      gemm_dtype: str = "bfloat16",
                      interpret: bool = False) -> jnp.ndarray:
    """merged_loss through the fused Pallas conv (custom VJP — backward
    recomputes per-edge matrices in VMEM instead of remat'ing [E, w^2]
    residuals).  ``batch``: {'graph': merged GraphBatch, 'fused':
    {'edge_attr', 'aux', 's'}} from ``prepare_fused_train``; the
    gradient-weight and L-inf terms stay on the graph's own edge arrays."""
    parts = merged_fused_loss_parts(model, params, batch, rows_blk, blk,
                                    gemm_dtype, interpret)
    return combine_loss_parts(*parts, kind=kind, linf_weight=linf_weight)


def make_fused_batch(merged: GraphBatch, model, rows_blk: int = 64,
                     quantum: int = 256):
    """(batch dict for layout='fused', rows_blk, blk) from a merged graph.

    S expands on DEVICE from compact generators (ops.fused_conv.to_device_s):
    the dense host build + upload cost ~75 s/GB on this box (page-faulting
    allocator + ~105 MB/s tunnel); the compact form uploads 1/64th the bytes.
    """
    from ..ops.fused_conv import to_device_s

    ea, aux, s, rows_blk, blk = model.prepare_fused_train(
        np.asarray(merged.senders), np.asarray(merged.receivers),
        np.asarray(merged.edge_attr), merged.x.shape[0],
        np.asarray(merged.edge_mask), rows_blk=rows_blk, quantum=quantum,
        compact=True)
    fused = {"edge_attr": jnp.asarray(ea),
             "aux": {k: jnp.asarray(v) for k, v in aux.items()},
             "s": to_device_s(s, rows_blk, blk)}
    return {"graph": merged, "fused": fused}, rows_blk, blk


def make_fused_shard_batches(batch: GraphBatch, model, n_dev: int,
                             rows_blk: int = 64, quantum: int = 256,
                             with_graph: bool = True,
                             expand_s: bool = True):
    """Host prep for the multi-chip fused step: splits a [B, ...] batch into
    ``n_dev`` per-device groups, merges each group block-diagonally, builds
    that group's scatter blocks, unifies the block geometry (one compiled
    kernel serves every device), and stacks everything on a leading device
    axis ready to shard on the mesh's 'data' axis.

    Returns (stacked_batch_dict, rows_blk, blk) where the dict leaves are
    [n_dev, ...] arrays ({'graph': merged GraphBatch, 'fused': {...}}).

    ``with_graph=False`` skips the merged-graph stack entirely — inference
    callers (multi-chip fused predict, the large-mesh bench lane) consume
    only the fused operands, and the raw senders/receivers/edge_attr/y
    leaves are most of the remaining prep upload; 'graph' is None then.

    ``expand_s=False`` ships S as its compact generators instead of the
    expanded device matrix: fused['s'] is absent and fused['s_compact'] =
    {'slot_rows' [n_dev, nb*blk] i32, 'row_weight' [n_dev, nb*rows_blk]}
    (device arrays, 1/64th S's bytes).  Streaming callers expand per chunk
    INSIDE their program (ops.fused_conv.expand_s) so resident HBM holds
    one chunk's S transient, not all of them — required above ~2M nodes
    (stacked dense S at 1M is already 5.2 GB).
    """
    from ..core.graph import merge_batch

    b = batch.x.shape[0]
    assert b % n_dev == 0, (b, n_dev)
    per = b // n_dev
    # ONE device->host gather up front: callers hand device-resident batches
    # (pad_batch_to_multiple concatenates on device), and per-leaf
    # np.asarray inside the loop would re-fetch every full array n_dev
    # times (~35 ms per fetch over the relay tunnel, CLAUDE.md)
    timing = os.environ.get("FESR_TIMING") == "1"
    marks: list[tuple[str, float]] = [("start", time.perf_counter())]

    batch = jax.device_get(batch)
    marks.append(("device_get", time.perf_counter()))
    groups = []
    for d in range(n_dev):
        sl = slice(d * per, (d + 1) * per)
        chunk = jax.tree_util.tree_map(lambda a: np.asarray(a)[sl], batch)
        # merge_batch is backend-polymorphic: the host (numpy) chunk stays
        # numpy end-to-end, so the scatter-block build below never touches
        # the device (no eager dispatches, no refetches)
        merged, _ = merge_batch(chunk)
        groups.append(merged)
    marks.append(("merge", time.perf_counter()))

    def build_one(merged, quantum):
        ea, aux, s, rb, bk = model.prepare_fused_train(
            np.asarray(merged.senders), np.asarray(merged.receivers),
            np.asarray(merged.edge_attr), merged.x.shape[0],
            np.asarray(merged.edge_mask), rows_blk=rows_blk,
            quantum=quantum, compact=True)
        return (merged, ea, aux, s, rb, bk)

    built = [build_one(g, quantum) for g in groups]
    blk_common = max(bk for *_, bk in built)
    # unify block geometry so ONE compiled kernel serves every device;
    # rebuild only the groups whose blk differs
    built = [b if b[-1] == blk_common else build_one(b[0], blk_common)
             for b in built]
    marks.append(("scatter_build", time.perf_counter()))

    def stack(leaves):
        return jnp.asarray(np.stack([np.asarray(l) for l in leaves]))

    graphs = jax.tree_util.tree_map(lambda *xs: stack(xs),
                                    *[g for g, *_ in built]) \
        if with_graph else None
    # S expands ON DEVICE from the stacked compact generators: the dense
    # per-group S matrices dominated cold prep (at 250k nodes: ~29 s host
    # np.stack of 1.2 GB at this box's ~43 MB/s fresh-page memcpy + ~12 s
    # upload at 105 MB/s); the generators are 1/64th the bytes and the
    # expansion is blockwise, so one flat build covers all n_dev groups
    from ..ops.fused_conv import CompactS, to_device_s_stacked

    sr = np.stack([s.slot_rows for _, _, _, s, *_ in built])
    rw = np.stack([s.row_weight for _, _, _, s, *_ in built])
    # inference callers (with_graph=False) consume only senders_perm — the
    # backward's senders_dump would otherwise be dead weight host-stacked and
    # uploaded anyway (~88 MB at 1M nodes: ~2 s memcpy + ~0.8 s tunnel)
    aux_keys = (built[0][2].keys() if with_graph else ("senders_perm",))
    fused = {
        "edge_attr": stack([ea for _, ea, *_ in built]),
        "aux": {k: stack([aux[k] for _, _, aux, *_ in built])
                for k in aux_keys},
    }
    if expand_s:
        fused["s"] = to_device_s_stacked(
            CompactS(sr.reshape(-1), rw.reshape(-1)), rows_blk, blk_common,
            n_dev)
    else:
        fused["s_compact"] = {"slot_rows": jnp.asarray(sr),
                              "row_weight": jnp.asarray(rw)}
    marks.append(("stack_upload", time.perf_counter()))
    if timing:
        stages = ", ".join(f"{name}={t1 - t0:.2f}s" for (name, t1), (_, t0)
                           in zip(marks[1:], marks[:-1]))
        print(f"[fesr-timing] make_fused_shard_batches: {stages}", flush=True)
    return {"graph": graphs, "fused": fused}, rows_blk, blk_common


def stack_batches(batches):
    """Stacks same-shape batch pytrees along a new leading axis for
    ``Trainer.epoch`` (single-dispatch epochs).  One host->device transfer
    per leaf.  Returns None when batch shapes differ (mixed buckets /
    remainder batch) — callers fall back to per-batch stepping."""
    if not batches:
        return None
    flat0, treedef0 = jax.tree_util.tree_flatten(batches[0])
    shapes0 = [np.shape(l) for l in flat0]
    stacked_leaves = [[np.asarray(l)] for l in flat0]
    for b in batches[1:]:
        flat, treedef = jax.tree_util.tree_flatten(b)
        if treedef != treedef0 or [np.shape(l) for l in flat] != shapes0:
            return None
        for acc, leaf in zip(stacked_leaves, flat):
            acc.append(np.asarray(leaf))
    return jax.tree_util.tree_unflatten(
        treedef0, [jnp.asarray(np.stack(ls)) for ls in stacked_leaves])


@dataclasses.dataclass
class Trainer:
    """Owns the jit'd step/eval functions and host-side LR control."""

    model: object
    lr: float
    loss_kind: str = "gradient"
    linf_weight: float = 0.1
    donate: bool = True
    layout: str = "batched"  # 'batched' ([B, ...] + vmap), 'merged' (one
    # graph), or 'fused' (merged graph + fused Pallas conv, TPU)
    fused_rows_blk: int = 64   # static block geometry for layout='fused'
    fused_blk: int = 0         # (from make_fused_batch)
    fused_dtype: str = "bfloat16"
    fused_interpret: bool = False

    def __post_init__(self):
        self.optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)

        if self.layout == "fused":
            def loss_fn(params, batch):
                return merged_fused_loss(self.model, params, batch,
                                         self.fused_rows_blk, self.fused_blk,
                                         self.loss_kind, self.linf_weight,
                                         self.fused_dtype,
                                         self.fused_interpret)
        elif self.layout == "merged":
            def loss_fn(params, batch):
                return merged_loss(self.model, params, batch, self.loss_kind,
                                   self.linf_weight)
        else:
            def loss_fn(params, batch):
                return batched_loss(self.model, params, batch, self.loss_kind,
                                    self.linf_weight)

        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def epoch_step(params, opt_state, stacked, order):
            # one dispatch per EPOCH: lax.scan over a permutation of batch
            # indices into same-shape stacked batches.  Jitted dispatches
            # already pipeline asynchronously; the measured win is dropping
            # the per-batch float(loss) host sync to one per epoch (1.3x at
            # 2 batches/epoch on a tunneled v5e, growing with batch count).
            # The reference steps batch-by-batch from Python with a per-batch
            # .item() sync (scheduler_gnn.py:148-160).
            def body(carry, i):
                p, o = carry
                batch = jax.tree_util.tree_map(lambda a: a[i], stacked)
                p, o, loss = step(p, o, batch)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), order)
            return params, opt_state, losses

        donate = (0, 1) if self.donate else ()
        self._step = jax.jit(step, donate_argnums=donate)
        self._epoch = jax.jit(epoch_step, donate_argnums=donate)
        self._eval = jax.jit(loss_fn)

        if self.layout == "fused":
            def predict(params, batch: dict):
                g, fused = batch["graph"], batch["fused"]
                return self.model.apply_fused_ad(
                    params, g.x, fused["edge_attr"], fused["aux"], fused["s"],
                    rows_blk=self.fused_rows_blk, blk=self.fused_blk,
                    gemm_dtype=self.fused_dtype,
                    interpret=self.fused_interpret)
        elif self.layout == "merged":
            def predict(params, graph: GraphBatch):
                return self.model.apply(params, graph.x, graph.senders,
                                        graph.receivers, graph.edge_attr,
                                        edge_mask=graph.edge_mask)
        else:
            def predict(params, batch: GraphBatch):
                return jax.vmap(
                    lambda g: self.model.apply(params, g.x, g.senders, g.receivers,
                                               g.edge_attr, edge_mask=g.edge_mask)
                )(batch)

        self._predict = jax.jit(predict)

    def init(self, key) -> tuple[dict, object]:
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    def step(self, params, opt_state, batch):
        return self._step(params, opt_state, batch)

    def epoch(self, params, opt_state, stacked, order):
        """One full epoch in a single dispatch.

        ``stacked``: a batch pytree with an extra leading axis over
        same-shape batches (see ``stack_batches``); ``order``: int32 index
        array, typically a fresh permutation per epoch.  Returns
        (params, opt_state, per-step losses [len(order)]).
        """
        return self._epoch(params, opt_state, stacked,
                           jnp.asarray(order, jnp.int32))

    def evaluate(self, params, batch) -> float:
        return float(self._eval(params, batch))

    def predict(self, params, batch: GraphBatch) -> jnp.ndarray:
        return self._predict(params, batch)

    @staticmethod
    def set_lr(opt_state, lr: float):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state

    def make_shard_map_step(self, mesh, axis: str = "data"):
        """Explicit-collective variant of the train step via ``shard_map``.

        The default jit step lets GSPMD place the gradient all-reduce; this
        variant spells it out — each device computes grads on its local batch
        shard and the mean-gradient ``psum`` over the ICI ring is written
        explicitly (the literal analogue of DDP's bucketed all-reduce,
        scheduler_gnn.py:386).  Semantics match the jit step when every shard
        holds the same number of real (unmasked) graphs.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_map, no_check_kw = _import_shard_map()

        def global_loss(params, batch):
            # psum/pmax the loss PARTS, then compose — exactly the single-
            # program semantics (the loss is nonlinear in its parts, so a
            # naive pmean of per-shard losses would be wrong).
            sq, n, w, linf = batched_loss_parts(self.model, params, batch)
            sq = jax.lax.psum(sq, axis)
            n = jax.lax.psum(n, axis)
            w = jax.lax.psum(w, axis)
            # differentiable cross-shard max: pmax has no VJP, so select the
            # owning shard(s) under stop_gradient and psum — the gradient
            # flows only to the max's owner (max subgradient, split on ties)
            linf_sg = jax.lax.stop_gradient(linf)
            linf_max = jax.lax.pmax(linf_sg, axis)
            owner = (linf_sg == linf_max).astype(linf.dtype)
            count = jax.lax.psum(owner, axis)
            linf = jax.lax.psum(owner * linf, axis) / jnp.maximum(count, 1.0)
            return combine_loss_parts(sq, n, w, linf, self.loss_kind,
                                      self.linf_weight)

        def local_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(global_loss)(params, batch)
            # grads of the psum'd loss are already partial-per-shard sums of a
            # shared scalar: all-reduce them to the replicated global gradient
            grads = jax.lax.psum(grads, axis_name=axis)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def step(params, opt_state, batch):
            specs_batch = jax.tree_util.tree_map(lambda _: P(axis), batch)
            mapped = shard_map(
                local_step, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                          jax.tree_util.tree_map(lambda _: P(), opt_state),
                          specs_batch),
                out_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                           jax.tree_util.tree_map(lambda _: P(), opt_state),
                           P()),
                **{no_check_kw: False})
            return mapped(params, opt_state, batch)

        return jax.jit(step)

    def make_fused_shard_map_step(self, mesh, rows_blk: int, blk: int,
                                  axis: str = "data",
                                  interpret: bool = False):
        """Multi-chip FUSED train step: each device runs the fused Pallas
        conv (custom VJP) on its own merged shard — per-device scatter
        blocks ride the 'data' axis from ``make_fused_shard_batches`` — and
        the loss parts + gradients psum over ICI.  The data-parallel story a
        real pod runs with the flagship kernel; semantics match the
        single-device fused step on the concatenated batch exactly (loss
        parts are sums/maxes, combined after psum/pmax).

        ``interpret=True`` runs the kernel as pure JAX ops — how the
        8-virtual-CPU tests and ``dryrun_multichip`` validate this path
        without TPU hardware.
        """
        from jax.sharding import PartitionSpec as P

        shard_map, no_check_kw = _import_shard_map()

        def global_loss(params, batch):
            # each shard must hold exactly ONE merged group: taking [0] of a
            # multi-group shard would silently train on a fraction of the
            # data (build the batch with n_dev == mesh axis size)
            lead = {a.shape[0] for a in jax.tree_util.tree_leaves(batch)}
            assert lead == {1}, (
                f"fused shard_map step: per-device shard has leading dims "
                f"{sorted(lead)}, expected 1 — make_fused_shard_batches "
                f"n_dev must equal the mesh '{axis}' axis size")
            local = jax.tree_util.tree_map(lambda a: a[0], batch)
            sq, n, w, linf = merged_fused_loss_parts(
                self.model, params, local, rows_blk, blk,
                self.fused_dtype, interpret)
            sq = jax.lax.psum(sq, axis)
            n = jax.lax.psum(n, axis)
            w = jax.lax.psum(w, axis)
            linf_sg = jax.lax.stop_gradient(linf)
            linf_max = jax.lax.pmax(linf_sg, axis)
            owner = (linf_sg == linf_max).astype(linf.dtype)
            count = jax.lax.psum(owner, axis)
            linf = jax.lax.psum(owner * linf, axis) / jnp.maximum(count, 1.0)
            return combine_loss_parts(sq, n, w, linf, self.loss_kind,
                                      self.linf_weight)

        def local_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(global_loss)(params, batch)
            grads = jax.lax.psum(grads, axis_name=axis)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def step(params, opt_state, batch):
            specs_batch = jax.tree_util.tree_map(lambda _: P(axis), batch)
            mapped = shard_map(
                local_step, mesh=mesh,
                in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                          jax.tree_util.tree_map(lambda _: P(), opt_state),
                          specs_batch),
                out_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                           jax.tree_util.tree_map(lambda _: P(), opt_state),
                           P()),
                **{no_check_kw: False})
            return mapped(params, opt_state, batch)

        return jax.jit(step)


class StepLR:
    """torch.optim.lr_scheduler.StepLR equivalent (scheduler_gnn.py:392-394)."""

    def __init__(self, lr: float, step_size: int, gamma: float):
        self.lr0, self.step_size, self.gamma = lr, step_size, gamma

    def __call__(self, epoch: int) -> float:
        return self.lr0 * (self.gamma ** (epoch // self.step_size))


class CosineLR:
    """Half-cosine decay from ``lr`` to ``min_lr`` over ``total`` epochs
    (beyond-parity: the reference offers only StepLR / a broken plateau)."""

    def __init__(self, lr: float, total: int, min_lr: float = 0.0):
        self.lr0, self.total, self.min_lr = lr, max(total, 1), min_lr

    def __call__(self, epoch: int) -> float:
        t = min(max(epoch, 0), self.total) / self.total
        return self.min_lr + 0.5 * (self.lr0 - self.min_lr) * (
            1.0 + float(np.cos(np.pi * t)))


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau(mode='min', factor=0.5, patience=5) equivalent
    (scheduler_gnn.py:140), including torch's default rel-threshold 1e-4:
    an improvement only counts when metric < best * (1 - threshold), so an
    infinitesimally-creeping plateau still decays the LR."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 0.0, threshold: float = 1e-4):
        self.lr, self.factor, self.patience, self.min_lr = lr, factor, patience, min_lr
        self.threshold = threshold
        self.best = np.inf
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def train_val_split(num_items: int, val_frac: float = 0.2, seed: int = 0):
    """80/20 random split (random_split at scheduler_gnn.py:100-103, 125)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_items)
    n_train = int((1 - val_frac) * num_items)
    return perm[:n_train], perm[n_train:]
