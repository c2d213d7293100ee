"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed/NCCL machinery (mp.spawn with
world_size=4, localhost:12355 rendezvous, DistributedDataParallel —
/root/reference/models/scheduler_gnn.py:104-114, 316-318, 349-386) with the
JAX-native model: one process, a ``jax.sharding.Mesh`` over all chips, batch
sharded on the ``data`` axis, params replicated; XLA emits the gradient psum
over ICI.  No rendezvous code — ``jax.distributed.initialize`` covers
multi-host when needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Places a GraphBatch (leading [B] axis on every leaf) across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch, multiple: int):
    """Pads the leading batch axis so it divides the data-axis size.

    Padded graphs reuse graph 0's structure with node/edge masks zeroed, so
    they contribute nothing to losses or reconstructions.

    Runs HOST-SIDE in numpy: eager per-leaf device concatenates cost ~2
    dispatches each (~0.5 s over the relay tunnel, CLAUDE.md), and this
    sits on the multi-device train-setup and routed-predict paths.  The
    single transfer happens downstream at shard_batch/jit entry.
    """
    b = batch.x.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b

    def pad_leaf(x):
        x = np.asarray(x)
        pad_block = np.repeat(x[:1], rem, axis=0)
        return np.concatenate([x, pad_block], axis=0)

    import dataclasses

    padded = jax.tree_util.tree_map(pad_leaf, batch)
    # zero out masks on the padded tail
    mask_fix = np.concatenate([np.ones((b,), bool), np.zeros((rem,), bool)])
    padded = dataclasses.replace(
        padded,
        node_mask=padded.node_mask & mask_fix[:, None],
        edge_mask=padded.edge_mask & mask_fix[:, None])
    return padded, b
