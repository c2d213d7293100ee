"""Full-mesh reconstruction from per-subdomain predictions.

Replaces the reference's vtkAppendDataSets + vtkStaticPointLocator
duplicate-point averaging loop (the host-side hot loop at
/root/reference/dataset/GraphDataset.py:1324-1409, O(points) Python) with an
exact segment-mean over global node ids — the partitioner kept them, so there
is no need to rediscover duplicates by radius search.  Optionally weighted by
the per-subdomain node weights the scheduler computes
(GradientbasedLoss.compute_node_weight, scheduler_gnn.py:503-515).

Device path: one jit-able segment-sum over the concatenated node axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def overlap_average(
    predictions: list[np.ndarray],
    global_ids: list[np.ndarray],
    num_nodes: int,
    weights: list[np.ndarray] | None = None,
) -> np.ndarray:
    """Averages per-subdomain nodal values back onto the full mesh (host).

    Args:
      predictions: list of [n_i, C] arrays (one per subdomain).
      global_ids: list of [n_i] int arrays into the full mesh.
      num_nodes: full-mesh node count.
      weights: optional per-subdomain [n_i] blending weights; None -> plain
        mean (the reference's behavior at GraphDataset.py:1396-1400).
    """
    c = predictions[0].shape[1]
    acc = np.zeros((num_nodes, c), np.float64)
    wacc = np.zeros((num_nodes,), np.float64)
    for i, (pred, gid) in enumerate(zip(predictions, global_ids)):
        w = np.ones(len(gid)) if weights is None else np.asarray(weights[i], np.float64)
        np.add.at(acc, gid, pred * w[:, None])
        np.add.at(wacc, gid, w)
    covered = wacc > 0
    acc[covered] /= wacc[covered, None]
    return acc.astype(np.float32)


@functools.lru_cache(maxsize=64)
def make_overlap_average_device(num_nodes: int):
    """Returns a jit'd overlap-averaging fn closed over the static mesh size.

    Inputs are the concatenated subdomain node axis: predictions [T, C],
    global_ids [T] int32, weights [T] (0 for padding rows — padding's
    global_ids may point anywhere valid).  One segment-sum pass.

    Cached per mesh size: a fresh closure per call would carry a fresh jit
    cache, so every warm caller would pay a re-trace + compilation-cache
    load (the round-3 serving lesson: never rebuild jit wrappers on a
    request path).
    """

    @jax.jit
    def fn(predictions: jnp.ndarray, global_ids: jnp.ndarray,
           weights: jnp.ndarray) -> jnp.ndarray:
        w = weights[:, None]
        acc = jax.ops.segment_sum(predictions * w, global_ids, num_segments=num_nodes)
        wsum = jax.ops.segment_sum(weights, global_ids, num_segments=num_nodes)
        # match the host path's `wacc > 0` guard exactly: node weights from
        # compute_node_weight are UNCLAMPED sums that can go negative
        # (ops/loss.py) — a plain max(wsum, eps) would divide by eps there
        # and emit ~1e30 garbage instead of 0
        covered = (wsum > 0.0)[:, None]
        return jnp.where(covered, acc / jnp.where(covered, wsum[:, None], 1.0),
                         0.0)

    return fn
