"""Segment (gather/scatter) primitives for static-shape graphs.

These replace torch_geometric's scatter-based aggregation (the reference's #1
hot path: per-edge message + scatter-mean in NNConv_old / KernelConv,
/root/reference/models/model.py:424-441, 521-536) with XLA ``segment_sum``,
which lowers to sorted-scatter on TPU.  All shapes static; padding handled by
masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sums ``data[e]`` into ``out[segment_ids[e]]``; masked entries contribute 0.

    Args:
      data: [E, ...] values.
      segment_ids: [E] int indices in [0, num_segments).
      num_segments: static output size.
      mask: optional [E] bool.
      indices_are_sorted: promise ascending segment_ids — unlocks the faster
        sorted-scatter lowering on TPU (measured 11.2 -> 8.2 ms at 516k x 48).
    """
    if mask is not None:
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def masked_segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    count: jnp.ndarray | None = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Mean with PyG semantics: segments with zero (real) edges produce 0.

    Matches ``aggr='mean'`` in the reference convs (model.py:394, 551).
    ``count`` lets callers hoist the (loop-invariant) degree computation out
    of repeated-conv loops — it is one full segment-sum otherwise.
    """
    total = masked_segment_sum(data, segment_ids, num_segments, mask,
                               indices_are_sorted)
    if count is None:
        ones = (jnp.ones(segment_ids.shape, data.dtype) if mask is None
                else mask.astype(data.dtype))
        count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                    indices_are_sorted=indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - 1))


def segment_degree(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Number of (real) edges incident on each segment."""
    ones = jnp.ones(segment_ids.shape, dtype) if mask is None else mask.astype(dtype)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
