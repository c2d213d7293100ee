"""GraphSAGE baseline.

Parity target: the reference uses torch_geometric's off-the-shelf
``GraphSAGE(in_channels, out_channels, num_layers=5)`` (utils.py:38-39), i.e.
a BasicGNN stack of SAGEConv layers with hidden size == out_channels, mean
neighbor aggregation, ReLU between layers, none after the last:

    h_i' = lin_l(mean_{j in N(i)} h_j) + lin_r(h_i)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.segment import masked_segment_mean
from .common import linear, linear_init


@dataclasses.dataclass(frozen=True)
class GraphSAGE:
    in_channels: int
    out_channels: int
    num_layers: int = 5

    def init(self, key) -> dict:
        layers = []
        c = self.in_channels
        for i in range(self.num_layers):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            # PyG SAGEConv: only lin_l carries a bias (lin_r is
            # Linear(..., bias=False)) — two biases per layer would be
            # redundant params and mismatch the torch state-dict layout
            lin_r = linear_init(k2, c, self.out_channels)
            lin_r = {"w": lin_r["w"]}
            layers.append({
                "lin_l": linear_init(k1, c, self.out_channels),
                "lin_r": lin_r,
            })
            c = self.out_channels
        return {"layers": layers}

    def apply(self, params: dict, x: jnp.ndarray, senders: jnp.ndarray,
              receivers: jnp.ndarray, edge_attr: jnp.ndarray | None = None,
              edge_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        n = x.shape[0]
        h = x
        # degree is loop-invariant — one segment_sum instead of one per layer
        from ..ops.segment import segment_degree

        deg = segment_degree(receivers, n, edge_mask)
        for i, layer in enumerate(params["layers"]):
            neigh = masked_segment_mean(h[senders], receivers, n, edge_mask,
                                        count=deg)
            # new checkpoints have no lin_r bias (PyG parity); checkpoints
            # saved before that change carry one — honor it so old trained
            # params keep predicting exactly what they validated as
            root = (linear(layer["lin_r"], h) if "b" in layer["lin_r"]
                    else h @ layer["lin_r"]["w"])
            h = linear(layer["lin_l"], neigh) + root
            if i < self.num_layers - 1:
                h = jax.nn.relu(h)
        return h
