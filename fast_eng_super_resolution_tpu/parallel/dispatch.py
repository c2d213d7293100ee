"""Expert dispatch: per-cluster models as stacked params + vmapped selection.

The reference routes each subdomain to one of ``n_clusters`` specialist models
by filtering Python lists and running separate forward loops / processes per
cluster (/root/reference/models/scheduler_gnn.py:240-299).  TPU-native EP-style
dispatch instead stacks the per-cluster params on a leading expert axis and
selects per-graph with a gather inside one jit program — no host round trips,
one compilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.graph import GraphBatch


def stack_params(params_list: list) -> dict:
    """[n_experts] list of identical pytrees -> one pytree with leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def select_expert(stacked_params, idx: jnp.ndarray):
    """Gathers one expert's params (idx scalar) from the stacked pytree."""
    return jax.tree_util.tree_map(lambda p: p[idx], stacked_params)


def make_routed_apply(model):
    """Returns jit fn: (stacked_params, labels [B], batch) -> predictions [B, N, C]."""

    def routed(stacked_params, labels: jnp.ndarray, batch: GraphBatch):
        def per_graph(idx, g: GraphBatch):
            params = select_expert(stacked_params, idx)
            return model.apply(params, g.x, g.senders, g.receivers, g.edge_attr,
                               edge_mask=g.edge_mask)

        return jax.vmap(per_graph)(labels, batch)

    return jax.jit(routed)
