"""Training/inference losses and node-weight computation.

Parity target: GradientbasedLoss (/root/reference/models/scheduler_gnn.py:472-515)
and the composite training loss ``grad_loss + 0.1 * Linf``
(scheduler_gnn.py:151-154).  All functions are mask-aware so they operate on
padded graphs without bias, and reduce exactly like the reference on unpadded
inputs.

Reference-drift note (SURVEY.md §7 "build the intended behavior"): the
reference's single-device train loop calls ``criterion(out, batch.y)`` with
two args against a four-arg forward (scheduler_gnn.py:152 vs 481) — a latent
TypeError — and its ReduceLROnPlateau is stepped without a metric
(scheduler_gnn.py:186).  The framework implements the documented intent:
gradient-weighted MSE with edge attributes, plus the 0.1-weighted L-infinity
term.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .segment import masked_segment_sum


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gw_scalar_core(diff, senders, receivers, idx, edge_attr, masks,
                    max_weight, min_weight):
    """Weight scalar as a function of ``diff = pred - target`` ([N, C]).

    Forward math identical to the autograd path; the custom VJP replaces
    XLA's transpose-of-gather scatters (the ~11 ms/step loss-term backward,
    CLAUDE.md round-2 attribution) with two unsorted segment-sums over a
    one-hot argmax-channel array — the design family measured fastest for the
    fused conv's dx (ops/fused_conv.py:445).  ``masks`` is a dict of float
    arrays (1.0 = real) so the signature stays a fixed pytree.
    """
    out, _ = _gw_scalar_fwd(diff, senders, receivers, idx, edge_attr, masks,
                            max_weight, min_weight)
    return out


def _gw_scalar_fwd(diff, senders, receivers, idx, edge_attr, masks,
                   max_weight, min_weight):
    n = diff.shape[0]
    edge_mask_f, node_mask_f = masks["edge"], masks["node"]
    g = (diff[senders] - diff[receivers]) / edge_attr          # [E, C]
    edge_w = jnp.max(g, axis=1)
    arg = jnp.argmax(g, axis=1)                                # [E]
    node_w = jax.ops.segment_sum(edge_w * edge_mask_f, idx, num_segments=n)
    clamped = jnp.minimum(node_w, max_weight)
    # clamp-active gradient gates.  Tie caveat: at exact equality JAX's
    # minimum/maximum split the gradient 0.5/0.5 and jnp.max splits tied
    # channel maxima 1/N, while this VJP gives the clamp boundary and the
    # argmax-first channel the full gradient — so grads differ from XLA
    # autograd on measure-zero tie sets (e.g. node_w exactly at min_weight).
    # Acceptable: this path is an opt-in measured dead end (FESR_LOSS_VJP).
    active = (node_w <= max_weight).astype(diff.dtype)
    if min_weight is not None:
        active = active * (clamped >= min_weight).astype(diff.dtype)
        clamped = jnp.maximum(clamped, min_weight)
    out = jnp.sum(clamped * node_mask_f)
    # residuals: per-edge argmax channel + selected 1/edge_attr, node gate
    ea_b = jnp.broadcast_to(edge_attr, g.shape)
    inv_sel = 1.0 / jnp.take_along_axis(ea_b, arg[:, None], axis=1)[:, 0]
    res = (arg, inv_sel, active * node_mask_f, senders, receivers, idx,
           edge_mask_f, edge_attr, diff.shape)
    return out, res


def _gw_scalar_bwd(max_weight, min_weight, res, ct):
    (arg, inv_sel, dnode_gate, senders, receivers, idx, edge_mask_f,
     edge_attr, diff_shape) = res
    n, c = diff_shape
    up = ct * dnode_gate[idx] * edge_mask_f * inv_sel          # [E]
    ohot = jax.nn.one_hot(arg, c, dtype=up.dtype) * up[:, None]  # [E, C]
    # padding edges are zeroed via edge_mask_f, so plain unsorted segment_sum
    # over n segments is safe (no dump row needed)
    d_s = jax.ops.segment_sum(ohot, senders, num_segments=n)
    d_r = jax.ops.segment_sum(ohot, receivers, num_segments=n)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    zeros_masks = jax.tree_util.tree_map(jnp.zeros_like,
                                         {"edge": edge_mask_f,
                                          "node": dnode_gate})
    return (d_s - d_r, f0(senders), f0(receivers), f0(idx),
            jnp.zeros_like(edge_attr), zeros_masks)


_gw_scalar_core.defvjp(_gw_scalar_fwd, _gw_scalar_bwd)


def gradient_weight_scalar(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    node_mask: jnp.ndarray | None = None,
    max_weight: float = 1.0,
    scatter_to: str = "receivers",
    min_weight: float | None = None,
) -> jnp.ndarray:
    """The scalar gradient weight of GradientbasedLoss.forward.

    grad_e = (f[senders] - f[receivers]) / edge_attr; the per-edge weight is
    the channel-max of (grad_pred - grad_target) (signed max, matching
    torch.max(...,dim=1)[0] at scheduler_gnn.py:486), scatter-added to nodes
    (receivers in forward :491, senders in compute_node_weight :512), clamped
    from above by ``max_weight`` (:493), then summed to a scalar (:495).

    ``min_weight`` is a stability extension absent from the reference: the
    reference clamps node weights only from ABOVE, so once the prediction's
    gradients undershoot the target's everywhere the scalar goes negative and
    gradient descent is rewarded for INCREASING the MSE — training runs away
    to a huge finite negative loss (observed after ~100-200 epochs on the
    synthetic duct workload).  Training paths pass ``min_weight=0.0`` (a
    weight is non-negative by intent); ``None`` keeps the faithful replica.
    """
    n = pred.shape[0]
    idx = receivers if scatter_to == "receivers" else senders
    if os.environ.get("FESR_LOSS_VJP", "xla") == "custom":
        # custom-VJP path — MEASURED DEAD END on v5e (round 3), kept for the
        # record + parity coverage: the hand-written backward (one pathway for
        # pred AND target since the weight depends only on their difference;
        # one-hot argmax channels + segment-sums) matches XLA autograd on
        # non-tied inputs (see the tie caveat in _gw_scalar_fwd) but is SLOWER
        # than XLA autograd at bench scale (E=296k: 17.8 ms vs 13.6 ms
        # fwd+bwd; sorted-receivers 17.4, flat-scalar-scatter 17.1) — XLA
        # fuses the gather transposes with the max backward into one scatter
        # loop the manual segment-sum formulation can't beat.
        dt = pred.dtype
        masks = {
            "edge": (jnp.ones(senders.shape, dt) if edge_mask is None
                     else edge_mask.astype(dt)),
            "node": (jnp.ones((n,), dt) if node_mask is None
                     else node_mask.astype(dt)),
        }
        return _gw_scalar_core(pred - target, senders, receivers, idx,
                               edge_attr, masks, float(max_weight),
                               None if min_weight is None else float(min_weight))
    grad_pred = (pred[senders] - pred[receivers]) / edge_attr
    grad_tgt = (target[senders] - target[receivers]) / edge_attr
    edge_w = jnp.max(grad_pred - grad_tgt, axis=1)
    node_w = masked_segment_sum(edge_w, idx, n, edge_mask)
    node_w = jnp.minimum(node_w, max_weight)
    if min_weight is not None:
        node_w = jnp.maximum(node_w, min_weight)
    if node_mask is not None:
        node_w = jnp.where(node_mask, node_w, 0.0)
    return jnp.sum(node_w)


def gradient_based_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    node_mask: jnp.ndarray | None = None,
    max_weight: float = 1.0,
) -> jnp.ndarray:
    """GradientbasedLoss.forward (scheduler_gnn.py:481-501): mse * grad weight."""
    w = gradient_weight_scalar(pred, target, senders, receivers, edge_attr,
                               edge_mask, node_mask, max_weight, "receivers")
    sq = (pred - target) ** 2
    if node_mask is not None:
        m = node_mask[:, None].astype(sq.dtype)
        mse = jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * sq.shape[1], 1.0)
    else:
        mse = jnp.mean(sq)
    return mse * w


def linf_loss(pred: jnp.ndarray, target: jnp.ndarray,
              node_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """max |pred - target| over real nodes (scheduler_gnn.py:153)."""
    err = jnp.abs(pred - target)
    if node_mask is not None:
        err = jnp.where(node_mask[:, None], err, 0.0)
    return jnp.max(err)


def training_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    node_mask: jnp.ndarray | None = None,
    linf_weight: float = 0.1,
    kind: str = "gradient",
) -> jnp.ndarray:
    """The composite reference objective (scheduler_gnn.py:151-154).

    kind='gradient' -> gradient-weighted MSE + linf_weight * Linf;
    kind='mse'      -> plain MSE (the DDP path's choice, scheduler_gnn.py:390).
    """
    if kind == "mse":
        sq = (pred - target) ** 2
        if node_mask is not None:
            m = node_mask[:, None].astype(sq.dtype)
            return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * sq.shape[1], 1.0)
        return jnp.mean(sq)
    if kind != "gradient":
        raise ValueError(f"unknown loss kind {kind!r} (expected mse | gradient)")
    base = gradient_based_loss(pred, target, senders, receivers, edge_attr,
                               edge_mask, node_mask)
    return base + linf_weight * linf_loss(pred, target, node_mask)


def compute_node_weight(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    num_nodes: int,
    edge_mask: jnp.ndarray | None = None,
    node_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GradientbasedLoss.compute_node_weight (scheduler_gnn.py:503-515).

    Per-subdomain blending weight at inference: the summed (unclamped) edge
    weight broadcast to every node — i.e. a constant vector of length
    ``num_nodes``.
    """
    grad_pred = (pred[senders] - pred[receivers]) / edge_attr
    grad_tgt = (target[senders] - target[receivers]) / edge_attr
    edge_w = jnp.max(grad_pred - grad_tgt, axis=1)
    node_w = masked_segment_sum(edge_w, senders, num_nodes, edge_mask)
    total = jnp.sum(jnp.where(node_mask, node_w, 0.0) if node_mask is not None else node_w)
    ones = jnp.ones((num_nodes,), pred.dtype)
    return total * ones
