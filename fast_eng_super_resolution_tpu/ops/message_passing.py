"""Edge-conditioned graph convolution — the framework's hottest op.

Reference math (NNConv_old, /root/reference/models/model.py:521-536; KernelConv,
model.py:421-445):

    W_e  = EdgeMLP(edge_attr_e).reshape(C_in, C_out)          # per-edge matrix
    m_e  = x_sender(e) @ W_e                                  # per-edge bmm
    out_i = mean_{e: receiver(e)=i} m_e + x_i @ root + bias

Several mathematically identical formulations exist with very different
hardware behavior; ``mode`` selects one and 'auto' picks per backend (see
``resolve_mode`` for the measured numbers):

- 'edge3d' (TPU default): one [E, K] @ [K, C_in*C_out] MXU GEMM producing the
  per-edge matrices, then a batched einsum contraction.  Fastest measured; its
  [E, C_in, C_out] transient is lane-padded 2.7x by XLA:TPU, so the models
  wrap their depth loops in jax.checkpoint for training.
- 'edge': the same GEMM but the contraction unrolled as 2D slice-MACs.  No
  padding, but strided sub-tile reads make it collapse at large E; kept for
  experiments.
- 'factored' (CPU default): pushes the dominant contraction to the node axis,
  U = einsum('ni,kio->nko', x, M3);  m_e = einsum('ek,eko->eo', h_e, U[src]).
  Same FLOPs run N times instead of E times (E ~ 10-15x N on tet meshes), but
  on TPU the [E, K, C_out] gather of U dominates and loses.
- 'pallas': fused VMEM-resident kernel (ops/pallas_mp.py), opt-in.
- 'lut': tabulated kernel.  The edge MLP maps a SCALAR (edge length) to the
  w x w matrix, and a ReLU MLP of a scalar is piecewise linear — so sample it
  at K knots once, precompute the node-side products for every knot (one
  dense MXU GEMM), and per edge gather just the TWO interpolation endpoints:
  traffic drops from [E, w^2] to [E, 2, w].  <2e-3 rel err at 512 knots on
  the trained duct checkpoint.  Measured on the current v5e toolchain it
  LOSES (446 vs 103 ms/fwd): XLA's small-row gathers cost more than the big
  GEMM saves — same failure mode as 'factored'.  Niche: it avoids the
  [E, w^2] transient entirely, so it is the memory-tightest inference mode.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from .segment import masked_segment_mean, masked_segment_sum

Mode = Literal["auto", "factored", "edge", "edge3d", "pallas", "lut"]


def resolve_mode(mode: str) -> str:
    """'auto' -> best measured mode for the current backend.

    Measured on v5e (duct batches, width 48): edge3d (per-edge matrices via
    one GEMM + batched einsum) is the fast form — 86 ms/fwd merged at 516k
    edges; its 2.7x lane-padded transient is handled by jax.checkpoint in the
    models' depth loops (training) and by chunking (inference).  The 2D
    slice-MAC 'edge' form avoids the padding but its strided 48-lane slices
    re-read full 128-lane tiles — catastrophic at scale (1.3k nodes/s at 9M
    edges vs 311k) — and its backward hangs the remote Mosaic compiler; kept
    for experiments only.  'factored' loses to its [E, K, C] gather on TPU
    but wins on CPU (no gather penalty, smaller GEMMs).
    """
    if mode != "auto":
        return mode
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    # 'axon' is the relay TPU backend (CLAUDE.md) — same chip, same winner
    return "edge3d" if backend in ("tpu", "axon") else "factored"


def apply_edge_mlp_hidden(params: list[dict], e: jnp.ndarray, activation) -> jnp.ndarray:
    """Runs all but the last layer of the edge MLP (DenseNet, model.py:289-315).

    ``params`` is a list of {'w': [in,out], 'b': [out]} for every Linear layer;
    activation is applied after each layer except the last (which is *not*
    applied here at all — callers fold the last layer into the factored form).
    Returns the post-activation hidden features [E, K].
    """
    h = e
    for layer in params[:-1]:
        h = activation(h @ layer["w"] + layer["b"])
    return h


def precompute_edge_kernel(
    edge_mlp: list[dict],
    edge_attr: jnp.ndarray,
    activation=jax.nn.relu,
    mode: Mode = "auto",
    kernel_dtype=None,
    lut_knots: int = 512,
    edge_mask: jnp.ndarray | None = None,
):
    """Hoists the edge-attr-only part of the conv out of shared-weight loops.

    KernelNN/TEECNet apply ONE conv repeatedly (shared weights,
    model.py:558-559, 280-282), and the per-edge kernel matrices depend only
    on (params, edge_attr) — so they are identical across depth.  Computing
    them once cuts the dominant GEMM FLOPs and the W_e HBM writes by the
    depth factor.  Returns an opaque (mode, value) token for
    ``edge_conditioned_conv(precomputed=...)``.
    """
    mode = resolve_mode(mode)
    if mode == "lut":
        knots = int(lut_knots)
        e_scalar = edge_attr[:, 0]
        if edge_mask is not None:
            # knot range over REAL edges only: padding slots carry
            # edge_attr=1.0 (pad_graph), which on fine meshes (lengths
            # ~1e-3) would stretch the table ~100x past the real range and
            # collapse its resolution
            lo = jnp.min(jnp.where(edge_mask, e_scalar, jnp.inf))
            hi = jnp.max(jnp.where(edge_mask, e_scalar, -jnp.inf))
            # fully-masked graphs (padded batch tails under vmap) must keep
            # FINITE knots: inf knot_attr would make the edge-MLP hidden
            # inf and the backward NaN (inf * zero-cotangent) even though
            # the forward's masked scatter stays finite
            ok = jnp.isfinite(lo) & jnp.isfinite(hi)
            lo = jnp.where(ok, lo, 0.0)
            hi = jnp.where(ok, hi, 1.0)
        else:
            lo = jnp.min(e_scalar)
            hi = jnp.max(e_scalar)
        span = jnp.maximum(hi - lo, 1e-30)
        knot_attr = (lo + span * jnp.arange(knots) / (knots - 1))[:, None]
        hidden_k = apply_edge_mlp_hidden(edge_mlp, knot_attr, activation)
        w3, b3 = edge_mlp[-1]["w"], edge_mlp[-1]["b"]
        w_knots = hidden_k @ w3 + b3  # [K, c_in*c_out]
        t = (e_scalar - lo) / span * (knots - 1)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, knots - 2)
        frac = t - i0.astype(t.dtype)
        return (mode, (w_knots, i0, frac))

    hidden = apply_edge_mlp_hidden(edge_mlp, edge_attr, activation)
    if mode in ("edge", "edge3d"):
        w3, b3 = edge_mlp[-1]["w"], edge_mlp[-1]["b"]
        w_e = hidden @ w3 + b3  # [E, c_in*c_out]
        if kernel_dtype is not None:
            # storing W_e in bf16 halves the dominant per-layer HBM reads;
            # the contraction still accumulates in f32
            w_e = w_e.astype(kernel_dtype)
        return (mode, w_e)
    return (mode, hidden)


def edge_conditioned_conv(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mlp: list[dict],
    root: jnp.ndarray,
    bias: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    activation=jax.nn.relu,
    aggr: str = "mean",
    mode: Mode = "factored",
    root_input: jnp.ndarray | None = None,
    precomputed=None,
    degree: jnp.ndarray | None = None,
    edges_sorted: bool = False,
    lut_knots: int = 512,
) -> jnp.ndarray:
    """One edge-conditioned convolution layer (single graph, static shapes).

    Args:
      x: [N, C_in] node features entering the message computation.
      senders/receivers: [E] int32.
      edge_attr: [E, A].
      edge_mlp: Linear params list; last layer maps K -> C_in*C_out.
      root: [C_r, C_out] self-connection weight; bias: [C_out].
      edge_mask: [E] bool.
      activation: edge-MLP nonlinearity (ReLU for KernelNN kernels
        model.py:550, LeakyReLU for TEECNet model.py:403).
      aggr: 'mean' (reference default) or 'sum'.
      mode: formulation — see the module docstring ('auto' resolves per
        backend via resolve_mode).
      root_input: node features for the root/self term; defaults to ``x``.
        TEECNet's KernelConv applies root to the raw input while messages use
        ``linear(x)`` (model.py:430-445), so callers pass both.
      precomputed: token from ``precompute_edge_kernel`` hoisting the
        edge-attr-only work out of shared-weight depth loops.
      degree: optional precomputed real-edge counts per node (loop-invariant).
      edges_sorted: promise ascending receivers (pad_graph emits them sorted)
        for the faster TPU sorted-scatter lowering.

    Returns:
      [N, C_out] updated node features.
    """
    mode = resolve_mode(mode)
    n = x.shape[0]
    w3, b3 = edge_mlp[-1]["w"], edge_mlp[-1]["b"]
    k = w3.shape[0]
    c_in = x.shape[1]
    c_out = w3.shape[1] // c_in

    w_e_flat = None
    hidden = None
    lut = None
    if precomputed is not None:
        pre_mode, value = precomputed
        if pre_mode != mode:
            raise ValueError(f"precomputed kernel for mode {pre_mode}, got {mode}")
        if mode in ("edge", "edge3d"):
            w_e_flat = value
        elif mode == "lut":
            lut = value
        else:
            hidden = value
    if mode == "lut" and lut is None:
        lut = precompute_edge_kernel(edge_mlp, edge_attr, activation, mode,
                                     lut_knots=lut_knots,
                                     edge_mask=edge_mask)[1]
    if mode != "lut" and hidden is None and w_e_flat is None:
        hidden = apply_edge_mlp_hidden(edge_mlp, edge_attr, activation)  # [E, K]
    if mode in ("edge", "edge3d") and w_e_flat is None:
        w_e_flat = hidden @ w3 + b3

    if mode == "edge":
        # Per-edge matrices kept 2D [E, c_in*c_out]: reshaping to
        # [E, c_in, c_out] makes XLA:TPU pad the 48-wide lane dim to 128
        # (2.7x HBM expansion).  The contraction is unrolled as c_in
        # slice-MACs over 2D tiles — experiments only (strided sub-tile reads
        # collapse at large E, see resolve_mode).
        xs = x[senders]
        msg = xs[:, 0:1] * w_e_flat[:, 0:c_out]
        for a in range(1, c_in):
            msg = msg + xs[:, a:a + 1] * w_e_flat[:, a * c_out:(a + 1) * c_out]
    elif mode == "edge3d":
        msg = jnp.einsum("ei,eio->eo", x[senders].astype(w_e_flat.dtype),
                         w_e_flat.reshape(-1, c_in, c_out),
                         preferred_element_type=jnp.float32)
    elif mode == "lut":
        # node-side knot products as ONE 2D MXU GEMM (a [N, K, c_out] einsum
        # would lane-pad c_out 48->128), then per-edge gather of just the TWO
        # interpolation endpoints — [E, 2, c_out] traffic vs [E, c_in*c_out]
        w_knots, i0, frac = lut
        k_knots = w_knots.shape[0]
        w2 = (w_knots.reshape(k_knots, c_in, c_out)
              .transpose(1, 0, 2).reshape(c_in, k_knots * c_out))
        uf = (x @ w2).reshape(n * k_knots, c_out)
        base = senders.astype(jnp.int32) * k_knots + i0
        g0 = uf[base]
        g1 = uf[base + 1]
        msg = g0 * (1.0 - frac)[:, None] + g1 * frac[:, None]
    elif mode == "pallas":
        from .pallas_mp import fused_edge_messages

        msg = fused_edge_messages(hidden, x[senders], w3, b3)
    else:
        m3 = w3.reshape(k, c_in, c_out)
        b3m = b3.reshape(c_in, c_out)
        u = jnp.einsum("ni,kio->nko", x, m3)  # [N, K, C_out] — MXU GEMM
        v = x @ b3m  # [N, C_out]
        msg = jnp.einsum("ek,eko->eo", hidden, u[senders]) + v[senders]

    if aggr == "mean":
        aggregated = masked_segment_mean(msg, receivers, n, edge_mask,
                                         count=degree,
                                         indices_are_sorted=edges_sorted)
    elif aggr == "sum":
        aggregated = masked_segment_sum(msg, receivers, n, edge_mask,
                                        indices_are_sorted=edges_sorted)
    else:
        raise ValueError(f"unknown aggr {aggr!r} (expected mean | sum)")

    xr = x if root_input is None else root_input
    return aggregated + xr @ root + bias
