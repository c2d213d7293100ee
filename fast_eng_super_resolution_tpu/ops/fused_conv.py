"""Fused edge-conditioned conv layer: one Pallas kernel per row-block.

The hot op (SURVEY §3.3; reference NNConv_old message+aggregate,
/root/reference/models/model.py:521-536) is, per edge e with scalar attr a_e:

    W_e  = EdgeMLP(a_e).reshape(c_in, c_out)      # [E, w^2] matrices
    m_e  = x[sender(e)] @ W_e                     # per-edge bmm
    out_i = mean_{e: recv(e)=i} m_e               # scatter-mean

The XLA 'edge3d' path materializes W_e to HBM ([E, w^2] — 9 KB/edge at w=48)
and reads it back every layer; those reads plus the scatter are ~70% of
forward time (measured round 1: 29 ms/fwd W_e reads + 8 ms/layer scatter at
516k edges).  This kernel keeps W_e entirely in VMEM and turns the scatter
into a dense MXU matmul, so per-layer HBM traffic drops from ~9 KB/edge to
~200 B/edge:

  - Edges are host-side grouped by receiver row-block (``rows_blk``
    consecutive nodes) and padded to a fixed ``blk`` slots per block
    (receivers are already sorted ascending — pad_graph's promise).
  - The scatter within a block is precomputed ONCE per graph as a dense
    0/(1/deg) matrix S [rows_blk, blk]: scatter-mean == S @ messages — a
    matmul, not a gather/scatter.  S depends only on the graph, never on
    params or layer, and streams through the block pipeline (~0.2 ms/layer
    of extra HBM reads at 516k edges — vs the 8 ms scatter it replaces).
  - Per block the kernel computes W = h @ W3 + b3 on the MXU ([sub, K] @
    [K, c_in*c_out]), expands sender features with a constant 0/1 matrix P
    ([sub, c_in] @ [c_in, c_in*c_out] — lane-aligned, no per-edge reshape),
    multiplies elementwise, and folds the c_in groups with static lane-slice
    adds.  All 2D ops, static aligned(ish) slices, no reduction grid, no
    dynamic lane indexing — the three Mosaic constructs that hang this
    toolchain's remote compiler (CLAUDE.md) are all avoided by construction.

Each grid step writes its own [rows_blk, c_out] output block exactly once
(edge blocks partition the rows), so there is no output revisiting.

Scaling note: S is dense per block — total S footprint ~= N * blk * 4 B,
i.e. ~0.3-1 GB/million nodes.  The inference path already chunks big meshes
to an edge budget (sched/scheduler.py), so per-dispatch graphs stay ~<100k
nodes and S stays tens of MB; ``build_scatter_blocks`` asserts an upper
bound rather than silently allocating gigabytes.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ScatterBlocks:
    """Host-precomputed, graph-static block structure (hashable aux: shapes
    only; arrays are numpy and passed as jit operands)."""

    edge_perm: np.ndarray       # [num_blocks*blk] int32 into original edges
    s_matrix: np.ndarray        # [num_blocks*rows_blk, blk] f32, 1/deg or 1
    senders_perm: np.ndarray    # [num_blocks*blk] int32 into nodes
    rows_blk: int
    blk: int
    num_blocks: int
    n_nodes: int                # real node count (<= num_blocks*rows_blk)

    @property
    def n_pad(self) -> int:
        return self.num_blocks * self.rows_blk


def build_scatter_blocks(receivers: np.ndarray, senders: np.ndarray,
                         n_nodes: int, edge_mask: np.ndarray | None = None,
                         rows_blk: int = 64, quantum: int = 256,
                         aggr: str = "mean",
                         max_s_bytes: int = 2 << 30) -> ScatterBlocks:
    """Groups receiver-sorted edges into fixed-size row-block buckets.

    receivers MUST be ascending over real edges (pad_graph emits them so;
    asserted).  Padded/masked edges may appear anywhere — they are dropped
    here and re-padded per block with S-column zeros.
    """
    receivers = np.asarray(receivers, np.int64)
    senders = np.asarray(senders, np.int64)
    if edge_mask is not None:
        keep = np.asarray(edge_mask, bool)
        receivers, senders = receivers[keep], senders[keep]
        real_idx = np.flatnonzero(keep)
    else:
        real_idx = np.arange(receivers.shape[0])
    order = None
    if receivers.size and np.any(np.diff(receivers) < 0):
        order = np.argsort(receivers, kind="stable")
        receivers, senders, real_idx = (receivers[order], senders[order],
                                        real_idx[order])

    num_blocks = max(1, _round_up(n_nodes, rows_blk) // rows_blk)
    # edges per row-block via boundary search on the sorted receivers
    bounds = np.searchsorted(receivers,
                             np.arange(num_blocks + 1) * rows_blk)
    counts = np.diff(bounds)
    blk = int(_round_up(max(int(counts.max() if counts.size else 0), 1),
                        quantum))
    s_bytes = num_blocks * rows_blk * blk * 4
    if s_bytes > max_s_bytes:
        raise ValueError(
            f"scatter blocks would need {s_bytes/1e9:.1f} GB (N={n_nodes}, "
            f"blk={blk}); chunk the graph (FESR_PREDICT_EDGE_BUDGET) or use "
            "an XLA conv mode")

    deg = np.bincount(receivers, minlength=n_nodes).astype(np.float32)
    weight = (1.0 / np.maximum(deg, 1.0)) if aggr == "mean" else \
        np.ones_like(deg)

    edge_perm = np.zeros(num_blocks * blk, np.int32)
    senders_perm = np.zeros(num_blocks * blk, np.int32)
    s = np.zeros((num_blocks * rows_blk, blk), np.float32)
    for b in range(num_blocks):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        k = hi - lo
        edge_perm[b * blk: b * blk + k] = real_idx[lo:hi]
        senders_perm[b * blk: b * blk + k] = senders[lo:hi]
        rows_local = receivers[lo:hi] - b * rows_blk
        s[b * rows_blk + rows_local, np.arange(k)] = \
            weight[receivers[lo:hi]]
    return ScatterBlocks(edge_perm=edge_perm, s_matrix=s,
                         senders_perm=senders_perm, rows_blk=rows_blk,
                         blk=blk, num_blocks=num_blocks, n_nodes=int(n_nodes))


def _fold_groups(prod: jnp.ndarray, groups: int, c_out: int) -> jnp.ndarray:
    """Sums ``groups`` adjacent lane-chunks of width c_out: [S, g*c] -> [S, c].

    Static slices only; factors of 2 and 3 keep the early (wide) slices
    128-aligned for typical widths (48: 2304->768->384->192->96->48 — the
    sub-128 tail slices are static, which Mosaic lowers as lane shifts).
    """
    while groups > 1:
        if groups % 2 == 0:
            h = (groups // 2) * c_out
            prod = prod[:, :h] + prod[:, h:2 * h]
            groups //= 2
        elif groups % 3 == 0:
            t = (groups // 3) * c_out
            prod = prod[:, :t] + prod[:, t:2 * t] + prod[:, 2 * t:3 * t]
            groups //= 3
        else:
            # awkward group count (e.g. the reference's w=43): plain
            # chunk-accumulate — correct everywhere, fast nowhere; prefer
            # widths with 2/3-smooth c_in (48/64/128) for the fused path
            acc = prod[:, :c_out]
            for g in range(1, groups):
                acc = acc + prod[:, g * c_out:(g + 1) * c_out]
            return acc
    return prod


@functools.partial(
    jax.jit,
    static_argnames=("c_in", "c_out", "rows_blk", "blk", "sub", "gemm_dtype",
                     "interpret"))
def fused_edge_conv(h_blocked: jnp.ndarray, x: jnp.ndarray,
                    senders_perm: jnp.ndarray, w3: jnp.ndarray,
                    b3: jnp.ndarray, s_matrix: jnp.ndarray, *,
                    c_in: int, c_out: int, rows_blk: int, blk: int,
                    sub: int = 256, gemm_dtype: str = "float32",
                    interpret: bool = False) -> jnp.ndarray:
    """One conv layer's message+aggregate: returns [num_blocks*rows_blk, c_out].

    Args:
      h_blocked: [num_blocks*blk, K] edge-MLP hidden feats in block order
        (layer-invariant: computed once per forward from permuted edge_attr).
      x: [N, c_in] node features entering this layer.
      senders_perm: [num_blocks*blk] int32 sender ids in block order.
      w3/b3: final edge-MLP layer ([K, c_in*c_out], [c_in*c_out]).
      s_matrix: [num_blocks*rows_blk, blk] scatter-weight blocks.
      sub: edges per inner VMEM tile (bounds the [sub, c_in*c_out] W tile).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = s_matrix.shape[0] // rows_blk
    k = h_blocked.shape[1]
    c2 = c_in * c_out
    assert blk % sub == 0, (blk, sub)
    n_sub = blk // sub

    dt = jnp.dtype(gemm_dtype)
    x_src = x[senders_perm].astype(dt)          # [num_blocks*blk, c_in]
    h_blocked = h_blocked.astype(dt)
    w3 = w3.astype(dt)
    b3f = b3.astype(jnp.float32).reshape(1, c2)
    # constant group-expansion matrix: (x @ p)[e, i*c_out+o] = x[e, i]
    p = jnp.zeros((c_in, c2), dt).at[
        jnp.arange(c_in).repeat(c_out),
        jnp.arange(c2)].set(1.0)

    # TPU MXU default precision feeds f32 operands through single-pass bf16
    # (~1e-3 rel err); full-f32 parity needs HIGHEST.  bf16 mode keeps the
    # fast single-pass path — that's its point.
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(h_ref, x_ref, w3_ref, b3_ref, p_ref, s_ref, out_ref):
        acc = jnp.zeros((rows_blk, c_out), jnp.float32)
        for t in range(n_sub):
            sl = slice(t * sub, (t + 1) * sub)
            w = jnp.dot(h_ref[sl, :], w3_ref[:], precision=prec,
                        preferred_element_type=jnp.float32) + b3_ref[:]
            xe = jnp.dot(x_ref[sl, :], p_ref[:], precision=prec,
                         preferred_element_type=jnp.float32)
            msg = _fold_groups(w * xe, c_in, c_out)      # [sub, c_out]
            acc = acc + jnp.dot(s_ref[:, sl], msg,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    flops = num_blocks * (2 * blk * k * c2 + 2 * blk * c_in * c2
                          + blk * c2 + 2 * rows_blk * blk * c_out)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((blk, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * rows_blk, c_out),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (num_blocks * blk * (k + c_in)
                                + s_matrix.size + num_blocks * rows_blk * c_out),
            transcendentals=0),
        interpret=interpret,
    )(h_blocked, x_src, w3, b3f, p, s_matrix)
    return out
