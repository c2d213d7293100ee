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
class CompactS:
    """Generator data for the dense S scatter blocks — 1/64th their bytes.

    S[b, r, c] = (slot_rows[b*blk+c] == r) * row_weight[b*rows_blk+r]; padding
    slots carry -1 and never match.  ``to_device_s`` expands it on device
    with one jitted compare-multiply — at 1M nodes this replaces a ~5 GB
    host allocation (page faults at ~43 MB/s on this 1-CPU box) plus its
    tunnel upload (~105 MB/s measured) with a ~20 MB index upload."""

    slot_rows: np.ndarray       # [num_blocks*blk] int32 row-in-block, -1 pad
    row_weight: np.ndarray      # [num_blocks*rows_blk] f32, 1/deg or 1


@dataclasses.dataclass(frozen=True)
class ScatterBlocks:
    """Host-precomputed, graph-static block structure (hashable aux: shapes
    only; arrays are numpy and passed as jit operands)."""

    edge_perm: np.ndarray       # [num_blocks*blk] int32 into original edges
    s_matrix: np.ndarray | None  # [num_blocks*rows_blk, blk] f32 (dense=True)
    senders_perm: np.ndarray    # [num_blocks*blk] int32 into nodes
    slot_mask: np.ndarray       # [num_blocks*blk] bool, False on padding
    compact_s: CompactS         # always built (tiny); see to_device_s
    rows_blk: int
    blk: int
    num_blocks: int
    n_nodes: int                # real node count (<= num_blocks*rows_blk)

    @property
    def n_pad(self) -> int:
        return self.num_blocks * self.rows_blk

    def train_aux(self) -> dict:
        """int32 operand dict for ``fused_edge_conv_ad`` (training).

        ``senders_dump``: sender id per slot, with padding slots redirected
        to a dump row at index n_nodes — the dx scatter-add runs as ONE
        unsorted ``segment_sum`` over n_nodes+1 segments and the dump row is
        sliced off.  Measured on v5e (dx-variant sweep, round 2): this beats
        the round-1 design (permute slots into sender-sorted order + masked
        sorted segment_sum) by ~9.5 ms/step at 295k slots — the [slots, w]
        gather that sorting requires costs more than the unsorted scatter
        saves, and the dump row deletes the mask pass entirely."""
        dump = np.where(self.slot_mask, self.senders_perm,
                        np.int32(self.n_nodes)).astype(np.int32)
        return {"senders_perm": self.senders_perm,
                "senders_dump": dump}


def build_scatter_blocks(receivers: np.ndarray, senders: np.ndarray,
                         n_nodes: int, edge_mask: np.ndarray | None = None,
                         rows_blk: int = 64, quantum: int = 256,
                         aggr: str = "mean",
                         max_s_bytes: int = 2 << 30,
                         dense: bool = True) -> ScatterBlocks:
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

    # vectorized block fill: edge j (global sorted order) lands in block
    # b(j) = receivers[j] // rows_blk at column j - bounds[b(j)]
    e_real = receivers.shape[0]
    edge_perm = np.zeros(num_blocks * blk, np.int32)
    senders_perm = np.zeros(num_blocks * blk, np.int32)
    slot_mask = np.zeros(num_blocks * blk, bool)
    slot_rows = np.full(num_blocks * blk, -1, np.int32)
    row_weight = np.zeros(num_blocks * rows_blk, np.float32)
    row_weight[:n_nodes] = weight[:n_nodes]
    s = np.zeros((num_blocks * rows_blk, blk), np.float32) if dense else None
    if e_real:
        block_of = (receivers // rows_blk).astype(np.int64)
        col = np.arange(e_real) - bounds[block_of]
        slot = block_of * blk + col
        edge_perm[slot] = real_idx
        senders_perm[slot] = senders
        slot_mask[slot] = True
        slot_rows[slot] = receivers % rows_blk
        if dense:
            s[receivers, col] = weight[receivers]
    return ScatterBlocks(edge_perm=edge_perm, s_matrix=s,
                         senders_perm=senders_perm, slot_mask=slot_mask,
                         compact_s=CompactS(slot_rows, row_weight),
                         rows_blk=rows_blk, blk=blk, num_blocks=num_blocks,
                         n_nodes=int(n_nodes))


def expand_s(slot_rows: jnp.ndarray, row_weight: jnp.ndarray, *,
             rows_blk: int, blk: int) -> jnp.ndarray:
    """Traceable dense-S expansion (jnp, safe INSIDE jit) — one blockwise
    compare-multiply.  Callers that keep S resident use ``to_device_s``;
    callers that stream many chunks expand per chunk inside their program
    so only the [nb*rows_blk, blk] transient of the CURRENT chunk exists
    (at 1M nodes the resident stacked S was 5.2 GB of HBM; the compact
    operands are 64 MB)."""
    nb = slot_rows.shape[0] // blk
    rib = slot_rows.reshape(nb, 1, blk)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, rows_blk, 1), 1)
    w = row_weight.reshape(nb, rows_blk, 1)
    return jnp.where(rib == rows, w, 0.0).reshape(nb * rows_blk, blk)


_s_device_jit = jax.jit(expand_s, static_argnames=("rows_blk", "blk"))


@functools.partial(jax.jit, static_argnames=("rows_blk", "blk", "n_dev"))
def _s_device_stacked_jit(slot_rows: jnp.ndarray, row_weight: jnp.ndarray, *,
                          rows_blk: int, blk: int, n_dev: int) -> jnp.ndarray:
    s = _s_device_jit(slot_rows, row_weight, rows_blk=rows_blk, blk=blk)
    return s.reshape(n_dev, -1, blk)


def to_device_s_stacked(s: CompactS, rows_blk: int, blk: int,
                        n_dev: int) -> jnp.ndarray:
    """[n_dev, nb*rows_blk, blk] dense S from flat-concatenated generators of
    n_dev same-geometry groups — ONE dispatch (build + reshape in one jit;
    an eager reshape after ``to_device_s`` would cost a second ~0.5 s tunnel
    round trip on the relay)."""
    return _s_device_stacked_jit(jnp.asarray(s.slot_rows),
                                 jnp.asarray(s.row_weight),
                                 rows_blk=rows_blk, blk=blk, n_dev=n_dev)


def to_device_s(s, rows_blk: int, blk: int) -> jnp.ndarray:
    """Device-resident dense S from either form.

    A ``CompactS`` expands ON DEVICE (one compare-multiply over the final
    S footprint — HBM-bandwidth trivial); a dense host array just uploads.
    Parity is exact: both paths place weight[r] at the same (row, col).
    Works on concatenated block stacks too (e.g. n_dev groups whose blocks
    were unified to one blk): the expansion is blockwise."""
    if isinstance(s, CompactS):
        return _s_device_jit(jnp.asarray(s.slot_rows),
                             jnp.asarray(s.row_weight),
                             rows_blk=rows_blk, blk=blk)
    return jnp.asarray(s)


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


def _expansion_matrix(c_in: int, c_out: int, dt) -> jnp.ndarray:
    """(x @ p)[e, i*c_out+o] = x[e, i] — constant 0/1 group expansion."""
    c2 = c_in * c_out
    return jnp.zeros((c_in, c2), dt).at[
        jnp.arange(c_in).repeat(c_out), jnp.arange(c2)].set(1.0)


def _xe_impl(requested: str | None) -> str:
    """'repeat' (default) or 'gemm' (env FESR_FUSED_XE overrides).

    'repeat' is the round-3 lane-repeat design: the edge-MLP output columns
    are permuted host-side to the TILED layout j = o*c_in + i, so the sender
    feature expansion is ``pltpu.repeat(x, c_out)`` (tile semantics — one
    lane-copy chain, no MXU pass) and the group fold is one block-diagonal
    GEMM.  Measured on v5e at bench scale (558 blocks, w=48, bf16):
    6.48 ms/layer vs 7.28 for the round-2 expansion-GEMM + fold-chain form —
    the xe GEMM leaves the per-block critical path.  'gemm' keeps the
    round-2 kernel (also the fallback if a toolchain lacks tpu.repeat)."""
    import os

    # explicit caller choice wins; the env var only overrides the default
    impl = requested or os.environ.get("FESR_FUSED_XE", "repeat")
    assert impl in ("repeat", "gemm"), impl
    return impl


def _perm_tiled(c_in: int, c_out: int) -> np.ndarray:
    """Column permutation to the tiled layout: out[:, o*c_in+i] = in[:, i*c_out+o]."""
    j = np.arange(c_in * c_out)
    o, i = j // c_in, j % c_in
    return (i * c_out + o).astype(np.int32)


def _fold_matrix_tiled(c_in: int, c_out: int, dt) -> jnp.ndarray:
    """(prod' @ f)[e, o] = sum_i prod'[e, o*c_in + i] — block-diagonal fold."""
    c2 = c_in * c_out
    return jnp.zeros((c2, c_out), dt).at[
        jnp.arange(c2), jnp.arange(c2) // c_in].set(1.0)


def _tile_matrix(c_out: int, c_in: int, dt) -> jnp.ndarray:
    """(g @ t)[e, i*c_out+o] = g[e, o] — tiles cotangents across groups."""
    c2 = c_in * c_out
    return jnp.zeros((c_out, c2), dt).at[
        jnp.tile(jnp.arange(c_out), c_in), jnp.arange(c2)].set(1.0)


def fused_edge_conv(h_blocked, x, senders_perm, w3, b3, s_matrix, *,
                    c_in: int, c_out: int, rows_blk: int, blk: int,
                    sub: int | None = None, gemm_dtype: str = "float32",
                    interpret: bool = False,
                    xe_impl: str | None = None) -> jnp.ndarray:
    """Resolves the xe implementation (env read happens OUTSIDE the jit cache
    so FESR_FUSED_XE flips retrace correctly) and dispatches."""
    return _fused_edge_conv_jit(h_blocked, x, senders_perm, w3, b3, s_matrix,
                                c_in=c_in, c_out=c_out, rows_blk=rows_blk,
                                blk=blk, sub=sub, gemm_dtype=gemm_dtype,
                                interpret=interpret,
                                xe_impl=_xe_impl(xe_impl))


@functools.partial(
    jax.jit,
    static_argnames=("c_in", "c_out", "rows_blk", "blk", "sub", "gemm_dtype",
                     "interpret", "xe_impl"))
def _fused_edge_conv_jit(h_blocked: jnp.ndarray, x: jnp.ndarray,
                         senders_perm: jnp.ndarray, w3: jnp.ndarray,
                         b3: jnp.ndarray, s_matrix: jnp.ndarray, *,
                         c_in: int, c_out: int, rows_blk: int, blk: int,
                         sub: int | None = None, gemm_dtype: str = "float32",
                         interpret: bool = False,
                         xe_impl: str = "gemm") -> jnp.ndarray:
    """One conv layer's message+aggregate: returns [num_blocks*rows_blk, c_out].

    Args:
      h_blocked: [num_blocks*blk, K] edge-MLP hidden feats in block order
        (layer-invariant: computed once per forward from permuted edge_attr).
      x: [N, c_in] node features entering this layer.
      senders_perm: [num_blocks*blk] int32 sender ids in block order.
      w3/b3: final edge-MLP layer ([K, c_in*c_out], [c_in*c_out]).
      s_matrix: [num_blocks*rows_blk, blk] scatter-weight blocks.
      sub: edges per inner VMEM tile (bounds the [sub, c_in*c_out] W tile);
        None picks the largest power-of-two divisor of blk up to 512 — the
        measured sweet spot (v5e, w=48: sub 512 > 256 > 128 by ~10%/step).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = s_matrix.shape[0] // rows_blk
    k = h_blocked.shape[1]
    c2 = c_in * c_out
    if sub is None:
        sub = next(s for s in (512, 256, 128, 64, 32, 16, 8, blk)
                   if blk % s == 0)
    assert blk % sub == 0, (blk, sub)
    n_sub = blk // sub

    dt = jnp.dtype(gemm_dtype)
    x_src = x[senders_perm].astype(dt)          # [num_blocks*blk, c_in]
    h_blocked = h_blocked.astype(dt)
    repeat_mode = xe_impl == "repeat"
    if repeat_mode:
        # tiled layout (see _xe_impl): permute edge-MLP output columns so the
        # sender expansion is a lane tile and the fold is one GEMM
        perm = jnp.asarray(_perm_tiled(c_in, c_out))
        w3 = w3[:, perm]
        b3 = b3[perm]
        p = _fold_matrix_tiled(c_in, c_out, dt)
    else:
        p = _expansion_matrix(c_in, c_out, dt)
    w3 = w3.astype(dt)
    b3f = b3.astype(jnp.float32).reshape(1, c2)

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
            if repeat_mode:
                xe = pltpu.repeat(x_ref[sl, :], c_out, axis=1)
                msg = jnp.dot((w * xe.astype(jnp.float32)).astype(dt),
                              p_ref[:], precision=prec,
                              preferred_element_type=jnp.float32)
            else:
                xe = jnp.dot(x_ref[sl, :], p_ref[:], precision=prec,
                             preferred_element_type=jnp.float32)
                msg = _fold_groups(w * xe, c_in, c_out)  # [sub, c_out]
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
            pl.BlockSpec(p.shape, lambda i: (0, 0),
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


def fused_edge_conv_bwd(g, h_blocked, x_src, w3, b3, s_matrix, *,
                        c_in: int, c_out: int, rows_blk: int, blk: int,
                        sub: int | None = None, gemm_dtype: str = "float32",
                        interpret: bool = False, xe_impl: str | None = None):
    """env-resolving wrapper (see fused_edge_conv)."""
    return _fused_edge_conv_bwd_jit(
        g, h_blocked, x_src, w3, b3, s_matrix, c_in=c_in, c_out=c_out,
        rows_blk=rows_blk, blk=blk, sub=sub, gemm_dtype=gemm_dtype,
        interpret=interpret, xe_impl=_xe_impl(xe_impl))


@functools.partial(
    jax.jit,
    static_argnames=("c_in", "c_out", "rows_blk", "blk", "sub", "gemm_dtype",
                     "interpret", "xe_impl"))
def _fused_edge_conv_bwd_jit(g: jnp.ndarray, h_blocked: jnp.ndarray,
                             x_src: jnp.ndarray, w3: jnp.ndarray,
                             b3: jnp.ndarray, s_matrix: jnp.ndarray, *,
                             c_in: int, c_out: int, rows_blk: int, blk: int,
                             sub: int | None = None,
                             gemm_dtype: str = "float32",
                             interpret: bool = False,
                             xe_impl: str = "gemm"):
    """Backward of fused_edge_conv wrt (h, x_src, w3, b3).

    Same block structure as the forward; recomputes W/xe per tile (cheaper
    than storing [slots, c_in*c_out] residuals — the whole point of the fused
    design).  Per-block partial dw3/db3 land in [num_blocks*K, c2] /
    [num_blocks, c2] outputs summed by XLA outside — per-block outputs avoid
    the cross-step accumulation (reduction-grid) pattern that hangs this
    toolchain's Mosaic compiler.

    Returns (dh [slots, K], dx_src [slots, c_in], dw3 [K, c2], db3 [c2]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = s_matrix.shape[0] // rows_blk
    k = h_blocked.shape[1]
    c2 = c_in * c_out
    if sub is None:
        sub = next(s for s in (256, 128, 64, 32, 16, 8, blk) if blk % s == 0)
    assert blk % sub == 0, (blk, sub)
    n_sub = blk // sub

    dt = jnp.dtype(gemm_dtype)
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    g = g.astype(jnp.float32)
    h_blocked = h_blocked.astype(dt)
    x_src = x_src.astype(dt)
    w3d = w3.astype(dt)
    b3f = b3.astype(jnp.float32).reshape(1, c2)
    p = _expansion_matrix(c_in, c_out, dt)
    if xe_impl == "repeat":
        # t_ref is never read in repeat mode (dprod is a pltpu.repeat lane
        # tile) — pass a minimal Mosaic-legal dummy instead of holding the
        # [c_out, c2] tile matrix (~442 KB f32 at w=48) in VMEM all kernel
        t_mat = jnp.zeros((8, 128), dt)
    else:
        t_mat = _tile_matrix(c_out, c_in, dt)

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

    # bf16 fast path (production combo): keep the [sub, c2] products AND the
    # operands of every big dot in bf16 — removes the f32->bf16 cast passes
    # (each a full VPU sweep of the tile) and halves product traffic.
    # Measured v5e: 7.16 vs 7.41 ms/layer at 279 blocks (isolated; neutral
    # end-to-end — the step is bounded elsewhere).  f32 mode keeps the
    # all-f32 products for parity.
    #
    # Round-3 bwd dead ends, all measured at 279-block bench scale: sub
    # 256 vs 512 flat (7.41/7.45 ms); rows_blk=128+blk=2048 VMEM-OOMs at
    # sub=512 (17.9M vs the 16M scoped limit) and is EXACTLY flat at sub=256
    # (7.41 ms).  Invariance to block count, tile size, dot count, and
    # product dtype means the bwd is bound by total [slots, c2] VPU/DMA
    # traffic — inherent to the per-edge-matrix operator (c_in*c_out lanes
    # per edge is the model's math); further speedups need an algorithmic
    # change (e.g. low-rank edge kernels), not scheduling.
    bf16_prod = dt == jnp.bfloat16
    b3d = b3f.astype(dt) if bf16_prod else b3f

    def kernel(g_ref, h_ref, x_ref, w3_ref, b3_ref, p_ref, t_ref, s_ref,
               dh_ref, dx_ref, dw3_ref, db3_ref):
        dw3_acc = jnp.zeros((k, c2), jnp.float32)
        # db3[(i,o)] = sum_e x[e,i] * dmsg[e,o] (dw summed over edges with
        # dprod=tile(dmsg), xe=expand(x)): ONE tiny [c_in, c_out] dot per
        # tile instead of a full [sub, c2] VPU reduction pass; flattened
        # row-major outside == the (i*c_out+o) layout
        db3_acc = jnp.zeros((max(c_in, 8), c_out), jnp.float32)
        gq = g_ref[:].astype(dt) if bf16_prod else g_ref[:]
        for ti in range(n_sub):
            sl = slice(ti * sub, (ti + 1) * sub)
            # dmsg = S_slice^T @ g  (contract the rows axis, no transpose op)
            dmsg = dotg(s_ref[:, sl].astype(dt) if bf16_prod else s_ref[:, sl],
                        gq, 0, 0)                          # [sub, c_out] f32
            dmsg_d = dmsg.astype(dt) if bf16_prod else dmsg
            if xe_impl == "repeat":
                # dprod[e, i*c_out+o] = dmsg[e, o]: a lane TILE of dmsg —
                # tpu.repeat replaces the t-matrix GEMM (round-3 lane-repeat
                # design, same trick as the forward's xe expansion)
                dprod = pltpu.repeat(dmsg_d, c_in, axis=1)  # [sub, c2]
            else:
                dprod = dotg(dmsg_d, t_ref[:], 1, 0)        # [sub, c2] f32
            if bf16_prod:
                # Mosaic requires 32-bit matmul accumulators, so the dots
                # stay f32-out; the casts move the [sub, c2] products (and
                # the downstream dot operands) to bf16
                w = dotg(h_ref[sl, :], w3_ref[:], 1, 0).astype(dt) + b3_ref[:]
                xe = dotg(x_ref[sl, :], p_ref[:], 1, 0).astype(dt)
            else:
                w = dotg(h_ref[sl, :], w3_ref[:], 1, 0) + b3_ref[:]
                xe = dotg(x_ref[sl, :], p_ref[:], 1, 0)
            dw = dprod * xe          # bf16 in the fast path, f32 in parity
            dxe = dprod * w
            dh_ref[sl, :] = dotg(dw.astype(dt), w3_ref[:], 1, 1)
            dx_ref[sl, :] = dotg(dxe.astype(dt), p_ref[:], 1, 1)
            dw3_acc = dw3_acc + dotg(h_ref[sl, :], dw.astype(dt), 0, 0)
            db3_tile = dotg(x_ref[sl, :], dmsg_d, 0, 0)    # [c_in, c_out]
            if c_in < 8:  # Mosaic sublane minimum: zero-pad the rows
                db3_tile = jnp.concatenate(
                    [db3_tile, jnp.zeros((8 - c_in, c_out), jnp.float32)], 0)
            db3_acc = db3_acc + db3_tile
        dw3_ref[:] = dw3_acc
        db3_ref[:] = db3_acc

    dh, dx_src_g, dw3_parts, db3_parts = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((rows_blk, c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(t_mat.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c_in, 8), c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * blk, k), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * blk, c_in), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * k, c2), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * max(c_in, 8), c_out),
                                 jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=num_blocks * blk * (8 * (k + c_in) * c2 // 2),
            bytes_accessed=4 * num_blocks * blk * (2 * k + 2 * c_in)
            + 4 * s_matrix.size,
            transcendentals=0),
        interpret=interpret,
    )(g, h_blocked, x_src, w3d, b3d, p, t_mat, s_matrix)

    dw3 = jnp.sum(dw3_parts.reshape(num_blocks, k, c2), axis=0)
    # db3 parts are [c_in, c_out] blocks; row-major flatten == (i*c_out+o)
    db3 = jnp.sum(db3_parts.reshape(num_blocks, max(c_in, 8), c_out),
                  axis=0)[:c_in].reshape(c2)
    return dh, dx_src_g, dw3, db3


def _perm_u_lowrank(c_in: int, r: int) -> np.ndarray:
    """U-part column permutation: out[:, q*c_in+i] = in[:, i*r+q]."""
    j = np.arange(c_in * r)
    q, i = j // c_in, j % c_in
    return (i * r + q).astype(np.int32)


def fused_edge_conv_lowrank(h_blocked, x, senders_perm, w3, b3, s_matrix, *,
                            c_in: int, c_out: int, rank: int, rows_blk: int,
                            blk: int, sub: int | None = None,
                            gemm_dtype: str = "bfloat16",
                            interpret: bool = False) -> jnp.ndarray:
    """Fused conv for RANK-FACTORIZED edge kernels (kernel_rank models).

    Per edge: W_e = U_e V_e^T with U_e [c_in, r], V_e [c_out, r] from one
    edge-MLP output [2*r*w].  The kernel runs the two per-edge matvecs as
    two (repeat, elementwise, block-diagonal-fold-GEMM) stages — the same
    lane-tile trick as the full-rank 'repeat' mode, with per-tile lane width
    r*(c_in+c_out) instead of c_in*c_out (3x less at w=48, r=8; this is the
    lever the full-rank bwd roofline points at).  Same ScatterBlocks
    structure as ``fused_edge_conv``; inference-only (no custom VJP yet —
    training uses the XLA path).
    """
    return _fused_lowrank_jit(h_blocked, x, senders_perm, w3, b3, s_matrix,
                              c_in=c_in, c_out=c_out, rank=rank,
                              rows_blk=rows_blk, blk=blk, sub=sub,
                              gemm_dtype=gemm_dtype, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("c_in", "c_out", "rank", "rows_blk", "blk", "sub",
                     "gemm_dtype", "interpret"))
def _fused_lowrank_jit(h_blocked, x, senders_perm, w3, b3, s_matrix, *,
                       c_in, c_out, rank, rows_blk, blk, sub, gemm_dtype,
                       interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = s_matrix.shape[0] // rows_blk
    k = h_blocked.shape[1]
    r = rank
    ru, rv = r * c_in, r * c_out
    if sub is None:
        sub = next(s for s in (512, 256, 128, 64, 32, 16, 8, blk)
                   if blk % s == 0)
    assert blk % sub == 0, (blk, sub)
    n_sub = blk // sub

    dt = jnp.dtype(gemm_dtype)
    x_src = x[senders_perm].astype(dt)
    h_blocked = h_blocked.astype(dt)
    # permute the U-part columns to the tiled layout q*c_in+i; V part
    # ([.., o*r+q] from the reshape(e, c_out, r) convention) needs none
    perm = jnp.concatenate([jnp.asarray(_perm_u_lowrank(c_in, r)),
                            ru + jnp.arange(rv, dtype=jnp.int32)])
    w3p = w3[:, perm].astype(dt)
    b3p = b3[perm].astype(jnp.float32).reshape(1, ru + rv)
    f1 = jnp.zeros((ru, r), dt).at[jnp.arange(ru), jnp.arange(ru) // c_in].set(1.0)
    f2 = jnp.zeros((rv, c_out), dt).at[jnp.arange(rv), jnp.arange(rv) // r].set(1.0)
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(h_ref, x_ref, w3_ref, b3_ref, f1_ref, f2_ref, s_ref, out_ref):
        acc = jnp.zeros((rows_blk, c_out), jnp.float32)
        for ti in range(n_sub):
            sl = slice(ti * sub, (ti + 1) * sub)
            uv = (jnp.dot(h_ref[sl, :], w3_ref[:], precision=prec,
                          preferred_element_type=jnp.float32)
                  + b3_ref[:]).astype(dt)
            u = uv[:, :ru]
            v = uv[:, ru:]
            xe = pltpu.repeat(x_ref[sl, :], r, axis=1)          # [sub, ru]
            t = jnp.dot(u * xe, f1_ref[:], precision=prec,
                        preferred_element_type=jnp.float32)      # [sub, r]
            te = pltpu.repeat(t.astype(dt), c_out, axis=1)       # [sub, rv]
            msg = jnp.dot(v * te, f2_ref[:], precision=prec,
                          preferred_element_type=jnp.float32)    # [sub, c_out]
            acc = acc + jnp.dot(s_ref[:, sl], msg,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ru + rv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ru + rv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ru, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rv, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * rows_blk, c_out),
                                       jnp.float32),
        interpret=interpret,
    )(h_blocked, x_src, w3p, b3p, f1, f2, s_matrix)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("c_in", "c_out", "rank", "rows_blk", "blk", "sub",
                     "gemm_dtype", "interpret"))
def _fused_lowrank_bwd_jit(g, h_blocked, x_src, w3, b3, s_matrix, *,
                           c_in, c_out, rank, rows_blk, blk, sub,
                           gemm_dtype, interpret):
    """Backward of the rank-r fused conv wrt (h, x_src, w3, b3).

    Same recompute strategy as the full-rank bwd; the chain runs backwards
    through the two repeat+fold stages.  Layout algebra (see
    ``_fused_lowrank_jit`` for the forward layouts):
      dpv[e, o*r+q]   = dmsg[e, o]           -> interleave GEMM (T2)
      dt[e, q]        = fold_o(dpv * v')      -> chunk fold (groups=c_out)
      dpu[e, q*c+i]   = dt[e, q] * x[e, i]    -> interleave GEMM (T1) * xe
      dx[e, i]        = fold_q(u' * dt_exp)   -> chunk fold (groups=r)
      db3_u[q*c+i]    = (dt^T @ x)            -> one [r, c_in] dot
      db3_v[o*r+q]    = (dmsg^T @ t)          -> one [c_out, r] dot
    w3/b3 cotangents come back in the PERMUTED layout; the caller unpermutes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = s_matrix.shape[0] // rows_blk
    k = h_blocked.shape[1]
    r = rank
    ru, rv = r * c_in, r * c_out
    if sub is None:
        sub = next(s for s in (256, 128, 64, 32, 16, 8, blk) if blk % s == 0)
    assert blk % sub == 0, (blk, sub)
    n_sub = blk // sub

    dt_ = jnp.dtype(gemm_dtype)
    prec = (jax.lax.Precision.HIGHEST if dt_ == jnp.float32
            else jax.lax.Precision.DEFAULT)
    bf16 = dt_ == jnp.bfloat16
    g = g.astype(jnp.float32)
    h_blocked = h_blocked.astype(dt_)
    x_src = x_src.astype(dt_)
    perm = jnp.concatenate([jnp.asarray(_perm_u_lowrank(c_in, r)),
                            ru + jnp.arange(rv, dtype=jnp.int32)])
    w3p = w3[:, perm].astype(dt_)
    b3p = b3[perm].reshape(1, ru + rv)
    b3p = b3p.astype(dt_ if bf16 else jnp.float32)
    f1 = jnp.zeros((ru, r), dt_).at[jnp.arange(ru), jnp.arange(ru) // c_in].set(1.0)
    f2 = jnp.zeros((rv, c_out), dt_).at[jnp.arange(rv), jnp.arange(rv) // r].set(1.0)
    t1 = jnp.zeros((r, ru), dt_).at[jnp.arange(ru) // c_in, jnp.arange(ru)].set(1.0)
    t2 = jnp.zeros((c_out, rv), dt_).at[jnp.arange(rv) // r, jnp.arange(rv)].set(1.0)
    # sublane-pad the small accumulators to >= 8 rows
    pr, pc = max(r, 8), max(c_out, 8)

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

    def pad_rows(a, rows):
        if a.shape[0] == rows:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0], a.shape[1]), jnp.float32)], 0)

    def kernel(g_ref, h_ref, x_ref, w3_ref, b3_ref, f1_ref, f2_ref, t1_ref,
               t2_ref, s_ref, dh_ref, dx_ref, dw3_ref, db3u_ref, db3v_ref):
        dw3_acc = jnp.zeros((k, ru + rv), jnp.float32)
        db3u_acc = jnp.zeros((pr, c_in), jnp.float32)   # [q, i] rows q
        db3v_acc = jnp.zeros((pc, r), jnp.float32)      # [o, q] rows o
        gq = g_ref[:].astype(dt_) if bf16 else g_ref[:]
        for ti in range(n_sub):
            sl = slice(ti * sub, (ti + 1) * sub)
            # forward recompute
            uv = dotg(h_ref[sl, :], w3_ref[:], 1, 0)
            uv = (uv.astype(dt_) + b3_ref[:] if bf16 else uv + b3_ref[:])
            u = uv[:, :ru]
            v = uv[:, ru:]
            xe = pltpu.repeat(x_ref[sl, :], r, axis=1)
            t = dotg((u * xe).astype(dt_), f1_ref[:], 1, 0)   # [sub, r] f32
            t_d = t.astype(dt_)
            # backward chain
            dmsg = dotg(s_ref[:, sl].astype(dt_) if bf16 else s_ref[:, sl],
                        gq, 0, 0)                              # [sub, c_out]
            dmsg_d = dmsg.astype(dt_)
            dpv = dotg(dmsg_d, t2_ref[:], 1, 0).astype(dt_)    # [sub, rv]
            te = pltpu.repeat(t_d, c_out, axis=1)
            dv = dpv * te
            dte = dpv * v
            dt_vec = _fold_groups(dte, c_out, r)               # [sub, r]
            dt_exp = dotg(dt_vec.astype(dt_), t1_ref[:], 1, 0).astype(dt_)
            du = dt_exp * xe
            dx_ref[sl, :] = _fold_groups((u * dt_exp).astype(jnp.float32),
                                         r, c_in)
            duv = jnp.concatenate([du.astype(dt_), dv.astype(dt_)], axis=1)
            dh_ref[sl, :] = dotg(duv, w3_ref[:], 1, 1)
            dw3_acc = dw3_acc + dotg(h_ref[sl, :], duv, 0, 0)
            db3u_acc = db3u_acc + pad_rows(
                dotg(dt_vec.astype(dt_), x_ref[sl, :], 0, 0), pr)
            db3v_acc = db3v_acc + pad_rows(
                dotg(dmsg_d, t_d, 0, 0), pc)
        dw3_ref[:] = dw3_acc
        db3u_ref[:] = db3u_acc
        db3v_ref[:] = db3v_acc

    dh, dx_src, dw3_parts, db3u_parts, db3v_parts = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((rows_blk, c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ru + rv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ru + rv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ru, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rv, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, ru), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, rv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_blk, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ru + rv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pr, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * blk, k), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * blk, c_in), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * k, ru + rv), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * pr, c_in), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * pc, r), jnp.float32),
        ),
        interpret=interpret,
    )(g, h_blocked, x_src, w3p, b3p, f1, f2, t1, t2, s_matrix)

    dw3p = jnp.sum(dw3_parts.reshape(num_blocks, k, ru + rv), axis=0)
    db3u = jnp.sum(db3u_parts.reshape(num_blocks, pr, c_in),
                   axis=0)[:r].reshape(ru)            # row-major == q*c_in+i
    db3v = jnp.sum(db3v_parts.reshape(num_blocks, pc, r),
                   axis=0)[:c_out].reshape(rv)        # row-major == o*r+q
    db3p = jnp.concatenate([db3u, db3v])
    # unpermute the w3/b3 cotangents back to the model's column layout
    inv = jnp.zeros((ru + rv,), jnp.int32).at[
        jnp.concatenate([jnp.asarray(_perm_u_lowrank(c_in, r)),
                         ru + jnp.arange(rv, dtype=jnp.int32)])].set(
        jnp.arange(ru + rv, dtype=jnp.int32))
    return dh, dx_src, dw3p[:, inv], db3p[inv]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def fused_edge_conv_lowrank_ad(h_blocked, x, w3, b3, s_matrix, fused_aux,
                               c_in, c_out, rank, rows_blk, blk, sub,
                               gemm_dtype, interpret):
    """Differentiable rank-r fused conv (training path) — same contract as
    ``fused_edge_conv_ad`` with the factorized kernel."""
    return fused_edge_conv_lowrank(
        h_blocked, x, fused_aux["senders_perm"], w3, b3, s_matrix,
        c_in=c_in, c_out=c_out, rank=rank, rows_blk=rows_blk, blk=blk,
        sub=sub, gemm_dtype=gemm_dtype, interpret=interpret)


def _fused_lr_ad_fwd(h_blocked, x, w3, b3, s_matrix, fused_aux,
                     c_in, c_out, rank, rows_blk, blk, sub, gemm_dtype,
                     interpret):
    out = fused_edge_conv_lowrank_ad(
        h_blocked, x, w3, b3, s_matrix, fused_aux, c_in, c_out, rank,
        rows_blk, blk, sub, gemm_dtype, interpret)
    return out, (h_blocked, x, w3, b3, s_matrix, fused_aux)


def _fused_lr_ad_bwd(c_in, c_out, rank, rows_blk, blk, sub, gemm_dtype,
                     interpret, res, g):
    h_blocked, x, w3, b3, s_matrix, fused_aux = res
    x_src = x[fused_aux["senders_perm"]]
    dh, dx_src, dw3, db3 = _fused_lowrank_bwd_jit(
        g, h_blocked, x_src, w3, b3, s_matrix, c_in=c_in, c_out=c_out,
        rank=rank, rows_blk=rows_blk, blk=blk, sub=sub,
        gemm_dtype=gemm_dtype, interpret=interpret)
    n = x.shape[0]
    dx = jax.ops.segment_sum(dx_src, fused_aux["senders_dump"],
                             num_segments=n + 1)[:n]
    return (dh, dx.astype(x.dtype), dw3.astype(w3.dtype),
            db3.astype(b3.dtype), jnp.zeros_like(s_matrix), None)


fused_edge_conv_lowrank_ad.defvjp(_fused_lr_ad_fwd, _fused_lr_ad_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_edge_conv_ad(h_blocked, x, w3, b3, s_matrix, fused_aux,
                       c_in, c_out, rows_blk, blk, sub, gemm_dtype,
                       interpret):
    """Differentiable fused conv layer (training path).

    ``fused_aux``: dict of graph-static int32 arrays —
      senders_perm [slots]; senders_dump [slots] (sender per slot, padding
      slots redirected to the dump segment n_nodes so they can't corrupt
      node 0's gradient).
    Gradients flow to (h_blocked, x, w3, b3); the scatter-add of dx over
    senders runs as one unsorted XLA segment_sum with a dump row (measured
    faster than the sorted-permutation design — see ScatterBlocks.train_aux).
    """
    return fused_edge_conv(h_blocked, x, fused_aux["senders_perm"], w3, b3,
                           s_matrix, c_in=c_in, c_out=c_out,
                           rows_blk=rows_blk, blk=blk, sub=sub,
                           gemm_dtype=gemm_dtype, interpret=interpret)


def _fused_ad_fwd(h_blocked, x, w3, b3, s_matrix, fused_aux,
                  c_in, c_out, rows_blk, blk, sub, gemm_dtype, interpret):
    out = fused_edge_conv_ad(h_blocked, x, w3, b3, s_matrix, fused_aux,
                             c_in, c_out, rows_blk, blk, sub, gemm_dtype,
                             interpret)
    return out, (h_blocked, x, w3, b3, s_matrix, fused_aux)


def _fused_ad_bwd(c_in, c_out, rows_blk, blk, sub, gemm_dtype, interpret,
                  res, g):
    h_blocked, x, w3, b3, s_matrix, fused_aux = res
    x_src = x[fused_aux["senders_perm"]]
    dh, dx_src, dw3, db3 = fused_edge_conv_bwd(
        g, h_blocked, x_src, w3, b3, s_matrix, c_in=c_in, c_out=c_out,
        rows_blk=rows_blk, blk=blk, sub=sub, gemm_dtype=gemm_dtype,
        interpret=interpret)
    n = x.shape[0]
    dx = jax.ops.segment_sum(dx_src, fused_aux["senders_dump"],
                             num_segments=n + 1)[:n]
    return (dh, dx.astype(x.dtype), dw3.astype(w3.dtype),
            db3.astype(b3.dtype), jnp.zeros_like(s_matrix), None)


fused_edge_conv_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


def prepare_fused(senders, receivers, edge_attr, n_nodes, edge_mask=None,
                  rows_blk: int = 64, quantum: int = 256,
                  compact: bool = False):
    """Host-side (numpy) fused-path operands for a static graph — shared by
    every edge-conditioned model family (KernelNN, TEECNet).

    Returns (edge_attr_blocked, senders_perm, s, rows_blk, blk) where s is
    the dense host S matrix, or (compact=True) a ``CompactS`` to expand on
    device with ``to_device_s`` — skips the N*blk*4-byte host allocation.
    """
    blocks = build_scatter_blocks(receivers, senders, n_nodes, edge_mask,
                                  rows_blk=rows_blk, quantum=quantum,
                                  dense=not compact)
    ea = np.asarray(edge_attr)[blocks.edge_perm]
    s = blocks.compact_s if compact else blocks.s_matrix
    return (ea, blocks.senders_perm, s, blocks.rows_blk, blocks.blk)


def prepare_fused_train(senders, receivers, edge_attr, n_nodes,
                        edge_mask=None, rows_blk: int = 64,
                        quantum: int = 256, compact: bool = False):
    """Host-side operands for the differentiable fused path:
    (edge_attr_blocked, fused_aux, s, rows_blk, blk); s as in
    ``prepare_fused``."""
    blocks = build_scatter_blocks(receivers, senders, n_nodes, edge_mask,
                                  rows_blk=rows_blk, quantum=quantum,
                                  dense=not compact)
    ea = np.asarray(edge_attr)[blocks.edge_perm]
    s = blocks.compact_s if compact else blocks.s_matrix
    return (ea, blocks.train_aux(), s, blocks.rows_blk, blocks.blk)
