"""KernelNN ("neuralop") — the reference's default surrogate model.

Parity target: /root/reference/models/model.py:543-562 (KernelNN) built on
NNConv_old (model.py:451-540) with a shared DenseNet edge kernel
[ker_in, ker_width, ker_width, width**2] + ReLU (model.py:550) and
aggr='mean' (model.py:551).  Forward: fc1 -> depth x relu(conv) -> fc2
(model.py:555-562).  Checkpoint layout verified against
logs/models/collection_duct_neuralop/partition_0.pth (width=43, in/out=4).

TPU design: static config lives on a frozen dataclass (hashable, jit-static);
params are a pure pytree of arrays (vmap-stackable for expert dispatch).  The
shared-weight depth loop is a ``lax.scan`` with per-layer rematerialization;
the conv mode is selected per backend (ops/message_passing.resolve_mode).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.message_passing import edge_conditioned_conv
from .common import from_torch_linear, linear, linear_init, mlp_init, pyg_uniform_init, to_torch_linear


@dataclasses.dataclass(frozen=True)
class KernelNN:
    """Static model config (mirrors KernelNN.__init__, model.py:544-553)."""

    width: int
    ker_width: int
    depth: int
    ker_in: int = 1
    in_width: int = 3
    out_width: int = 3
    mode: str = "auto"  # auto -> best for backend; or factored | edge | pallas
    remat: bool = True  # jax.checkpoint each conv layer: the backward would
    # otherwise keep every layer's [E, w^2] per-edge matrices live (~4 GB per
    # layer at 435k edges, w=48 — OOMs a 16 GB v5e); recompute instead
    kernel_dtype: str | None = None  # 'bfloat16' stores the precomputed
    # per-edge matrices half-size (f32 accumulation) — ~5e-3 rel error, opt-in
    lut_knots: int = 512  # table size for mode='lut' (tabulated edge kernel)
    edges_sorted: bool = False  # promise receiver-sorted edges (pad_graph
    # emits them sorted) -> faster TPU scatter lowering
    kernel_rank: int | None = None  # factorized per-edge kernel W_e = U_e V_e^T
    # (U_e [w, r], V_e [w, r]) — a BEYOND-PARITY extension: the fused-kernel
    # roofline is total [E, w^2] lane traffic (ops/fused_conv.py bwd notes),
    # inherent to full-rank per-edge matrices; rank r cuts per-edge state and
    # flops from w^2 to 2*r*w (3x at w=48, r=8).  Opt-in; no reference analog
    # (NNConv is full-rank, model.py:521-536); has its own fused Pallas
    # kernels (fused_edge_conv_lowrank{,_ad}) — see fused_ok below.

    @property
    def fused_ok(self) -> bool:
        # inference: both full-rank and rank-r have fused Pallas kernels
        return True

    @property
    def fused_train_ok(self) -> bool:
        # both full-rank and rank-r convs have custom-VJP fused kernels
        return True

    def init(self, key) -> dict:
        w = self.width
        ks = jax.random.split(key, 5)
        ker_out = (w * w if self.kernel_rank is None
                   else 2 * self.kernel_rank * w)
        return {
            "fc1": linear_init(ks[0], self.in_width, w),
            "conv": {
                "edge_mlp": mlp_init(ks[1], [self.ker_in, self.ker_width, self.ker_width, ker_out]),
                "root": pyg_uniform_init(ks[2], w, (w, w)),
                "bias": pyg_uniform_init(ks[3], w, (w,)),
            },
            "fc2": linear_init(ks[4], w, self.out_width),
        }

    def apply(self, params: dict, x: jnp.ndarray, senders: jnp.ndarray,
              receivers: jnp.ndarray, edge_attr: jnp.ndarray,
              edge_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """Forward pass for one (padded) graph. x: [N, C_in] -> [N, C_out]."""
        from ..ops.message_passing import precompute_edge_kernel

        conv = params["conv"]
        h = linear(params["fc1"], x)
        if self.kernel_rank is not None:
            return self._apply_lowrank(params, h, senders, receivers,
                                       edge_attr, edge_mask)
        # conv weights are shared across depth (model.py:558-559), so the
        # per-edge kernel matrices are loop-invariant: compute once, not
        # depth times (cuts the dominant GEMM and its HBM writes by 5x)
        kdtype = jnp.dtype(self.kernel_dtype) if self.kernel_dtype else None
        pre = precompute_edge_kernel(conv["edge_mlp"], edge_attr,
                                     jax.nn.relu, self.mode, kdtype,
                                     self.lut_knots, edge_mask=edge_mask)
        from ..ops.segment import segment_degree

        deg = segment_degree(receivers, x.shape[0], edge_mask)

        def body(h, _):
            h = edge_conditioned_conv(
                h, senders, receivers, edge_attr,
                edge_mlp=conv["edge_mlp"], root=conv["root"], bias=conv["bias"],
                edge_mask=edge_mask, activation=jax.nn.relu, aggr="mean",
                mode=self.mode, precomputed=pre, degree=deg,
                edges_sorted=self.edges_sorted,
            )
            return jax.nn.relu(h), None

        if self.remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, None, length=self.depth)
        return linear(params["fc2"], h)

    def _apply_lowrank(self, params: dict, h: jnp.ndarray,
                       senders: jnp.ndarray, receivers: jnp.ndarray,
                       edge_attr: jnp.ndarray,
                       edge_mask: jnp.ndarray | None) -> jnp.ndarray:
        """Rank-r conv: msg_e = (h[s_e] @ U_e) @ V_e^T, scatter-mean.

        U/V come from ONE loop-invariant edge-MLP pass ([E, 2rw] — 3x
        smaller than the full-rank [E, w^2] at w=48, r=8); the per-layer
        work is two 3D einsums (edge3d-style, compiles everywhere the
        edge3d mode does) + the usual segment-mean.
        """
        from ..ops.message_passing import apply_edge_mlp_hidden
        from ..ops.segment import masked_segment_mean, segment_degree

        conv = params["conv"]
        w, r = self.width, self.kernel_rank
        kdtype = jnp.dtype(self.kernel_dtype) if self.kernel_dtype else None
        hid = apply_edge_mlp_hidden(conv["edge_mlp"], edge_attr, jax.nn.relu)
        last = conv["edge_mlp"][-1]
        uv = hid @ last["w"] + last["b"]                          # [E, 2rw]
        if kdtype is not None:
            uv = uv.astype(kdtype)
        e = uv.shape[0]
        u = uv[:, : w * r].reshape(e, w, r)
        v = uv[:, w * r:].reshape(e, w, r)
        deg = segment_degree(receivers, h.shape[0], edge_mask)

        def body(h, _):
            hs = h[senders]
            if kdtype is not None:
                hs = hs.astype(kdtype)
            t = jnp.einsum("ei,eir->er", hs, u)
            msg = jnp.einsum("er,eor->eo", t, v).astype(h.dtype)
            agg = masked_segment_mean(msg, receivers, h.shape[0], edge_mask,
                                      count=deg,
                                      indices_are_sorted=self.edges_sorted)
            return jax.nn.relu(agg + h @ conv["root"] + conv["bias"]), None

        if self.remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, None, length=self.depth)
        return linear(params["fc2"], h)

    def apply_fused(self, params: dict, x: jnp.ndarray,
                    edge_attr_blocked: jnp.ndarray,
                    senders_perm: jnp.ndarray, s_matrix: jnp.ndarray, *,
                    rows_blk: int, blk: int, sub: int | None = None,
                    gemm_dtype: str = "bfloat16",
                    interpret: bool = False) -> jnp.ndarray:
        """Forward via the fused Pallas conv layer (ops/fused_conv.py).

        Inference fast path: per-edge kernel matrices stay VMEM-resident and
        the scatter-mean runs as a dense MXU matmul against host-precomputed
        scatter blocks (``ops.fused_conv.build_scatter_blocks``) — use
        ``prepare_fused(graph)`` to build the extra operands.  bf16 GEMM
        inputs by default: measured accuracy equals the XLA path's own
        TPU default-precision (~3e-3 vs f64); pass gemm_dtype='float32' for
        full-precision parity (slower: 6-pass MXU).
        """
        from ..ops.fused_conv import fused_edge_conv, fused_edge_conv_lowrank
        from ..ops.message_passing import apply_edge_mlp_hidden

        conv = params["conv"]
        n = x.shape[0]
        h = linear(params["fc1"], x)
        # layer-invariant: edge-MLP hidden feats in block order, once
        h_e = apply_edge_mlp_hidden(conv["edge_mlp"], edge_attr_blocked,
                                    jax.nn.relu)
        w3, b3 = conv["edge_mlp"][-1]["w"], conv["edge_mlp"][-1]["b"]
        for _ in range(self.depth):
            if self.kernel_rank is not None:
                agg = fused_edge_conv_lowrank(
                    h_e, h, senders_perm, w3, b3, s_matrix,
                    c_in=self.width, c_out=self.width,
                    rank=self.kernel_rank, rows_blk=rows_blk, blk=blk,
                    sub=sub, gemm_dtype=gemm_dtype, interpret=interpret)
            else:
                agg = fused_edge_conv(
                    h_e, h, senders_perm, w3, b3, s_matrix,
                    c_in=self.width, c_out=self.width,
                    rows_blk=rows_blk, blk=blk, sub=sub,
                    gemm_dtype=gemm_dtype, interpret=interpret)
            h = jax.nn.relu(agg[:n] + h @ conv["root"] + conv["bias"])
        return linear(params["fc2"], h)

    def apply_fused_ad(self, params: dict, x: jnp.ndarray,
                       edge_attr_blocked: jnp.ndarray, fused_aux: dict,
                       s_matrix: jnp.ndarray, *, rows_blk: int, blk: int,
                       gemm_dtype: str = "bfloat16",
                       interpret: bool = False) -> jnp.ndarray:
        """Differentiable fused forward (training path).

        Same math as ``apply_fused`` but through the custom-VJP wrapper
        (ops/fused_conv.fused_edge_conv_ad): backward recomputes the per-edge
        matrices in VMEM tile-by-tile — no [E, w^2] residuals, no remat of
        the whole layer.  ``fused_aux`` comes from
        ``prepare_fused_train``; bf16 GEMM passes for fwd and bwd (standard
        mixed precision), 'float32' for full-precision gradients.
        """
        from ..ops.fused_conv import (fused_edge_conv_ad,
                                      fused_edge_conv_lowrank_ad)
        from ..ops.message_passing import apply_edge_mlp_hidden

        conv = params["conv"]
        n = x.shape[0]
        h = linear(params["fc1"], x)
        h_e = apply_edge_mlp_hidden(conv["edge_mlp"], edge_attr_blocked,
                                    jax.nn.relu)
        w3, b3 = conv["edge_mlp"][-1]["w"], conv["edge_mlp"][-1]["b"]
        for _ in range(self.depth):
            if self.kernel_rank is not None:
                agg = fused_edge_conv_lowrank_ad(
                    h_e, h, w3, b3, s_matrix, fused_aux, self.width,
                    self.width, self.kernel_rank, rows_blk, blk, None,
                    gemm_dtype, interpret)
            else:
                agg = fused_edge_conv_ad(h_e, h, w3, b3, s_matrix, fused_aux,
                                         self.width, self.width, rows_blk,
                                         blk, None, gemm_dtype, interpret)
            h = jax.nn.relu(agg[:n] + h @ conv["root"] + conv["bias"])
        return linear(params["fc2"], h)

    @staticmethod
    def prepare_fused_train(senders, receivers, edge_attr, n_nodes,
                            edge_mask=None, rows_blk: int = 64,
                            quantum: int = 256, compact: bool = False):
        """Host-side operands for ``apply_fused_ad``:
        (edge_attr_blocked, fused_aux, s_matrix, rows_blk, blk)."""
        from ..ops.fused_conv import prepare_fused_train

        return prepare_fused_train(senders, receivers, edge_attr, n_nodes,
                                   edge_mask, rows_blk, quantum,
                                   compact=compact)

    @staticmethod
    def prepare_fused(senders, receivers, edge_attr, n_nodes,
                      edge_mask=None, rows_blk: int = 64,
                      quantum: int = 256, compact: bool = False):
        """Host-side (numpy) fused-path operands for a static graph.

        Returns (edge_attr_blocked, senders_perm, s_matrix, rows_blk, blk).
        """
        from ..ops.fused_conv import prepare_fused

        return prepare_fused(senders, receivers, edge_attr, n_nodes,
                             edge_mask, rows_blk, quantum, compact=compact)

    def import_pth(self, state_dict) -> dict:
        """Params from a reference checkpoint (torch state_dict / numpy dict).

        Key layout per logs/models/collection_duct_neuralop/partition_0.pth:
        fc1.*, conv1.root, conv1.bias, conv1.nn.layers.{0,2,4}.*, fc2.*.
        """
        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}
        got = sd["conv1.root"].shape[0]
        if got != self.width:
            raise ValueError(
                f"checkpoint width {got} does not match model config width {self.width}")
        if sd["fc1.weight"].shape != (self.width, self.in_width):
            raise ValueError(
                f"checkpoint fc1 {sd['fc1.weight'].shape} does not match "
                f"(width={self.width}, in_width={self.in_width})")
        # the edge-MLP head width encodes the kernel factorization: full
        # rank = width*width, rank-r = 2*r*width.  A full-rank reference
        # checkpoint silently loading into a rank-r config would slice the
        # flat head with the wrong column meaning and predict garbage.
        head = sd["conv1.nn.layers.4.weight"].shape[0]
        want = (self.width * self.width if self.kernel_rank is None
                else 2 * self.kernel_rank * self.width)
        if head != want:
            raise ValueError(
                f"checkpoint edge-MLP head width {head} does not match "
                f"kernel_rank={self.kernel_rank} (expected {want}; full-rank "
                "checkpoints cannot load into low-rank configs or vice versa)")
        return {
            "fc1": from_torch_linear(sd, "fc1"),
            "conv": {
                "edge_mlp": [from_torch_linear(sd, f"conv1.nn.layers.{i}") for i in (0, 2, 4)],
                "root": jnp.asarray(sd["conv1.root"], jnp.float32),
                "bias": jnp.asarray(sd["conv1.bias"], jnp.float32),
            },
            "fc2": from_torch_linear(sd, "fc2"),
        }

    def export_pth(self, params: dict) -> dict:
        """Inverse of import_pth — numpy state_dict in the reference's layout."""
        import numpy as np

        out: dict = {}
        to_torch_linear(params["fc1"], "fc1", out)
        for i, li in zip((0, 2, 4), range(3)):
            to_torch_linear(params["conv"]["edge_mlp"][li], f"conv1.nn.layers.{i}", out)
        out["conv1.root"] = np.asarray(params["conv"]["root"])
        out["conv1.bias"] = np.asarray(params["conv"]["bias"])
        to_torch_linear(params["fc2"], "fc2", out)
        return out
