"""TEECNet — Taylor-series Expansion Error Correction Network.

Parity target: /root/reference/models/model.py:259-286 (TEECNet) with the
shared KernelConv (model.py:365-448): messages are ``linear(x_j) @ W_op(e)``
where ``W_op = DenseNet([in_edge,32,64,128,width**2], LeakyReLU)(e)``
(model.py:403, 426-441), aggregation 'mean' (model.py:394), and the update adds
``x @ root_param + bias`` applied to the *pre-linear* node features
(model.py:444-445).  No inter-layer nonlinearity (model.py:280-282).
Checkpoint layout verified against
logs/models/collection_duct_teecnet/partition_0.pth (width=43).

Note: ``linear(x_i)`` is computed but unused in the reference's message
(model.py:430-441) — we keep the used dataflow only.  PowerSeriesKernel exists
in the reference but is disconnected (model.py:402, 427 commented out); see
powerseries.py for the framework's implementation of that kernel family.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.message_passing import edge_conditioned_conv
from .common import from_torch_linear, linear, linear_init, mlp_init, pyg_uniform_init, to_torch_linear

_leaky_relu = partial(jax.nn.leaky_relu, negative_slope=0.01)  # torch default slope


@dataclasses.dataclass(frozen=True)
class TEECNet:
    """Static model config (mirrors TEECNet.__init__, model.py:269-276)."""

    in_channels: int
    width: int
    out_channels: int
    num_layers: int = 4
    in_edge: int = 1
    mode: str = "auto"  # auto -> best for backend; or factored | edge | pallas
    remat: bool = True  # checkpoint each conv layer (see kernelnn.py note)
    kernel_type: str = "dense"  # 'dense' (DenseNet op kernel) | 'powerseries'
    num_powers: int = 3
    ps_layers: int = 3
    edges_sorted: bool = False  # promise receiver-sorted edges (see kernelnn)

    def init(self, key) -> dict:
        w = self.width
        ks = jax.random.split(key, 7)
        params = {
            "fc1": linear_init(ks[0], self.in_channels, w),
            "kernel": {
                "linear": linear_init(ks[1], w, w),
                "edge_mlp": mlp_init(ks[2], [self.in_edge, 32, 64, 128, w * w]),
                "root": pyg_uniform_init(ks[3], w, (w, w)),
                "bias": pyg_uniform_init(ks[4], w, (w,)),
            },
            "fc_out": linear_init(ks[5], w, self.out_channels),
        }
        if self.kernel_type == "powerseries":
            from .powerseries import PowerSeriesKernel

            params["kernel"]["ps"] = PowerSeriesKernel(
                self.in_edge, w * w, self.ps_layers, self.num_powers).init(ks[6])
        return params

    def apply(self, params: dict, x: jnp.ndarray, senders: jnp.ndarray,
              receivers: jnp.ndarray, edge_attr: jnp.ndarray,
              edge_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        kern = params["kernel"]
        h = linear(params["fc1"], x)

        if self.kernel_type == "powerseries":
            # Taylor-expansion edge kernel — the reference defines this family
            # but leaves it disconnected (model.py:402, 427 commented); here
            # it is a first-class alternative.  Nonlinear in its final layer,
            # so the factored/pallas forms don't apply: per-edge matrices.
            from ..ops.segment import masked_segment_mean, segment_degree
            from .powerseries import PowerSeriesKernel

            ps = PowerSeriesKernel(self.in_edge, self.width * self.width,
                                   self.ps_layers, self.num_powers)
            w_e = ps.apply(kern["ps"], edge_attr).reshape(
                -1, self.width, self.width)
            # degree is loop-invariant: hoist like the dense branch (one
            # segment_sum instead of one per layer)
            deg = segment_degree(receivers, x.shape[0], edge_mask)

            def body(h, _):
                xj = linear(kern["linear"], h)[senders]
                msg = jnp.einsum("ei,eio->eo", xj, w_e)
                aggr = masked_segment_mean(msg, receivers, h.shape[0],
                                           edge_mask, count=deg,
                                           indices_are_sorted=self.edges_sorted)
                return aggr + h @ kern["root"] + kern["bias"], None

            if self.remat:  # same training-memory behavior as the dense branch
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h, None, length=self.num_layers)
            return linear(params["fc_out"], h)

        from ..ops.message_passing import precompute_edge_kernel

        # shared KernelConv across layers (model.py:280-282): the per-edge
        # operator matrices are loop-invariant — compute once
        pre = precompute_edge_kernel(kern["edge_mlp"], edge_attr,
                                     _leaky_relu, self.mode,
                                     edge_mask=edge_mask)
        from ..ops.segment import segment_degree

        deg = segment_degree(receivers, x.shape[0], edge_mask)

        def body(h, _):
            h = edge_conditioned_conv(
                linear(kern["linear"], h), senders, receivers, edge_attr,
                edge_mlp=kern["edge_mlp"], root=kern["root"], bias=kern["bias"],
                edge_mask=edge_mask, activation=_leaky_relu, aggr="mean",
                mode=self.mode, root_input=h, precomputed=pre, degree=deg,
                edges_sorted=self.edges_sorted,
            )
            return h, None

        if self.remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, None, length=self.num_layers)
        return linear(params["fc_out"], h)

    @property
    def fused_ok(self) -> bool:
        """The fused Pallas path folds the edge MLP's LAST LINEAR layer into
        the kernel — only valid for the dense (DenseNet) operator kernel.
        The powerseries kernel is nonlinear in its final stage."""
        return self.kernel_type == "dense"

    def apply_fused(self, params: dict, x: jnp.ndarray,
                    edge_attr_blocked: jnp.ndarray,
                    senders_perm: jnp.ndarray, s_matrix: jnp.ndarray, *,
                    rows_blk: int, blk: int, sub: int | None = None,
                    gemm_dtype: str = "bfloat16",
                    interpret: bool = False) -> jnp.ndarray:
        """Forward via the fused Pallas conv (ops/fused_conv.py).

        TEECNet's message is ``linear(x_j) @ W_op(e)`` (model.py:426-441) —
        the same per-edge bmm + scatter-mean as KernelNN with the node
        features pre-transformed, so the fused kernel applies directly to
        ``linear(h)``; the update adds ``h @ root + bias`` on the
        PRE-linear features (model.py:444-445), no inter-layer nonlinearity.
        Dense operator kernel only (``fused_ok``).
        """
        assert self.fused_ok, "fused path requires kernel_type='dense'"
        from ..ops.fused_conv import fused_edge_conv
        from ..ops.message_passing import apply_edge_mlp_hidden

        kern = params["kernel"]
        n = x.shape[0]
        h = linear(params["fc1"], x)
        h_e = apply_edge_mlp_hidden(kern["edge_mlp"], edge_attr_blocked,
                                    _leaky_relu)
        w3, b3 = kern["edge_mlp"][-1]["w"], kern["edge_mlp"][-1]["b"]
        for _ in range(self.num_layers):
            agg = fused_edge_conv(h_e, linear(kern["linear"], h),
                                  senders_perm, w3, b3, s_matrix,
                                  c_in=self.width, c_out=self.width,
                                  rows_blk=rows_blk, blk=blk, sub=sub,
                                  gemm_dtype=gemm_dtype, interpret=interpret)
            h = agg[:n] + h @ kern["root"] + kern["bias"]
        return linear(params["fc_out"], h)

    def apply_fused_ad(self, params: dict, x: jnp.ndarray,
                       edge_attr_blocked: jnp.ndarray, fused_aux: dict,
                       s_matrix: jnp.ndarray, *, rows_blk: int, blk: int,
                       gemm_dtype: str = "bfloat16",
                       interpret: bool = False) -> jnp.ndarray:
        """Differentiable fused forward (training path, custom VJP)."""
        assert self.fused_ok, "fused path requires kernel_type='dense'"
        from ..ops.fused_conv import fused_edge_conv_ad
        from ..ops.message_passing import apply_edge_mlp_hidden

        kern = params["kernel"]
        n = x.shape[0]
        h = linear(params["fc1"], x)
        h_e = apply_edge_mlp_hidden(kern["edge_mlp"], edge_attr_blocked,
                                    _leaky_relu)
        w3, b3 = kern["edge_mlp"][-1]["w"], kern["edge_mlp"][-1]["b"]
        for _ in range(self.num_layers):
            agg = fused_edge_conv_ad(h_e, linear(kern["linear"], h), w3, b3,
                                     s_matrix, fused_aux, self.width,
                                     self.width, rows_blk, blk, None,
                                     gemm_dtype, interpret)
            h = agg[:n] + h @ kern["root"] + kern["bias"]
        return linear(params["fc_out"], h)

    @staticmethod
    def prepare_fused(senders, receivers, edge_attr, n_nodes,
                      edge_mask=None, rows_blk: int = 64,
                      quantum: int = 256, compact: bool = False):
        from ..ops.fused_conv import prepare_fused

        return prepare_fused(senders, receivers, edge_attr, n_nodes,
                             edge_mask, rows_blk, quantum, compact=compact)

    @staticmethod
    def prepare_fused_train(senders, receivers, edge_attr, n_nodes,
                            edge_mask=None, rows_blk: int = 64,
                            quantum: int = 256, compact: bool = False):
        from ..ops.fused_conv import prepare_fused_train

        return prepare_fused_train(senders, receivers, edge_attr, n_nodes,
                                   edge_mask, rows_blk, quantum,
                                   compact=compact)

    def import_pth(self, state_dict) -> dict:
        """Params from a reference checkpoint.

        Key layout per logs/models/collection_duct_teecnet/partition_0.pth:
        fc1.*, kernel.{root_param,bias,linear.*,operator_kernel.layers.{0,2,4,6}.*},
        fc_out.*.
        """
        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}
        got = sd["kernel.root_param"].shape[0]
        if got != self.width:
            raise ValueError(
                f"checkpoint width {got} does not match model config width {self.width}")
        if sd["fc1.weight"].shape != (self.width, self.in_channels):
            raise ValueError(
                f"checkpoint fc1 {sd['fc1.weight'].shape} does not match "
                f"(width={self.width}, in_channels={self.in_channels})")
        return {
            "fc1": from_torch_linear(sd, "fc1"),
            "kernel": {
                "linear": from_torch_linear(sd, "kernel.linear"),
                "edge_mlp": [
                    from_torch_linear(sd, f"kernel.operator_kernel.layers.{i}")
                    for i in (0, 2, 4, 6)
                ],
                "root": jnp.asarray(sd["kernel.root_param"], jnp.float32),
                "bias": jnp.asarray(sd["kernel.bias"], jnp.float32),
            },
            "fc_out": from_torch_linear(sd, "fc_out"),
        }

    def export_pth(self, params: dict) -> dict:
        import numpy as np

        out: dict = {}
        to_torch_linear(params["fc1"], "fc1", out)
        to_torch_linear(params["kernel"]["linear"], "kernel.linear", out)
        for i, li in zip((0, 2, 4, 6), range(4)):
            to_torch_linear(params["kernel"]["edge_mlp"][li],
                            f"kernel.operator_kernel.layers.{i}", out)
        out["kernel.root_param"] = np.asarray(params["kernel"]["root"])
        out["kernel.bias"] = np.asarray(params["kernel"]["bias"])
        to_torch_linear(params["fc_out"], "fc_out", out)
        return out
