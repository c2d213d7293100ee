"""Fused Pallas kernel for edge-conditioned message computation.

The hot op (SURVEY §3.3): per-edge  W_e = h_e @ W3 + b3  (K x w^2 GEMM) then
m_e = x_src(e) @ W_e.reshape(w, w).  The XLA path materializes the per-edge
matrices ([E, w^2] — w=48 -> 9 KB/edge) to HBM; on a v5e that HBM round trip,
not FLOPs, bounds throughput (measured: ~94k nodes/s/chip on the unfused
path).  This kernel tiles edges into VMEM-resident blocks, computes the
block's W on the MXU, contracts with the pre-gathered sender features, and
writes only the [E, w] messages — the w^2 intermediate never leaves VMEM.

Scatter (segment-sum by receiver) stays in XLA: messages are only [E, w]
(~192 B/edge), which is cheap traffic, and XLA's sorted-segment-sum is fine.

Block sizes are aligned to the MXU/VPU tiling (multiples of 8x128 for f32);
inputs are padded by the wrapper.  Exact same math as
ops/message_passing.edge_conditioned_conv (parity-tested in
tests/test_pallas.py, including interpreter mode).

STATUS: opt-in via mode='pallas'.  On the current axon remote-compile
toolchain the reduction-grid form stalls Mosaic (earlier single-block forms
either OOM'd scoped VMEM at useful block sizes or lowered but showed no win
over the 'edge' XLA path, 133 vs 126 ms/fwd) — the production default is the
merged-layout 'edge' mode (ops/message_passing.resolve_mode).  Revisit when
the toolchain catches up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_e",))
def fused_edge_messages(h: jnp.ndarray, x_src: jnp.ndarray, w3: jnp.ndarray,
                        b3: jnp.ndarray, block_e: int = 256) -> jnp.ndarray:
    """Messages m_e = x_src[e] @ (h[e] @ W3 + b3).reshape(C_in, C_out).

    Args:
      h: [E, K] edge-MLP hidden features (post-activation).
      x_src: [E, C_in] gathered sender features.
      w3: [K, C_in * C_out] final edge-MLP layer weight.
      b3: [C_in * C_out] final edge-MLP bias.
      block_e: edges per kernel invocation (VMEM budget:
        block_e * C_in * C_out * 4B for the W tile).

    Returns: [E, C_out].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, k = h.shape
    c_in = x_src.shape[1]
    c2 = w3.shape[1]
    c_out = c2 // c_in

    e_pad = _round_up(max(e, 8), block_e)
    if e_pad != e:
        h = jnp.pad(h, ((0, e_pad - e), (0, 0)))
        x_src = jnp.pad(x_src, ((0, e_pad - e), (0, 0)))

    # Reduction grid over the contraction axis a (the sender-feature index):
    # step (i, a) computes  (h_blk @ W3[a] + b3[a]) * x_a_blk  and accumulates
    # into the output block, which stays VMEM-resident across the inner grid
    # dimension.  Only a [K, c_out] weight slice is live per step, so VMEM
    # stays small at any block_e (the full [blk, c_in*c_out] per-edge-matrix
    # tile OOMs scoped vmem at useful block sizes).  All a-selection happens
    # through BlockSpec index maps on a-major layouts — in-kernel dynamic
    # lane slicing stalls the Mosaic compiler on this toolchain.
    w3_a = jnp.transpose(w3.reshape(k, c_in, c_out), (1, 0, 2))  # [c_in, K, c_out]
    b3_a = b3.reshape(1, c_in, c_out).transpose(1, 0, 2)          # [c_in, 1, c_out]
    x_a = x_src.T.reshape(c_in, e_pad, 1)                         # [c_in, blk, 1]

    def kernel(h_ref, x_ref, w3_ref, b3_ref, out_ref):
        a = pl.program_id(1)
        part = jnp.dot(h_ref[:], w3_ref[0], preferred_element_type=jnp.float32)
        part = (part + b3_ref[0]) * x_ref[0]             # [blk,1] broadcast

        @pl.when(a == 0)
        def _():
            out_ref[:] = part

        @pl.when(a != 0)
        def _():
            out_ref[:] = out_ref[:] + part

    grid = (e_pad // block_e, c_in)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, k), lambda i, a: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_e, 1), lambda i, a: (a, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, c_out), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_out), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, c_out), lambda i, a: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e_pad, c_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * k * c2 + 2 * e_pad * c_in * c_out,
            bytes_accessed=4 * (e_pad * (k + c_in + c_out) + k * c2),
            transcendentals=0,
        ),
    )(h, x_a, w3_a, b3_a)
    return out[:e]


def pallas_available() -> bool:
    """True when the default backend can run Mosaic TPU kernels ('axon' is
    the relay TPU backend — same chip, same Mosaic support)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
