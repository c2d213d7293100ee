"""Power-series (Taylor-expansion) edge kernels.

Parity target: /root/reference/models/model.py:318-362 (PowerSeriesConv,
PowerSeriesKernel).  In the reference this kernel family is defined but
disconnected from TEECNet (model.py:402, 427 are commented out); the framework
implements it as a usable alternative edge kernel so the TEECNet family is
complete.  BatchNorm between layers (model.py:354, 360) is replaced by a
maskable layer-norm-free variant: we keep the reference's *eval-mode* BN
semantics (identity with learned affine), which is what inference parity
requires; training uses the affine parameters directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _ps_conv_init(key, c_in: int, c_out: int, num_powers: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    # xavier_uniform on conv weight, U(-1,1) on root_param (model.py:327-331);
    # the bias keeps torch Linear's default U(-1/sqrt(fan_in)) — the
    # reference's reset_parameters re-inits only the weight
    bound = (6.0 / (c_in + c_out)) ** 0.5
    b_bound = 1.0 / (c_in ** 0.5)
    return {
        "w": jax.random.uniform(k1, (c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k3, (c_out,), jnp.float32, -b_bound, b_bound),
        "root_param": jax.random.uniform(k2, (num_powers,), jnp.float32, -1.0, 1.0),
    }


def _ps_conv_apply(p: dict, x: jnp.ndarray, num_powers: int) -> jnp.ndarray:
    """PowerSeriesConv.forward (model.py:333-342)."""
    xc = x @ p["w"] + p["b"]
    out = p["root_param"][0] * xc
    for i in range(1, num_powers):
        out = out + p["root_param"][i] * jnp.tanh(jnp.power(xc, i + 1))
    return out


@dataclasses.dataclass(frozen=True)
class PowerSeriesKernel:
    """Edge-attr -> hidden feature stack (model.py:345-362)."""

    in_channel: int
    out_channel: int
    num_layers: int
    num_powers: int

    def init(self, key) -> dict:
        ks = jax.random.split(key, self.num_layers + 2)
        return {
            "conv0": _ps_conv_init(ks[0], self.in_channel, 16, self.num_powers),
            "convs": [_ps_conv_init(ks[1 + i], 16, 16, self.num_powers)
                      for i in range(self.num_layers)],
            "conv_out": _ps_conv_init(ks[-1], 16, self.out_channel, self.num_powers),
            "norm_scale": jnp.ones((16,), jnp.float32),
            "norm_bias": jnp.zeros((16,), jnp.float32),
        }

    def apply(self, params: dict, edge_attr: jnp.ndarray) -> jnp.ndarray:
        h = _ps_conv_apply(params["conv0"], edge_attr, self.num_powers)
        for p in params["convs"]:
            h = _ps_conv_apply(p, h, self.num_powers)
            h = h * params["norm_scale"] + params["norm_bias"]
        return _ps_conv_apply(params["conv_out"], h, self.num_powers)
