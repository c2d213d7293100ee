"""Shared building blocks for the model zoo (pure-pytree functional modules).

Models are dicts of arrays + pure ``apply`` functions, so expert stacking
(vmap over a leading expert axis, see parallel/dispatch.py) and pjit come for
free — unlike the reference's nn.Module object graph.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def linear_init(key, c_in: int, c_out: int, scale: float | None = None) -> dict:
    """torch.nn.Linear-style init: U(-1/sqrt(c_in), 1/sqrt(c_in)) for w and b."""
    k1, k2 = jax.random.split(key)
    bound = scale if scale is not None else 1.0 / math.sqrt(c_in)
    return {
        "w": jax.random.uniform(k1, (c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (c_out,), jnp.float32, -bound, bound),
    }


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def mlp_init(key, sizes: list[int]) -> list[dict]:
    keys = jax.random.split(key, len(sizes) - 1)
    return [linear_init(k, a, b) for k, a, b in zip(keys, sizes[:-1], sizes[1:])]


def mlp_apply(params: list[dict], x: jnp.ndarray, activation, final_activation=None) -> jnp.ndarray:
    for p in params[:-1]:
        x = activation(linear(p, x))
    x = linear(params[-1], x)
    if final_activation is not None:
        x = final_activation(x)
    return x


def from_torch_linear(state_dict, prefix: str) -> dict:
    """Converts a torch Linear ('{prefix}.weight' [out,in]) to {'w': [in,out], 'b'}."""
    w = np.asarray(state_dict[f"{prefix}.weight"], dtype=np.float32)
    b = np.asarray(state_dict[f"{prefix}.bias"], dtype=np.float32)
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}


def to_torch_linear(params: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["w"]).T
    out[f"{prefix}.bias"] = np.asarray(params["b"])


def pyg_uniform_init(key, size: int, shape) -> jnp.ndarray:
    """torch_geometric.nn.inits.uniform: U(-1/sqrt(size), 1/sqrt(size))."""
    bound = 1.0 / math.sqrt(size)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
