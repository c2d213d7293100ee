"""DeepONet — branch/trunk operator network.

Parity target: /root/reference/models/model.py:213-256.  Branch and trunk are
3-layer ReLU MLPs; the output is their elementwise product evaluated on a unit
meshgrid trunk input (model.py:235-256).  Factory quirk preserved at the
registry level: ``init_model('deeponet', ...)`` requires ``trunk_size``
(utils.py:37) which the shipped configs omit — the registry raises the same
kind of error the reference would.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class DeepONet:
    branch_input_dim: int
    trunk_input_dim: int
    hidden_dim: int
    output_dim: int

    def init(self, key) -> dict:
        k1, k2 = jax.random.split(key)
        h, o = self.hidden_dim, self.output_dim
        return {
            "branch": mlp_init(k1, [self.branch_input_dim, h, h, o]),
            "trunk": mlp_init(k2, [self.trunk_input_dim, h, h, o]),
        }

    def apply(self, params: dict, branch_input: jnp.ndarray,
              boundary_info=None) -> jnp.ndarray:
        """branch_input: [B, n, n, C]; returns [B, n, n, output_dim]."""
        b, n = branch_input.shape[0], branch_input.shape[1]
        # get_grid (model.py:235-243): unit meshgrid, 'ij' indexing
        r = jnp.linspace(0, 1, n)
        gx, gy = jnp.meshgrid(r, r, indexing="ij")
        grid = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1)[None], (b, n, n, 2))
        branch_out = mlp_apply(params["branch"], branch_input, jax.nn.relu)
        trunk_out = mlp_apply(params["trunk"], grid, jax.nn.relu)
        return branch_out * trunk_out

    def import_pth(self, state_dict) -> dict:
        """Params from a torch DeepONet state_dict (model.py:213-233 layout:
        branch.{0,2,4}.*, trunk.{0,2,4}.*)."""
        from .common import from_torch_linear

        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}
        return {
            "branch": [from_torch_linear(sd, f"branch.{i}") for i in (0, 2, 4)],
            "trunk": [from_torch_linear(sd, f"trunk.{i}") for i in (0, 2, 4)],
        }


@dataclasses.dataclass(frozen=True)
class AdaptDeepONet:
    """adaptDeepONet wrapper (model.py:185-210): DeepONet on grid patches with
    the output reshaped back to [B, n, n, 1] (squeeze/transpose dance kept to
    its effective shape semantics)."""

    branch_size: int
    trunk_size: int
    hidden_dim: int
    num_outputs: int

    def _inner(self) -> DeepONet:
        return DeepONet(self.branch_size, self.trunk_size, self.hidden_dim,
                        self.num_outputs)

    def init(self, key) -> dict:
        return self._inner().init(key)

    def apply(self, params: dict, x: jnp.ndarray, boundary=None) -> jnp.ndarray:
        out = self._inner().apply(params, x, boundary)
        return jnp.sum(out, axis=-1, keepdims=True)  # reduce to [B, n, n, 1]
