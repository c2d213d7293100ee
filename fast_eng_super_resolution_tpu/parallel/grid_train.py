"""Dense-tensor trainer for the grid model family (FNO2d, DeepONet).

The reference never shipped its FNO/JHTDB training loop (MatDataset is a
subset view only; training was out-of-repo, SURVEY §4).  This provides the
in-framework path: jit MSE step over [B, H, W, C] batches, optionally sharded
on a data-axis mesh like the graph trainer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.common import linear
from .train import Trainer


@dataclasses.dataclass
class GridTrainer:
    model: object
    lr: float
    out_channels: int | None = None  # project model output to target width

    def __post_init__(self):
        self.optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)

        def predict(params, x):
            out = self.model.apply(params["model"], x)
            if "proj" in params:
                out = linear(params["proj"], out)
            return out

        def loss_fn(params, x, y):
            return jnp.mean((predict(params, x) - y) ** 2)

        def step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def epoch(params, opt_state, x, y, order):
            """One scanned epoch: order [S, B] of sample indices.

            A single device dispatch regardless of batch count — essential on
            tunneled backends (~0.5 s/dispatch, CLAUDE.md) and cheap anywhere.
            """

            def body(carry, sel):
                params, opt_state = carry
                params, opt_state, loss = step(params, opt_state, x[sel], y[sel])
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), order)
            return params, opt_state, losses

        def epoch_stacked(params, opt_state, xb, yb):
            """Scanned epoch over pre-batched [S, B, ...] arrays.

            The multi-chip form of ``epoch``: no per-step index gather, so
            sharding the B axis on a data mesh (``shard_grid_epoch``) keeps
            every step's batch device-local — GSPMD inserts exactly one grad
            psum per step, the DDP pattern (scheduler_gnn.py:349-386) with
            zero collective code."""

            def body(carry, xy):
                params, opt_state = carry
                params, opt_state, loss = step(params, opt_state, *xy)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (xb, yb))
            return params, opt_state, losses

        self._step = jax.jit(step)
        self._epoch = jax.jit(epoch)
        self._epoch_stacked = jax.jit(epoch_stacked)
        self._loss = jax.jit(loss_fn)
        self._predict = jax.jit(predict)

    def init(self, key, sample_x: np.ndarray):
        k1, k2 = jax.random.split(key)
        params = {"model": self.model.init(k1)}
        if self.out_channels is not None:
            out_dim = self._probe_out(params["model"], sample_x).shape[-1]
            if out_dim != self.out_channels:
                from ..models.common import linear_init

                params["proj"] = linear_init(k2, out_dim, self.out_channels)
        return params, self.optimizer.init(params)

    def _probe_out(self, model_params, sample_x):
        # eval_shape over a ShapeDtypeStruct: no device execution AND no
        # input upload — an eager probe costs hundreds of tunnel round-trips
        # on relay backends, and even jnp.asarray(sample) pays one (~0.5
        # s/op, CLAUDE.md)
        probe = jax.ShapeDtypeStruct(sample_x[:1].shape, jnp.float32)
        return jax.eval_shape(self.model.apply, model_params, probe)

    def step(self, params, opt_state, x, y):
        return self._step(params, opt_state, x, y)

    def epoch(self, params, opt_state, x, y, order):
        """order: [n_batches, batch_size] int32 sample indices."""
        return self._epoch(params, opt_state, x, y, jnp.asarray(order, jnp.int32))

    def epoch_stacked(self, params, opt_state, xb, yb):
        """xb/yb: [n_batches, batch_size, ...]; see epoch_stacked above.

        For multi-chip DP: replicate params on the mesh and shard xb/yb with
        ``shard_grid_epoch`` first."""
        return self._epoch_stacked(params, opt_state, xb, yb)

    def evaluate(self, params, x, y) -> float:
        return float(self._loss(params, x, y))

    def predict(self, params, x):
        return self._predict(params, x)

    # one LR-injection convention for both trainers (parallel/train.py)
    set_lr = staticmethod(Trainer.set_lr)


def shard_grid_epoch(xb, yb, mesh, axis: str = "data"):
    """Shards [S, B, ...] epoch arrays on the per-step batch axis (axis 1).

    Pair with ``parallel.mesh.replicate`` for params/opt state; B must be a
    multiple of the mesh's data-axis size (pad with repeated samples if not —
    the MSE mean just reweights negligibly for a converged shuffle)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, axis))
    return jax.device_put(xb, sh), jax.device_put(yb, sh)
