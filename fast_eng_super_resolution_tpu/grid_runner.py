"""CLI train/pred drivers for the grid model family (FNO2d, DeepONet).

The reference CLI nominally dispatches 'fno'/'deeponet' through the same entry
scripts (/root/reference/utils.py:29-43) but routes every model through the
graph scheduler, which cannot feed dense [B, H, W, C] tensors — its FNO/JHTDB
training actually lived out-of-repo (SURVEY §4).  Per SURVEY §7 ("build the
*intended* behavior"), this module is the in-framework path:
``run_DS_3D.py --model=fno --dataset=advected_grid --mode={train,pred}``
trains/evaluates through ``parallel.grid_train.GridTrainer`` with the same
train-config schema (epochs/batch_size/lr/step_size/gamma, StepLR —
configs/train_config/fno.yaml mirrors the reference's shipped values) and the
same checkpoint layout (``logs/models/collection_{exp}/partition_0.npz``).

Outputs: ``logs/vtk/{exp}/pred_{idx}.npz`` holding pred/ref/input fields (grid
data has no unstructured-mesh VTU analog in the reference either), plus the
held-out MSE-improvement factor over the upsampled-coarse baseline — the
quality number BASELINE.md records (FNO 2.95x, DeepONet 1.79x at 96 training
snapshots).
"""

from __future__ import annotations

import os

import numpy as np

from .utils.logging import MetricLogger, span


def _collection_path(log_dir: str, exp_name: str) -> str:
    d = os.path.join(log_dir, "models", f"collection_{exp_name}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "partition_0.npz")


def _stack(dataset, idxs) -> tuple[np.ndarray, np.ndarray]:
    x = np.stack([dataset[i]["x"] for i in idxs])
    y = np.stack([dataset[i]["y"] for i in idxs])
    return x, y


def _split(dataset, exp_config: dict) -> tuple[list[int], list[int]]:
    """Train/val sample split.

    ``train_samples: K`` in the exp config takes the first K snapshots for
    training and holds out the rest (the snapshot-level analog of the graph
    path's ``train_meshes`` key); without it, the reference's 80/20
    random_split (scheduler_gnn.py:100-103).
    """
    n = len(dataset)
    k = exp_config.get("train_samples")
    if k is not None:
        k = int(k)
        if not 0 < k < n:
            raise ValueError(f"train_samples={k} must be in (0, {n})")
        return list(range(k)), list(range(k, n))
    from .parallel.train import train_val_split

    tr, va = train_val_split(n)
    return list(tr), list(va)


def train_grid(exp_name: str, model, dataset, train_config: dict,
               exp_config: dict, log_dir: str = "logs") -> dict:
    """Train a grid model; best-val checkpoint under the collection layout."""
    import jax

    from .core import checkpoint as ckpt
    from .parallel.grid_train import GridTrainer
    from .parallel.train import StepLR

    train_idx, val_idx = _split(dataset, exp_config)
    x_tr, y_tr = _stack(dataset, train_idx)
    x_va, y_va = _stack(dataset, val_idx)
    target_c = int(y_tr.shape[-1])

    lr = float(train_config["lr"])
    epochs = int(train_config["epochs"])
    batch_size = min(int(train_config.get("batch_size", len(train_idx))),
                     len(train_idx))
    sched = StepLR(lr, int(train_config.get("step_size", 30)),
                   float(train_config.get("gamma", 0.1)))
    val_interval = int(train_config.get("val_interval", 10))

    trainer = GridTrainer(model, lr=lr, out_channels=target_c)
    params, opt_state = trainer.init(
        jax.random.PRNGKey(int(exp_config.get("seed", 0))), x_tr)
    import jax.numpy as jnp

    x_tr, y_tr = jnp.asarray(x_tr), jnp.asarray(y_tr)  # upload once

    # Multi-chip DP (round 3): when a device mesh is available and the batch
    # divides it, run the stacked-epoch scan with the per-step batch axis
    # sharded — params replicate, GSPMD emits one grad psum per step (the
    # grid-family analog of the graph path's sharded training;
    # scheduler_gnn.py:349-386).  Grid snapshots are small, so the per-epoch
    # host gather + re-place costs nothing measurable.
    ndev = jax.device_count()
    use_dp = (ndev > 1 and batch_size % ndev == 0
              and os.environ.get("FESR_GRID_DP", "1") != "0")
    if use_dp:
        from .parallel.grid_train import shard_grid_epoch
        from .parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    logger = MetricLogger(exp_name, log_dir, config=dict(train_config))
    rng = np.random.default_rng(0)
    best_val = float("inf")
    path = _collection_path(log_dir, exp_name)
    n_tr = len(train_idx)
    n_batches = max(1, n_tr // batch_size)
    for epoch in range(epochs):
        # scanned epoch: one device dispatch (tunnel-latency immunity); the
        # permutation is truncated to full batches — with shuffling every
        # sample is still seen with equal probability across epochs
        order = rng.permutation(n_tr)[: n_batches * batch_size]
        order = order.reshape(n_batches, batch_size)
        if use_dp:
            xb, yb = shard_grid_epoch(x_tr[order], y_tr[order], mesh)
            params, opt_state, losses = trainer.epoch_stacked(
                params, opt_state, xb, yb)
        else:
            params, opt_state, losses = trainer.epoch(
                params, opt_state, x_tr, y_tr, order)
        opt_state = trainer.set_lr(opt_state, sched(epoch + 1))
        if epoch % val_interval == 0 or epoch == epochs - 1:
            # the train-loss host fetch lives INSIDE the val branch: a
            # per-epoch float() would serialize the async epoch pipeline
            # and pay one tunnel fetch per epoch on relay backends
            train_loss = float(np.mean(np.asarray(losses)))
            val_loss = trainer.evaluate(params, x_va, y_va)
            # log the LR this epoch actually trained under, not the one just
            # scheduled for the next (the graph path does the same)
            logger.log({"train_loss": train_loss, "val_loss": val_loss,
                        "lr": sched(epoch)}, step=epoch)
            if val_loss < best_val:
                best_val = val_loss
                ckpt.save_params(path, params)
            print(f"Epoch {epoch}: train {train_loss:.6f} val {val_loss:.6f}")
    if not np.isfinite(best_val):
        # diverged run (every val loss NaN/inf): persist last-epoch params
        # like the graph scheduler does, so pred_grid finds a checkpoint
        # instead of FileNotFoundError
        ckpt.save_params(path, params)
    logger.finish()
    print(f"Best val loss {best_val:.6f} -> {path}")
    return {"best_val": best_val, "ckpt": path}


def pred_grid(idxs, exp_name: str, model, dataset, exp_config: dict,
              log_dir: str = "logs") -> list[str]:
    """Predict held-out snapshots; writes pred_{idx}.npz + improvement print."""
    from .core import checkpoint as ckpt
    from .parallel.grid_train import GridTrainer

    params = ckpt.load_params(_collection_path(log_dir, exp_name))
    trainer = GridTrainer(model, lr=0.0)
    out_dir = os.path.join(log_dir, "vtk", exp_name)
    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    for idx in idxs:
        s = dataset[idx]
        x, y = s["x"][None], s["y"][None]
        with span("Prediction"):
            pred = np.asarray(trainer.predict(params, x))
        # inputs may carry auxiliary channels after the field channels
        # (e.g. the Darcy coefficient field); the improvement baseline is
        # the interpolated field alone, like every mesh dataset's
        mse_base = float(((x[..., : y.shape[-1]] - y) ** 2).mean())
        mse_pred = float(((pred - y) ** 2).mean())
        factor = mse_base / max(mse_pred, 1e-30)
        out_path = os.path.join(out_dir, f"pred_{idx}.npz")
        np.savez(out_path, pred=pred[0], ref=y[0], input=x[0])
        print(f"pred_{idx}: baseline MSE {mse_base:.6e}, model MSE "
              f"{mse_pred:.6e}, improvement {factor:.2f}x")
        print("Prediction done!")
        outputs.append(out_path)
    return outputs
