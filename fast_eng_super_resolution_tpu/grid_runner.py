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

import functools
import os

import numpy as np

from .utils.logging import MetricLogger, span


@functools.lru_cache(maxsize=8)
def _stepwise_jits(model, guided: bool, has_static: bool):
    """Cached jits for the stepwise rollout lane, keyed by the frozen model
    config — constructing jax.jit inside the request path costs two
    re-traces per call (the round-3 serving lesson; measured 8.9 s vs
    ~1.5 s warm for a 32-trajectory eval).  ``has_static`` appends the
    dataset's static input channels (e.g. the advected family's velocity)
    after the carried/guidance channels — same order as training samples.
    Static fields ride as jit ARGS, never closures (big closed-over arrays
    embed as HLO constants and 413 the remote compile — round-3 lesson)."""
    import jax
    import jax.numpy as jnp

    from .models.common import linear

    def apply_full(p, x):
        out = model.apply(p["model"], x)
        if "proj" in p:
            out = linear(p["proj"], out)
        return out

    def make_x(f, c, st):
        chans = [f[..., None]]
        if guided:
            chans.append(c[..., None])
        if has_static:
            chans.append(st)
        return chans[0] if len(chans) == 1 else jnp.concatenate(chans, -1)

    step = jax.jit(
        lambda p_, f_, c_, st_: apply_full(p_, make_x(f_, c_, st_))[..., 0])
    stack = jax.jit(lambda *fs: jnp.stack(fs))
    return step, stack


def _collection_path(log_dir: str, exp_name: str) -> str:
    d = os.path.join(log_dir, "models", f"collection_{exp_name}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "partition_0.npz")


def _task_spec(model, dataset, exp_config: dict) -> dict:
    """The serve-relevant training-task identity stamped into checkpoints
    (round-4 VERDICT #4): dataset class, grid resolution, coarse-input
    downsample factor, horizon/guidance flags, model class.  A checkpoint
    applied to a mismatched coarse grid silently produces worse-than-
    baseline output (measured 0.25x, BASELINE.md FNO3d zero-shot row) —
    these fields are what the serve-time guard compares."""
    spec = {"task": type(dataset).__name__, "model": type(model).__name__}
    for k in ("resolution", "downsample", "t_frames", "t_end", "guided"):
        v = exp_config.get(k, getattr(dataset, k, None))
        if v is None:
            continue
        if isinstance(v, bool):
            sv = str(v)
        elif isinstance(v, (int, float, np.integer, np.floating)):
            sv = format(float(v), "g")   # '2' == '2.0' across yaml styles
        else:
            sv = str(v)
        spec[f"task_{k}"] = sv
    return spec


def _check_task_spec(path: str, model, dataset, exp_config: dict) -> None:
    """Warn-or-refuse on checkpoint/request task mismatch.

    Modes (exp key ``task_spec_guard`` > env FESR_TASKSPEC_GUARD > 'error'):
    'error' refuses, 'warn' prints and proceeds (deliberate zero-shot
    resolution-transfer experiments), 'off' skips.  Legacy checkpoints
    without a stamp always pass.
    """
    from .core import checkpoint as ckpt

    mode = str(exp_config.get("task_spec_guard")
               or os.environ.get("FESR_TASKSPEC_GUARD", "error")).lower()
    if mode == "off":
        return
    meta = ckpt.load_meta(path)
    if not meta:
        return
    spec = _task_spec(model, dataset, exp_config)
    mism = {k: (meta[k], str(v)) for k, v in spec.items()
            if k in meta and meta[k] != str(v)}
    if not mism:
        return
    detail = ", ".join(f"{k}: trained={a!r} vs request={b!r}"
                       for k, (a, b) in sorted(mism.items()))
    msg = (f"checkpoint task-spec mismatch ({detail}). Serving a model "
           "against a different task/resolution than it was trained on is "
           "usually worse than the baseline (measured 0.25x on a "
           "mismatched coarse grid); set task_spec_guard: warn (or "
           "FESR_TASKSPEC_GUARD=warn) for deliberate transfer experiments.")
    if mode == "error":
        raise ValueError(msg)
    print(f"WARNING: {msg}")


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
    spec = _task_spec(model, dataset, exp_config)
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
                ckpt.save_params(path, params, meta=spec)
            print(f"Epoch {epoch}: train {train_loss:.6f} val {val_loss:.6f}")
    if not np.isfinite(best_val):
        # diverged run (every val loss NaN/inf): persist last-epoch params
        # like the graph scheduler does, so pred_grid finds a checkpoint
        # instead of FileNotFoundError
        ckpt.save_params(path, params, meta=spec)
    logger.finish()
    print(f"Best val loss {best_val:.6f} -> {path}")
    return {"best_val": best_val, "ckpt": path}


def pred_grid(idxs, exp_name: str, model, dataset, exp_config: dict,
              log_dir: str = "logs") -> list[str]:
    """Predict held-out snapshots; writes pred_{idx}.npz + improvement print."""
    from .core import checkpoint as ckpt
    from .parallel.grid_train import GridTrainer

    path = _collection_path(log_dir, exp_name)
    _check_task_spec(path, model, dataset, exp_config)
    params = ckpt.load_params(path)
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


def pred_rollout(idxs, exp_name: str, model, dataset, exp_config: dict,
                 log_dir: str = "logs") -> list[str]:
    """Autoregressive rollout evaluation over held-out trajectories.

    Rolls the trained one-step model from each trajectory's IC for T frames
    in ONE batched jit dispatch (lax.scan over time, batch over
    trajectories — tunnel-latency immune like the scanned training epochs),
    then scores the FINAL frame against the fine solve, with the upsampled
    coarse solve's final frame as the improvement baseline — the same
    baseline the one-shot 'ns_grid' lane uses, so the numbers compare
    directly.  Prints per-``idxs`` lines in the pred_grid format plus the
    all-held-out mean (the reporting discipline BASELINE.md records).
    """
    import jax
    import jax.numpy as jnp

    from .core import checkpoint as ckpt

    T = dataset.t_frames
    k_pairs = exp_config.get("train_samples")
    n_traj = dataset.trajectories.shape[0]
    if k_pairs is not None:
        # trajectory-major one-step pairs: a train_samples that is not a
        # whole number of trajectories would put some of the boundary
        # trajectory's pairs in the training split while this eval still
        # counted it held-out (silent train-frame leak into the mean)
        if int(k_pairs) % T != 0:
            raise ValueError(
                f"train_samples={k_pairs} must be a multiple of "
                f"t_frames={T} for rollout evaluation (whole held-out "
                f"trajectories)")
        eval_idx = list(range(int(k_pairs) // T, n_traj))
    else:
        eval_idx = sorted(int(i) for i in idxs)
    path = _collection_path(log_dir, exp_name)
    _check_task_spec(path, model, dataset, exp_config)
    params = ckpt.load_params(path)

    traj = dataset.trajectories[eval_idx]      # [B, T+1, *sp]
    coarse = dataset.coarse_frames[eval_idx]   # [B, T, *sp]
    guided = dataset.guided
    # static per-trajectory input channels (e.g. the advected family's
    # velocity [B, *sp, K]); None for self-contained dynamics like NS
    static = getattr(dataset, "static_fields", None)
    static_b = None if static is None else np.asarray(static[eval_idx])
    has_static = static_b is not None

    from .models.common import linear

    def apply_full(p, x):
        # checkpoints hold the GridTrainer param dict: the model params plus
        # an optional output-width projection head (grid_train.GridTrainer)
        out = model.apply(p["model"], x)
        if "proj" in p:
            out = linear(p["proj"], out)
        return out

    def make_x(f, c, st):
        # channel order matches the datasets' one-step training samples:
        # [carried frame, (coarse guidance), *static]
        chans = [f[..., None]]
        if guided:
            chans.append(c[..., None])
        if has_static:
            chans.append(st)
        return chans[0] if len(chans) == 1 else jnp.concatenate(chans, -1)

    def rollout(p, frame0, coarse_seq, st):
        # frame0 [B, *sp]; coarse_seq [T, B, *sp] (guidance; unused in
        # pure mode — the scan carries only the model's own prediction)
        def body(f, c):
            nxt = apply_full(p, make_x(f, c, st))[..., 0]
            return nxt, nxt

        _, frames = jax.lax.scan(body, frame0, coarse_seq)
        return frames  # [T, B, *sp]

    def rollout_stepwise(p, frame0, coarse_seq, st):
        # Device rollout for the relay TPU (round 4, VERDICT missing #1):
        # the T-step lax.scan over the guided stepper stalls the remote
        # Mosaic/XLA compile >10 min, so compose the horizon HOST-side from
        # ONE jitted step (the same program shape as a one-shot predict,
        # which compiles in the normal ~20-40 s).  The carried frame stays
        # device-resident; each step's coarse guidance frame is passed as a
        # HOST argument (uploads ride the dispatch; a device-side
        # dynamic_index_in_dim over the [T, B, n, n] stack also stalled the
        # remote compile — measured this round).  Cost: T dispatches
        # (~35-40 ms tunnel RTT each) + one stacked fetch.  coarse_seq is
        # the HOST numpy stack — uploading it first and fetching it back
        # would cost a full [T, B, n, n] tunnel round-trip for nothing
        # (round-4 advisor finding).
        step, stack = _stepwise_jits(model, guided, has_static)
        f, outs = frame0, []
        for t in range(coarse_seq.shape[0]):
            f = step(p, f, coarse_seq[t], st)
            outs.append(f)
        return stack(*outs)  # [T, B, *sp]

    impl = str(exp_config.get("rollout_impl", "auto"))
    if impl == "auto":
        # scan on CPU (single compile, fastest for eval); stepwise on
        # accelerators (the guided scan hangs the remote compiler; the pure
        # scan takes ~4 min where the one-step program takes seconds)
        impl = "stepwise" if jax.default_backend() in ("tpu", "axon") \
            else "scan"
    print(f"rollout_impl: {impl}")
    coarse_tmaj = np.moveaxis(coarse, 1, 0)    # host [T, B, *sp]
    # dummy scalar when the dataset has no static channels: a concrete
    # array arg keeps one jit signature across both cases
    st_arg = jnp.asarray(static_b) if has_static else jnp.zeros((), np.float32)
    if impl == "stepwise":
        run, coarse_arg = rollout_stepwise, coarse_tmaj
    else:
        run, coarse_arg = jax.jit(rollout), jnp.asarray(coarse_tmaj)
    with span("Prediction"):
        frames = np.asarray(run(params, jnp.asarray(traj[:, 0]), coarse_arg,
                                st_arg))
    frames = np.moveaxis(frames, 0, 1)         # [B, T, *sp]

    fine = traj[:, 1:]                          # [B, T, *sp]
    ax = tuple(range(1, fine.ndim - 1))         # spatial axes of one frame
    axf = tuple(range(2, fine.ndim))            # spatial axes under [B, T]
    mse_roll_final = ((frames[:, -1] - fine[:, -1]) ** 2).mean(ax)
    mse_base_final = ((coarse[:, -1] - fine[:, -1]) ** 2).mean(ax)
    mse_roll_all = ((frames - fine) ** 2).mean(axf)      # [B, T]
    mse_base_all = ((coarse - fine) ** 2).mean(axf)

    out_dir = os.path.join(log_dir, "vtk", exp_name)
    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    pos = {s: j for j, s in enumerate(eval_idx)}
    for idx in idxs:
        j = pos.get(int(idx))
        if j is None:
            print(f"pred_{idx}: not in the held-out range, skipped")
            continue
        factor = float(mse_base_final[j] / max(mse_roll_final[j], 1e-30))
        out_path = os.path.join(out_dir, f"pred_{idx}.npz")
        extra = {}
        if guided:
            # the guidance sequence the prediction actually consumed —
            # without it a guided artifact is not reproducible/inspectable
            extra["coarse"] = coarse[j]
        np.savez(out_path, pred=frames[j, -1][..., None],
                 ref=fine[j, -1][..., None], input=traj[j, 0][..., None],
                 rollout=frames[j], **extra)
        print(f"pred_{idx}: baseline MSE {float(mse_base_final[j]):.6e}, "
              f"model MSE {float(mse_roll_final[j]):.6e}, "
              f"improvement {factor:.2f}x")
        print("Prediction done!")
        outputs.append(out_path)

    mean_final = float((mse_base_final / np.maximum(mse_roll_final,
                                                    1e-30)).mean())
    mean_frames = float((mse_base_all / np.maximum(mse_roll_all,
                                                   1e-30)).mean())
    mode = "guided" if guided else "pure"
    print(f"rollout[{mode}] all-held-out mean over {len(eval_idx)} "
          f"trajectories: final-frame {mean_final:.2f}x, "
          f"per-frame {mean_frames:.2f}x")
    return outputs
