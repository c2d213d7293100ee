"""Held-out generalization benchmark across the synthetic physics axes.

Reproduces the BASELINE.md quality-scaling rows: train a KernelNN on the
first ``--train-cases`` cases of a SyntheticDataset variant, then report the
full-mesh MSE-improvement factor over the interpolated-coarse input on every
held-out case.  The axes (``--axis``):

  aspect    — per-case aspect-ratio variation only (easiest; 15-17x)
  bend      — circular-arc bent ducts (velocity direction varies)
  obstacle  — one immersed cylinder per case (hardest; data-limited:
              8/16/32 train cases = 1.3x/2.7x/3.56x measured round 3)
  obsbend   — obstacle + bend composed (3.66x at 32)
  multiobs  — two cylinders per case in disjoint axial segments (3.64x at 32)

Run:  python benchmarks/quality_axes.py --axis obstacle --train-cases 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_HERE = (os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals()
         else os.getcwd())
sys.path.insert(0, os.path.dirname(_HERE) if _HERE.endswith("benchmarks") else _HERE)

AXES = {
    "aspect": dict(),
    "bend": dict(bend=True),
    "obstacle": dict(obstacle=True),
    "obsbend": dict(obstacle=True, bend=True),
    "multiobs": dict(obstacle=2),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--axis", choices=sorted(AXES), default="obstacle")
    parser.add_argument("--train-cases", type=int, default=32)
    parser.add_argument("--held-out", type=int, default=8)
    parser.add_argument("--width", type=int, default=48)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--root", default=None)
    parser.add_argument("--kernel-rank", type=int, default=None,
                        help="factorized rank-r edge kernels (beyond-parity)")
    args = parser.parse_args()

    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset
    from fast_eng_super_resolution_tpu.data.reconstruct import overlap_average
    from fast_eng_super_resolution_tpu.data.subsets import SubGraphDataset
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.sched.scheduler import PartitionScheduler

    if args.held_out < 1:
        parser.error("--held-out must be >= 1 (the headline metric is the "
                     "held-out mean)")
    n_cases = args.train_cases + args.held_out
    root = args.root or f"/tmp/fesr_quality_{args.axis}_{n_cases}"
    # the synthetic_full recipe (BASELINE.md quality rows)
    cfg = dict(epochs=args.epochs, batch_size=16, lr=2e-3, step_size=100,
               gamma=0.5, log_interval=100, val_interval=10)
    ds = SyntheticDataset(root=root, partition=True, sub_size=4,
                          domain_size=0.03, num_cases=n_cases, aspect_seed=5,
                          **AXES[args.axis])
    model = KernelNN(width=args.width, ker_width=args.width, depth=args.depth,
                     ker_in=1, in_width=4, out_width=4,
                     kernel_rank=args.kernel_rank)
    flat = np.concatenate([ds.mesh_subdomain_indices(m)
                           for m in range(args.train_cases)])
    t0 = time.time()
    tag = f"quality_{args.axis}" + (f"_r{args.kernel_rank}" if args.kernel_rank else "")
    sched = PartitionScheduler(tag, 1,
                               SubGraphDataset(ds, flat), model, train=True,
                               log_dir=f"/tmp/fesr_{tag}_logs")
    sched.train(cfg, seed=0)
    print(f"train wall {time.time() - t0:.0f}s", flush=True)

    imps = []
    for m in range(args.train_cases, n_cases):
        x = ds.get_one_full_sample(m)
        pred, ref, _, _ = sched.predict(x)
        full = ds.full_mesh(m)
        gids = [d["global_node_ids"] for d in x]
        n = len(full["points"])
        p = overlap_average([np.asarray(v) for v in pred], gids, n)
        r = overlap_average([np.asarray(v) for v in ref], gids, n)
        imp = (float(((full["x"] - r) ** 2).mean())
               / max(float(((p - r) ** 2).mean()), 1e-30))
        imps.append(imp)
        print(f"mesh {m} (held out): improvement {imp:.2f}x", flush=True)
    print(f"MEAN improvement over {len(imps)} held-out: {np.mean(imps):.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
