"""Generate a literature-layout Darcy ``.mat`` file from the repo's FV solver.

Writes ``coeff``/``sol`` arrays (the FNO paper's piececonst_r421_N1024_*.mat
key layout) so the external-format lane (data/mat_dataset.py) can run at a
meaningful sample count without egress: canonical thresholded-GRF
permeability (tau=3, alpha=2, 12/3 contrast), harmonic-mean FV solve of
``-div(a grad u) = 1`` with Dirichlet walls (grid_dataset.solve_darcy).

Honesty note (BASELINE external-format rows): this is external-FORMAT, not
external-data — the fields are this repo's own solves saved in the
literature's layout.  A real download drops in via the same reader.

Run:  python benchmarks/make_darcy_mat.py [--n 64] [--samples 160]
          [--out data/darcy_mat/darcy_r64_N160.mat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_HERE = (os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals()
         else os.getcwd())
sys.path.insert(0, os.path.dirname(_HERE) if _HERE.endswith("benchmarks")
                else _HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--samples", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import scipy.io as sio

    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        _grf_threshold_coeff, solve_darcy)

    out = args.out or os.path.join(
        "data", "darcy_mat", f"darcy_r{args.n}_N{args.samples}.mat")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    coeff = np.empty((args.samples, args.n, args.n), np.float32)
    sol = np.empty((args.samples, args.n, args.n), np.float32)
    t0 = time.perf_counter()
    for i in range(args.samples):
        a = _grf_threshold_coeff(args.n, rng)
        coeff[i] = a
        sol[i] = solve_darcy(a)
    sio.savemat(out, {"coeff": coeff, "sol": sol})
    print(f"wrote {out}: {args.samples} fields at {args.n}x{args.n} "
          f"({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
