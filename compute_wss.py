"""Wall-shear-stress post-pass CLI (reference surface, compute_wss.py:136-183).

Reads a predicted VTU (default ``logs/vtk/ansys_neuralop/pred_0.vtu``),
computes WSS for the predicted / interpolated / reference velocity fields with
mu=1e-3 Pa.s, and writes ``wall_shear_stress_results_*.vtp``.
"""

import argparse

import numpy as np

from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges
from fast_eng_super_resolution_tpu.data.vtu import read_vtu
from fast_eng_super_resolution_tpu.physics.wss import compute_wall_shear_stress

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default="logs/vtk/ansys_neuralop/pred_0.vtu")
    parser.add_argument("--viscosity", type=float, default=1.0e-3)
    args = parser.parse_args()

    print(f"Loading VTK grid from: {args.input}")
    grid = read_vtu(args.input)
    print("\nAvailable point data arrays:")
    for name, arr in grid["point_data"].items():
        ncomp = 1 if arr.ndim == 1 else arr.shape[1]
        print(f"  - {name}: {ncomp} components, {len(arr)} tuples")

    cells = np.asarray(grid["cells"])
    edges = cells_to_edges(cells)
    for field, tag in (("velocity", "pred"), ("interpolated_velocity", "interpolated"),
                       ("ref_velocity", "reference")):
        if field not in grid["point_data"]:
            print(f"skipping {field}: not present")
            continue
        compute_wall_shear_stress(
            grid["points"], cells, edges,
            np.asarray(grid["point_data"][field], np.float32),
            dynamic_viscosity=args.viscosity,
            output_filename=f"wall_shear_stress_results_{tag}.vtp")

    print("\nWall shear stress computation completed successfully!")
