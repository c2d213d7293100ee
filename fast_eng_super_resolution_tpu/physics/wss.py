"""Wall shear stress post-pass — LSQ gradients + surface tensor math on device.

Replaces compute_wss.py (/root/reference/compute_wss.py:5-120): vtkGradientFilter
-> per-node least-squares velocity gradients (the same math family as the
reference's own compute_weights, SURVEY §2.3); vtkDataSetSurfaceFilter +
vtkPolyDataNormals -> host boundary-face extraction with area-weighted,
outward-oriented point normals; the per-point Python stress loop (:82-98) ->
one vectorized einsum:

    tau = mu * (grad_u + grad_u^T) . n;  tau_wall = tau - (tau.n) n
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .divergence import build_node_neighbors, compute_gradient_weights

_TET_FACES = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])


def extract_boundary_faces(points: np.ndarray, cells: np.ndarray):
    """Boundary triangles of a tet mesh, outward-oriented (host-side).

    Equivalent of vtkDataSetSurfaceFilter (compute_wss.py:45-48): faces used by
    exactly one cell; orientation fixed so normals point away from the owning
    cell's centroid (vtkPolyDataNormals consistency, :53-58).
    """
    cells = np.asarray(cells)
    if cells.ndim != 2 or cells.shape[1] != 4:
        # hex/wedge/mixed meshes would silently be sliced as fake tets and
        # produce a plausible-looking but wrong boundary surface
        raise ValueError(
            f"extract_boundary_faces expects tetrahedral [C, 4] cells, got "
            f"shape {cells.shape}; convert mixed-element meshes to tets "
            "first (the reference's vtkDataSetSurfaceFilter handled all "
            "cell types)")
    f = cells[:, _TET_FACES].reshape(-1, 3)
    owner = np.repeat(np.arange(len(cells)), 4)
    key = np.sort(f, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = counts[inv] == 1
    faces, owners = f[boundary], owner[boundary]

    tri = points[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centroids = tri.mean(axis=1)
    cell_cent = points[cells[owners]].mean(axis=1)
    flip = np.einsum("fd,fd->f", normals, centroids - cell_cent) < 0
    faces[flip] = faces[flip][:, ::-1]
    return faces


def point_normals(points: np.ndarray, faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Area-weighted point normals on the boundary surface.

    Returns (surface_point_ids, unit normals [S, 3]).
    """
    tri = points[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # area-weighted
    acc = np.zeros_like(points)
    for corner in range(3):
        np.add.at(acc, faces[:, corner], fn)
    surf_ids = np.unique(faces)
    n = acc[surf_ids]
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    return surf_ids, n


@jax.jit
def velocity_gradients(points: jnp.ndarray, velocity: jnp.ndarray,
                       nbr: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-node velocity gradient tensors [N, 3, 3]: grad[i][c, d] = d u_d / d x_c.

    Uses the TRUE-gradient LSQ weights (exact on linear fields) — the
    on-device stand-in for vtkGradientFilter (compute_wss.py:36-42).
    """
    w = compute_gradient_weights(points, nbr, mask)     # [N, 3, K]
    dv = (velocity[nbr] - velocity[:, None, :]) * mask[..., None]  # [N, K, 3]
    return jnp.einsum("nck,nkd->ncd", w, dv)


@jax.jit
def wall_shear_stress_from_gradients(grads: jnp.ndarray, normals: jnp.ndarray,
                                     dynamic_viscosity: float = 1.0):
    """tau_wall and |tau_wall| (compute_wss.py:82-98, vectorized)."""
    stress = dynamic_viscosity * (grads + jnp.swapaxes(grads, 1, 2))
    tau_total = jnp.einsum("scd,sd->sc", stress, normals)
    tau_normal = jnp.einsum("sc,sc->s", tau_total, normals)
    tau_wall = tau_total - tau_normal[:, None] * normals
    return tau_wall, jnp.linalg.norm(tau_wall, axis=1)


def compute_wall_shear_stress(points: np.ndarray, cells: np.ndarray,
                              edges: np.ndarray, velocity: np.ndarray,
                              dynamic_viscosity: float = 1.0,
                              output_filename: str | None = None):
    """Full post-pass; optionally writes the .vtp surface like the reference
    (compute_wss.py:113-116).  Returns (surface_point_ids, tau_wall, |tau|)."""
    faces = extract_boundary_faces(points, cells)
    surf_ids, normals = point_normals(points, faces)
    nbr, mask = build_node_neighbors(edges, len(points))
    grads = velocity_gradients(jnp.asarray(points, jnp.float32),
                               jnp.asarray(velocity, jnp.float32),
                               jnp.asarray(nbr), jnp.asarray(mask))
    tau, mag = wall_shear_stress_from_gradients(grads[surf_ids],
                                                jnp.asarray(normals, jnp.float32),
                                                dynamic_viscosity)
    tau, mag = np.asarray(tau), np.asarray(mag)
    print(f"Wall shear stress computed. Max magnitude: {mag.max():.6f} Pa")
    print(f"Mean magnitude: {mag.mean():.6f} Pa")

    if output_filename is not None:
        from ..data.vtu import write_vtp_polydata

        local = np.full(len(points), -1, np.int64)
        local[surf_ids] = np.arange(len(surf_ids))
        write_vtp_polydata(
            output_filename.replace(".vtu", ".vtp"), points[surf_ids], local[faces],
            point_data={
                "Normals": normals.astype(np.float32),
                "WallShearStressVector": tau.astype(np.float32),
                "WallShearStressMagnitude": mag.astype(np.float32),
            })
        print(f"Results written to: {output_filename.replace('.vtu', '.vtp')}")
    return surf_ids, tau, mag
