"""Physics layer tests: LSQ gradients, divergence projection, WSS."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def duct():
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges

    mesh = make_duct_mesh(10, 6, 6)
    edges = cells_to_edges(mesh.cells)
    return mesh, edges


def test_lsq_gradients_exact_for_linear_field(duct):
    """LSQ weights must reproduce the gradient of a linear field exactly
    (interior nodes, well-conditioned neighborhoods)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.physics.divergence import build_node_neighbors
    from fast_eng_super_resolution_tpu.physics.wss import velocity_gradients

    mesh, edges = duct
    a = np.array([[1.0, 2.0, -0.5], [0.3, -1.0, 0.7], [0.0, 0.5, 1.5]])
    vel = mesh.points @ a.T  # u_d = sum_c A[d,c] x_c -> du_d/dx_c = A[d,c]
    nbr, mask = build_node_neighbors(edges, len(mesh.points))
    grads = np.asarray(velocity_gradients(jnp.asarray(mesh.points),
                                          jnp.asarray(vel, jnp.float32),
                                          jnp.asarray(nbr), jnp.asarray(mask)))
    interior = ~mesh.wall_mask & (mesh.points[:, 0] > 0.1) & (mesh.points[:, 0] < 1.9)
    # grad[i][c, d] ~= A[d, c]
    err = np.abs(grads[interior] - a.T[None]).max()
    assert err < 5e-2, err


def test_weights_and_divergence_match_reference_numpy_math(duct):
    """Parity vs a numpy replica of the reference numba kernels
    (compute_weights GraphDataset.py:1509-1591, compute_divergence :1594-1608)
    on well-conditioned nodes (the SVD-pinv branch)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.physics.divergence import (
        build_node_neighbors, compute_divergence, compute_weights)

    mesh, edges = duct
    rng = np.random.default_rng(3)
    vel = rng.normal(size=(len(mesh.points), 3)).astype(np.float32)
    nbr, mask = build_node_neighbors(edges, len(mesh.points))
    w = np.asarray(compute_weights(jnp.asarray(mesh.points), jnp.asarray(nbr),
                                   jnp.asarray(mask)))
    div = np.asarray(compute_divergence(jnp.asarray(vel), jnp.asarray(nbr),
                                        jnp.asarray(mask), w))

    pts = mesh.points.astype(np.float64)
    for i in range(0, len(pts), 53):
        ids = nbr[i][mask[i]]
        a = pts[ids] - pts[i]
        a = a / np.linalg.norm(a, axis=1, keepdims=True)  # :1533-1540
        u, s, vt = np.linalg.svd(a, full_matrices=False)
        if s[-1] <= 0 or s[0] / s[-1] >= 1e8:
            continue  # fallback branch — checked implicitly by finiteness below
        s_inv = np.where(s > s[0] * 1e-6, 1.0 / s, 0.0)
        pinv = vt.T @ np.diag(s_inv) @ u.T  # [3, k]
        if np.sum(pinv**2) > 100.0:
            continue
        np.testing.assert_allclose(w[i][:, : len(ids)], pinv, rtol=1e-3, atol=1e-4)
        dv = vel[ids] - vel[i]
        np.testing.assert_allclose(div[i], np.sum(pinv @ dv), rtol=1e-3, atol=1e-4)


def test_projection_reduces_divergence(duct):
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field
    from fast_eng_super_resolution_tpu.physics.projection import DivergenceFreeProjection

    mesh, edges = duct
    v, p = duct_field(mesh.points)
    rng = np.random.default_rng(0)
    noisy = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)

    proj = DivergenceFreeProjection(mesh.points, edges, noisy, p[:, 0])
    init = float(np.linalg.norm(np.asarray(proj.calculate_divergence())))
    vel, pres, final, _ = proj.apply_divergence_free_projection(max_iterations=10,
                                                               tolerance=1e-3)
    assert final <= init  # never worse (reference guarantee, :2029-2039)
    assert final < 0.9 * init, (init, final)  # and actually improves here
    assert np.isfinite(np.asarray(vel)).all()


def test_pressure_solver_solves_matvec(duct):
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.physics.divergence import (
        build_node_neighbors, compute_weights, laplacian_weights, make_laplacian_matvec)
    from fast_eng_super_resolution_tpu.physics.projection import solve_pressure_poisson

    mesh, edges = duct
    nbr, mask = build_node_neighbors(edges, len(mesh.points))
    w = compute_weights(jnp.asarray(mesh.points), jnp.asarray(nbr), jnp.asarray(mask))
    lw = laplacian_weights(w, jnp.asarray(mask))
    matvec, diag = make_laplacian_matvec(jnp.asarray(nbr), jnp.asarray(mask), lw)

    rng = np.random.default_rng(1)
    x_true = rng.normal(size=len(mesh.points)).astype(np.float32)
    rhs = matvec(jnp.asarray(x_true))
    x = solve_pressure_poisson(matvec, diag, rhs, tol=1e-8, maxiter=2000)
    res = np.linalg.norm(np.asarray(matvec(x)) - np.asarray(rhs))
    # the row-normalized reference Laplacian is asymmetric, so plain CG only
    # approximately converges (same limitation as the reference's solver —
    # this path is a parity fallback; the primary solver is CGNR)
    assert res < 0.1 * max(np.linalg.norm(np.asarray(rhs)), 1), res


def test_wss_analytic_shear(duct):
    """Pure shear u = (gamma*y, 0, 0): on the bottom wall (normal -y),
    tau_wall = mu * gamma * (-x_hat... sign aside) magnitude = mu*gamma."""
    from fast_eng_super_resolution_tpu.physics.wss import compute_wall_shear_stress

    mesh, edges = duct
    gamma, mu = 2.0, 1e-3
    vel = np.stack([gamma * mesh.points[:, 1], np.zeros(len(mesh.points)),
                    np.zeros(len(mesh.points))], 1).astype(np.float32)
    surf_ids, tau, mag = compute_wall_shear_stress(mesh.points, mesh.cells, edges,
                                                   vel, dynamic_viscosity=mu)
    pts = mesh.points[surf_ids]
    bottom = (np.isclose(pts[:, 1], 0) & (pts[:, 0] > 0.3) & (pts[:, 0] < 1.7)
              & (pts[:, 2] > 0.15) & (pts[:, 2] < 0.35))
    assert bottom.sum() > 0
    np.testing.assert_allclose(mag[bottom], mu * gamma, rtol=0.15)


def test_wss_writes_vtp(tmp_path, duct):
    from fast_eng_super_resolution_tpu.physics.wss import compute_wall_shear_stress

    mesh, edges = duct
    vel = np.ones((len(mesh.points), 3), np.float32)
    out = str(tmp_path / "wss.vtu")
    compute_wall_shear_stress(mesh.points, mesh.cells, edges, vel,
                              output_filename=out)
    assert (tmp_path / "wss.vtp").exists()


def test_faithful_mode_projection_never_worse(duct):
    """faithful=True replicates the reference operators (normalized weights,
    9-entry divergence); the safety nets must still guarantee no regression
    (GraphDataset.py:2029-2039)."""
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field
    from fast_eng_super_resolution_tpu.physics.projection import DivergenceFreeProjection

    mesh, edges = duct
    v, p = duct_field(mesh.points)
    rng = np.random.default_rng(1)
    noisy = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)
    proj = DivergenceFreeProjection(mesh.points, edges, noisy, p[:, 0],
                                    faithful=True)
    init = float(np.linalg.norm(np.asarray(proj.calculate_divergence())))
    vel, pres, final, _ = proj.apply_divergence_free_projection(max_iterations=4,
                                                               tolerance=1e-3)
    assert final <= init * (1 + 1e-6)
    assert np.isfinite(np.asarray(vel)).all()


def test_projection_scale_invariant():
    """The projection must work on unnormalized (large-norm) fields: jax
    cg's tol is relative to ||b||, and scaling it by initial_norm made the
    solve a silent no-op at norm >= 1e5 (review finding, measured ratio
    1.000 at scale 1e6)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.data.synthetic import (duct_field,
                                                              make_duct_mesh)
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges
    from fast_eng_super_resolution_tpu.physics.projection import (
        DivergenceFreeProjection)

    mesh = make_duct_mesh(8, 5, 5)
    v, _ = duct_field(mesh.points)
    rng = np.random.default_rng(0)
    v = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)
    edges = cells_to_edges(mesh.cells)
    ratios = []
    for scale in (1.0, 1e6):
        proj = DivergenceFreeProjection(mesh.points, edges, v * scale)
        init = float(jnp.linalg.norm(proj.calculate_divergence()))
        _, _, final, _ = proj.apply_divergence_free_projection(max_iterations=8)
        ratios.append(final / init)
    assert ratios[0] < 0.5 and ratios[1] < 0.5, ratios
    assert abs(ratios[0] - ratios[1]) < 0.05, ratios  # scale-invariant


def test_faithful_projection_makes_progress():
    """faithful=True must pair the CGNR composite with the SAME 9-entry-sum
    divergence the loop measures — the mismatched operator barely reduced
    divergence at all (review finding, measured ratio 0.964 vs 0.02 now)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.data.synthetic import (duct_field,
                                                              make_duct_mesh)
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges
    from fast_eng_super_resolution_tpu.physics.projection import (
        DivergenceFreeProjection)

    mesh = make_duct_mesh(8, 5, 5)
    v, _ = duct_field(mesh.points)
    rng = np.random.default_rng(0)
    v = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)
    edges = cells_to_edges(mesh.cells)
    proj = DivergenceFreeProjection(mesh.points, edges, v, faithful=True)
    init = float(jnp.linalg.norm(proj.calculate_divergence()))
    _, _, final, _ = proj.apply_divergence_free_projection(max_iterations=8)
    assert final / init < 0.5, final / init


def test_wss_rejects_non_tet_cells():
    """Hex/mixed meshes must fail fast instead of being sliced as fake tets
    into a plausible-but-wrong boundary surface (review finding)."""
    import pytest

    from fast_eng_super_resolution_tpu.physics.wss import extract_boundary_faces

    points = np.random.default_rng(0).random((8, 3))
    hex_cells = np.arange(8, dtype=np.int64)[None, :]  # one hex [1, 8]
    with pytest.raises(ValueError, match="tetrahedral"):
        extract_boundary_faces(points, hex_cells)
