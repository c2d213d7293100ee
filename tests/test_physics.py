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


def _hex_duct(nx=9, ny=5, nz=5, L=2.0, W=0.5, H=0.5):
    """Structured hexahedral duct (VTK hexahedron node ordering)."""
    xs, ys, zs = np.linspace(0, L, nx), np.linspace(0, W, ny), np.linspace(0, H, nz)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
    pts = pts.reshape(-1, 3).astype(np.float32)

    def nid(i, j, k):
        return (i * ny + j) * nz + k

    cells = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                cells.append([nid(i, j, k), nid(i + 1, j, k),
                              nid(i + 1, j + 1, k), nid(i, j + 1, k),
                              nid(i, j, k + 1), nid(i + 1, j, k + 1),
                              nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1)])
    return pts, np.asarray(cells, np.int64)


def test_wss_hex_mesh_analytic_shear(tmp_path):
    """Cell-type-general surface extraction (round-4 VERDICT #2): the WSS
    post-pass must run on a hex-dominant mesh — the reference's
    vtkDataSetSurfaceFilter handles every cell type (compute_wss.py:45-48)
    and real ANSYS meshes are hex/poly-dominant.  Pure shear u=(gamma*y,0,0):
    |tau| = mu*gamma on the y walls, 0 on the z walls."""
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges
    from fast_eng_super_resolution_tpu.physics.wss import (
        compute_wall_shear_stress, extract_boundary_faces)

    pts, cells = _hex_duct()
    faces = extract_boundary_faces(pts, cells)
    assert isinstance(faces, np.ndarray) and faces.shape[1] == 4  # quads
    # every quad face lies on one of the six box walls
    fp = pts[faces]
    on_wall = np.zeros(len(faces), bool)
    for ax, lo, hi in ((0, 0, 2.0), (1, 0, 0.5), (2, 0, 0.5)):
        for v in (lo, hi):
            on_wall |= np.isclose(fp[..., ax], v).all(axis=1)
    assert on_wall.all()

    gamma, mu = 2.0, 1e-3
    vel = np.stack([gamma * pts[:, 1], np.zeros(len(pts)),
                    np.zeros(len(pts))], 1).astype(np.float32)
    edges = cells_to_edges(cells)
    out = str(tmp_path / "wss_hex.vtu")
    surf_ids, tau, mag = compute_wall_shear_stress(
        pts, cells, edges, vel, dynamic_viscosity=mu, output_filename=out)
    assert (tmp_path / "wss_hex.vtp").exists()
    sp = pts[surf_ids]
    interior = ((sp[:, 0] > 0.3) & (sp[:, 0] < 1.7)
                & (sp[:, 2] > 0.05) & (sp[:, 2] < 0.45))
    bottom = interior & np.isclose(sp[:, 1], 0)
    zwall = (np.isclose(sp[:, 2], 0) & (sp[:, 0] > 0.3) & (sp[:, 0] < 1.7)
             & (sp[:, 1] > 0.05) & (sp[:, 1] < 0.45))
    assert bottom.sum() > 0 and zwall.sum() > 0
    np.testing.assert_allclose(mag[bottom], mu * gamma, rtol=1e-4)
    np.testing.assert_allclose(mag[zwall], 0, atol=1e-4 * mu * gamma)


def _hex_prism_fluent(layers=4, r=1.0, h=0.5):
    """Stack of hexagonal prisms as a face-based (polyhedral) FluentMesh:
    no cell array exists — cells are defined purely by their faces, like a
    Fluent element-type-7 zone (/root/reference/dataset/GraphDataset.py:323)."""
    from fast_eng_super_resolution_tpu.data.fluent_mesh import (
        BC_INTERIOR, BC_WALL, FaceZone, FluentMesh)

    ang = np.arange(6) * np.pi / 3
    ring = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
    pts = np.concatenate(
        [np.concatenate([ring, np.full((6, 1), m * h)], 1)
         for m in range(layers + 1)]).astype(np.float32)

    hexf = [np.arange(6, dtype=np.int64) + 6 * m for m in range(layers + 1)]
    interior = [(hexf[m], m - 1, m) for m in range(1, layers)]
    quads = []
    for m in range(layers):
        for i in range(6):
            j = (i + 1) % 6
            quads.append((np.array([6 * m + i, 6 * m + j,
                                    6 * (m + 1) + j, 6 * (m + 1) + i],
                                   np.int64), m))
    zones = [
        FaceZone(2, BC_INTERIOR, "interior:interior-fluid",
                 [f for f, _, _ in interior],
                 np.array([a for _, a, _ in interior], np.int64),
                 np.array([b for _, _, b in interior], np.int64)),
        FaceZone(3, BC_WALL, "wall:walls", [f for f, _ in quads],
                 np.array([c for _, c in quads], np.int64),
                 np.full(len(quads), -1, np.int64)),
        FaceZone(4, BC_WALL, "wall:caps", [hexf[0], hexf[layers]],
                 np.array([0, layers - 1], np.int64),
                 np.array([-1, -1], np.int64)),
    ]
    return FluentMesh(points=pts, face_zones=zones, num_cells=layers)


def test_wss_polyhedral_fluent_surface():
    """Polyhedral meshes go through the face zones (wall_surface_from_fluent)
    — mixed 4/6-gon wall faces, outward orientation, analytic shear.
    u = (gamma*z, 0, 0): on a side wall with normal n=(nx,ny,0),
    tau_wall = mu*gamma*nx*e_z (tangential), |tau| = mu*gamma*|nx|."""
    from fast_eng_super_resolution_tpu.physics.wss import (
        compute_wall_shear_stress, point_normals, wall_surface_from_fluent)

    mesh = _hex_prism_fluent()
    pts = mesh.points
    faces = wall_surface_from_fluent(mesh)
    assert isinstance(faces, list)           # ragged: quads + hexagons
    assert sorted({len(f) for f in faces}) == [4, 6]

    surf_ids, normals = point_normals(pts, faces)
    # all 30 points are on the wall surface of the prism stack
    assert len(surf_ids) == len(pts)
    # mid-layer ring points touch only side quads: outward radial normal
    mid = (pts[surf_ids][:, 2] > 0.25) & (pts[surf_ids][:, 2] < 1.75)
    radial = pts[surf_ids][:, :2]
    radial = radial / np.linalg.norm(radial, axis=1, keepdims=True)
    got = normals[mid]
    np.testing.assert_allclose(got[:, 2], 0, atol=1e-6)
    cos = np.einsum("sd,sd->s", got[:, :2], radial[mid])
    assert (cos > 0.99).all()                # outward, corner-bisector exact

    gamma, mu = 3.0, 1e-3
    vel = np.stack([gamma * pts[:, 2], np.zeros(len(pts)),
                    np.zeros(len(pts))], 1).astype(np.float32)
    surf_ids, tau, mag = compute_wall_shear_stress(
        pts, None, mesh.edges(), vel, dynamic_viscosity=mu, faces=faces)
    expected = mu * gamma * np.abs(normals[mid, 0])
    np.testing.assert_allclose(mag[mid], expected, rtol=1e-4)
    # tau on side walls is purely axial (e_z)
    np.testing.assert_allclose(tau[mid, :2], 0, atol=1e-4 * mu * gamma)


def test_wss_mixed_and_unsupported_cells():
    """Ragged mixed-size cell lists dispatch per element type; a cell size
    outside the linear zoo fails fast with a pointer to the fluent path."""
    import pytest

    from fast_eng_super_resolution_tpu.physics.wss import extract_boundary_faces

    # a unit cube split into one wedge pair (two 6-node wedges)
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
    wedges = [np.array([0, 1, 3, 4, 5, 7]), np.array([1, 2, 3, 5, 6, 7])]
    faces = extract_boundary_faces(pts, wedges)
    sizes = sorted(len(f) for f in faces) if isinstance(faces, list) \
        else [faces.shape[1]] * len(faces)
    # 6 box quads... as 2 tris per wedge-split face + 4 quads + 2 diagonal-
    # free: the cube surface = 4 tris (top/bottom split) + 4 side quads
    assert sizes == [3, 3, 3, 3, 4, 4, 4, 4]
    with pytest.raises(ValueError, match="unsupported cell"):
        extract_boundary_faces(pts, np.arange(7, dtype=np.int64)[None, :])


def test_wss_empty_surface_contract():
    """Both surface providers return an empty uniform [0, 3] faces array
    when no boundary face survives (round-4 advisor: out[0]/concatenate
    raised opaquely, and the two providers disagreed on the contract)."""
    from fast_eng_super_resolution_tpu.data.fluent_mesh import FluentMesh
    from fast_eng_super_resolution_tpu.physics.wss import (
        extract_boundary_faces, wall_surface_from_fluent)

    # two tets sharing every face is impossible; instead duplicate one tet:
    # each of its 4 faces is used by exactly TWO cells -> no boundary
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 3]], np.int64)
    faces = extract_boundary_faces(pts, tets)
    assert isinstance(faces, np.ndarray) and faces.shape == (0, 3)
    assert faces.dtype == np.int64

    mesh = FluentMesh(points=pts, face_zones=[], num_cells=0)
    faces2 = wall_surface_from_fluent(mesh)
    assert isinstance(faces2, np.ndarray) and faces2.shape == (0, 3)


def test_projection_device_loop_matches_host():
    """The device-resident outer loop (one dispatch, round-4 VERDICT weak
    #2) must reproduce the host loop's result: same alpha/rollback policy
    as jnp.where branches inside lax.while_loop."""
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

    host = DivergenceFreeProjection(mesh.points, edges, v)
    init = float(np.linalg.norm(np.asarray(host.calculate_divergence())))
    hv, _, hfinal, _ = host.apply_divergence_free_projection(max_iterations=8)

    dev = DivergenceFreeProjection(mesh.points, edges, v)
    # precond='none': the host loop is plain CGNR, so the parity arm must
    # be too (the round-5 AMG default converges BETTER than the host loop,
    # which is exactly what this test would flag)
    dv, _, dfinal, dit = dev.apply_divergence_free_projection_device(
        max_iterations=8, precond="none")
    assert dfinal / init < 0.5                    # real progress
    # same policy -> same trajectory up to f32-vs-f64 alpha arithmetic
    # (the host loop adapts alpha in python floats; measured drift 0.5%)
    np.testing.assert_allclose(dfinal, hfinal, rtol=2e-2)
    # fields: compare against the field scale, not elementwise rel (the
    # slightly different alpha path shifts near-zero components)
    dev_err = np.abs(np.asarray(dv) - np.asarray(hv)).max()
    assert dev_err < 2e-2 * np.abs(np.asarray(hv)).max(), dev_err
    assert 1 <= dit <= 8


def test_amg_assembly_matches_matvec(duct):
    """The scipy-assembled composite A and the device consistent_matvec are
    the same operator (the AMG build must precondition the system the CG
    actually solves)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.data.synthetic import duct_field
    from fast_eng_super_resolution_tpu.physics import amg
    from fast_eng_super_resolution_tpu.physics.projection import (
        DivergenceFreeProjection)

    mesh, edges = duct
    v, p = duct_field(mesh.points)
    proj = DivergenceFreeProjection(mesh.points, edges, v)
    n = len(mesh.points)
    A = amg.assemble_composite(proj.nbr, proj.mask, proj.weights)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    ref = np.asarray(proj.consistent_matvec(jnp.asarray(x)))
    got = A @ x.astype(np.float64)
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12) < 1e-5

    # hierarchy builds and the V-cycle is linear + finite
    N = amg.assemble_normal(proj.nbr, proj.mask, proj.weights)
    levels, cinv = amg.build_hierarchy(N, coarse_size=100)
    V = amg.make_vcycle(levels, cinv)
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)
    v1, v2 = V(r), V(2.0 * r)
    assert np.isfinite(np.asarray(v1)).all()
    np.testing.assert_allclose(np.asarray(v2), 2 * np.asarray(v1),
                               rtol=1e-4, atol=1e-6)


def test_amg_preconditioned_projection_beats_plain(duct):
    """The AMG-preconditioned device loop must reach at least the plain
    CGNR loop's divergence reduction in strictly fewer outer iterations —
    the measured round-5 property (near-exact Newton steps)."""
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.data.synthetic import duct_field
    from fast_eng_super_resolution_tpu.physics.projection import (
        DivergenceFreeProjection)

    mesh, edges = duct
    v, p = duct_field(mesh.points)
    rng = np.random.default_rng(0)
    noisy = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)

    proj_p = DivergenceFreeProjection(mesh.points, edges, noisy)
    init = float(jnp.linalg.norm(proj_p.calculate_divergence()))
    _, _, final_plain, _ = proj_p.apply_divergence_free_projection_device(
        max_iterations=8, tolerance=1e-5, cg_maxiter=50, precond="none")

    proj_a = DivergenceFreeProjection(mesh.points, edges, noisy)
    _, _, final_amg, it_amg = proj_a.apply_divergence_free_projection_device(
        max_iterations=3, tolerance=1e-5, cg_maxiter=50, precond="amg")
    assert np.isfinite(final_amg)
    assert final_amg <= final_plain * 1.05, (final_plain, final_amg)
    assert init / final_amg > 5.0, (init, final_amg)
