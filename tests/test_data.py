"""Data layer tests: tensorize, synthetic meshes, partitioning, reconstruction, VTU IO."""

import numpy as np


def test_cells_to_edges_matches_set_loop(rng):
    """Vectorized edge extraction must equal the reference's set-insert loop
    (GraphDataset.py:853-865) semantics."""
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges

    cells = rng.integers(0, 20, size=(15, 4)).astype(np.int64)
    edge_set = set()
    for cell in cells:
        k = len(cell)
        for j in range(k):
            for l in range(j + 1, k):
                if cell[j] != cell[l]:
                    edge_set.add((cell[j], cell[l]))
                    edge_set.add((cell[l], cell[j]))
    expected = np.array(sorted(edge_set))
    got = cells_to_edges(cells)
    np.testing.assert_array_equal(np.sort(got, axis=0), np.sort(expected, axis=0))
    # also variable-length (list) input
    got2 = cells_to_edges(list(cells))
    np.testing.assert_array_equal(np.sort(got2, axis=0), np.sort(expected, axis=0))


def test_synthetic_duct_mesh():
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(8, 5, 5)
    assert mesh.points.shape == (200, 3)
    assert mesh.cells.shape[1] == 4
    assert mesh.cells.max() < 200
    v, p = duct_field(mesh.points)
    # no-slip-ish: wall velocity below centerline velocity
    assert np.abs(v[mesh.wall_mask, 0]).max() < np.abs(v[:, 0]).max() * 0.5
    assert np.isfinite(v).all() and np.isfinite(p).all()


def test_rcb_partition_balance_and_cover(rng):
    from fast_eng_super_resolution_tpu.data.partition import assign_cells
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh

    mesh = make_duct_mesh(12, 6, 6)
    for mode in ("one_region", "all_intersecting"):
        lists, boxes = assign_cells(mesh.points, mesh.cells, 4, mode)
        assert len(lists) == 4 and len(boxes) == 4
        covered = np.unique(np.concatenate(lists))
        assert len(covered) == len(mesh.cells)  # every cell assigned somewhere
        if mode == "one_region":
            assert sum(len(l) for l in lists) == len(mesh.cells)
            counts = [len(l) for l in lists]
            assert max(counts) <= 1.5 * min(counts)  # balanced
        else:
            assert sum(len(l) for l in lists) >= len(mesh.cells)  # overlap


def test_extract_and_reconstruct_roundtrip():
    """Partition -> per-subdomain y -> overlap-average == original field."""
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.reconstruct import (
        make_overlap_average_device, overlap_average)
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(10, 5, 5)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], axis=1)
    subs = extract_subdomains(mesh.points, mesh.cells, y, y, 4, "all_intersecting")
    assert len(subs) >= 2
    # every node covered by at least one subdomain
    covered = np.unique(np.concatenate([s.global_node_ids for s in subs]))
    assert len(covered) == len(mesh.points)

    recon = overlap_average([s.y for s in subs], [s.global_node_ids for s in subs],
                            len(mesh.points))
    np.testing.assert_allclose(recon, y, rtol=1e-5, atol=1e-6)

    # device path agrees
    preds = np.concatenate([s.y for s in subs])
    gids = np.concatenate([s.global_node_ids for s in subs]).astype(np.int32)
    w = np.ones(len(gids), np.float32)
    fn = make_overlap_average_device(len(mesh.points))
    recon_dev = np.asarray(fn(preds, gids, w))
    np.testing.assert_allclose(recon_dev, y, rtol=1e-4, atol=1e-5)


def test_subdomain_edges_match_full_mesh():
    """Edges inside a subdomain must be exactly the full-mesh edges among its cells."""
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges

    mesh = make_duct_mesh(8, 4, 4)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], axis=1)
    subs = extract_subdomains(mesh.points, mesh.cells, y, y, 2, "one_region")
    for s in subs:
        sub_cells_global = mesh.cells[s.cell_ids]
        expected = cells_to_edges(sub_cells_global)
        got = np.stack([s.global_node_ids[s.senders], s.global_node_ids[s.receivers]], 1)
        got = np.unique(got, axis=0)
        np.testing.assert_array_equal(got, np.unique(expected, axis=0))


def test_gaussian_interpolation_reproduces_smooth_field():
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh
    from fast_eng_super_resolution_tpu.ops.interpolate import (
        build_neighbor_lists, gaussian_interpolate_device, gaussian_interpolate_host)

    low = make_duct_mesh(8, 4, 4)
    high = make_duct_mesh(14, 7, 7)
    f = (low.points[:, :1] * 2 + low.points[:, 1:2]).astype(np.float32)
    truth = (high.points[:, :1] * 2 + high.points[:, 1:2]).astype(np.float32)
    out = gaussian_interpolate_host(low.points, f, high.points, radius=0.3)
    err = np.abs(out - truth).mean()
    assert err < 0.05, err

    idxs, dists, mask = build_neighbor_lists(low.points, high.points, 0.3)
    out_dev = np.asarray(gaussian_interpolate_device(f, idxs, dists, mask, 0.3))
    np.testing.assert_allclose(out_dev, out, rtol=1e-4, atol=1e-5)


def test_vtu_roundtrip(tmp_path, rng):
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh
    from fast_eng_super_resolution_tpu.data.vtu import read_vtu, write_vtu

    mesh = make_duct_mesh(5, 4, 3)
    vel = rng.normal(size=(len(mesh.points), 3)).astype(np.float32)
    pres = rng.normal(size=(len(mesh.points),)).astype(np.float32)
    path = str(tmp_path / "out.vtu")
    write_vtu(path, mesh.points, mesh.cells, mesh.cell_types,
              point_data={"velocity": vel, "pressure": pres})
    back = read_vtu(path)
    np.testing.assert_allclose(back["points"], mesh.points)
    np.testing.assert_array_equal(back["cells"], mesh.cells)
    np.testing.assert_array_equal(back["cell_types"], mesh.cell_types)
    np.testing.assert_allclose(back["point_data"]["velocity"], vel)
    np.testing.assert_allclose(back["point_data"]["pressure"], pres)


def test_make_sample_pair_end_to_end():
    from fast_eng_super_resolution_tpu.data.synthetic import make_sample_pair

    s = make_sample_pair()
    assert s["x"].shape == s["y"].shape
    assert s["x"].shape[1] == 4
    assert np.isfinite(s["x"]).all() and np.isfinite(s["y"]).all()
    # interpolated input should correlate strongly with the target
    cc = np.corrcoef(s["x"][:, 0], s["y"][:, 0])[0, 1]
    assert cc > 0.95, cc


def test_legacy_uniform_box_partitioner():
    """GenericGraphDataset legacy box-grid decomposition
    (GraphDataset.py:101-163): axis-aligned cubes, centroid binning."""
    from fast_eng_super_resolution_tpu.data.partition import uniform_box_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(10, 5, 5)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    subs = uniform_box_subdomains(mesh.points, mesh.cells, y, y, sub_size=0.5)
    assert len(subs) >= 4  # 2.0/0.5 = 4 boxes along x at least
    # every cell in exactly one subdomain (box mode has no overlap)
    all_cells = np.concatenate([s.cell_ids for s in subs])
    assert len(all_cells) == len(mesh.cells)
    assert len(np.unique(all_cells)) == len(mesh.cells)
    # every node covered
    covered = np.unique(np.concatenate([s.global_node_ids for s in subs]))
    assert len(covered) == len(mesh.points)
    for s in subs[:3]:
        assert s.senders.max() < len(s.global_node_ids)


def test_extract_subdomains_ragged_cells():
    """Mixed-element (ragged list) cells must go through the pure-Python
    fallback and produce the same subdomain graphs as uniform ndarray cells
    (crashed with TypeError before the extract_all change surfaced it)."""
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(8, 4, 4)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    subs_arr = extract_subdomains(mesh.points, mesh.cells, y, y, 2, "one_region")
    subs_rag = extract_subdomains(mesh.points, [list(c) for c in mesh.cells],
                                  y, y, 2, "one_region")
    assert len(subs_arr) == len(subs_rag)
    for a, b in zip(subs_arr, subs_rag):
        np.testing.assert_array_equal(a.global_node_ids, b.global_node_ids)
        ea = np.unique(np.stack([a.senders, a.receivers], 1), axis=0)
        eb = np.unique(np.stack([b.senders, b.receivers], 1), axis=0)
        np.testing.assert_array_equal(ea, eb)


def test_bend_duct_geometry():
    """bend_duct: isometric arc map — inlet fixed, speeds preserved, outlet
    flow rotated by exactly the bend angle, bend=0 is identity."""
    from fast_eng_super_resolution_tpu.data.synthetic import (
        bend_duct, duct_field, make_duct_mesh)

    m = make_duct_mesh(12, 6, 6, ly=0.5)
    v, _ = duct_field(m.points, ly=0.5)
    p0, v0 = bend_duct(m.points, v, 2.0, 0.0)
    assert p0 is m.points and v0 is v

    pts, vb = bend_duct(m.points, v, 2.0, 40.0)
    np.testing.assert_allclose(np.linalg.norm(vb, axis=1),
                               np.linalg.norm(v, axis=1), rtol=1e-5)
    inlet = np.isclose(m.points[:, 0], 0)
    np.testing.assert_allclose(pts[inlet], m.points[inlet], atol=1e-6)
    out = np.isclose(m.points[:, 0], 2.0)
    a, b = v[inlet][:, :2].mean(0), vb[out][:, :2].mean(0)
    ang = np.degrees(np.arccos(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))))
    assert abs(ang - 40.0) < 1.0, ang


def test_obstacle_deflect_physics():
    """Immersed-cylinder blockage: exact potential-flow deflection far field,
    solid-body damp inside, Bernoulli-consistent pressure."""
    from fast_eng_super_resolution_tpu.data.synthetic import (
        duct_field, make_duct_mesh, obstacle_deflect)

    mesh = make_duct_mesh(24, 12, 6, ly=0.5)
    v0, p0 = duct_field(mesh.points, ly=0.5)
    cx, cy, r = 1.0, 0.25, 0.1
    v, p = obstacle_deflect(mesh.points, v0, p0, cx, cy, r)
    d = np.sqrt((mesh.points[:, 0] - cx) ** 2 + (mesh.points[:, 1] - cy) ** 2)
    far = d > 6 * r
    near = d < 0.5 * r
    # far field approaches the base flow (R^2/r^2 decay)
    assert np.abs(v[far] - v0[far]).max() < 0.05 * np.abs(v0).max()
    # inside the body velocity is damped to zero
    assert np.abs(v[near]).max() < 1e-6
    # stagnation point upstream: pressure rises where flow decelerates
    upstream = (np.abs(mesh.points[:, 1] - cy) < 0.02) & \
        (mesh.points[:, 0] > cx - 2 * r) & (mesh.points[:, 0] < cx - r)
    assert np.all(p[upstream] >= p0[upstream])
    # cross-flow appears (the base duct flow has ~zero vy of its own scale)
    assert np.abs(v[:, 1]).max() > 5 * np.abs(v0[:, 1]).max()


def test_synthetic_dataset_obstacle_cases(tmp_path):
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    ds = SyntheticDataset(root=str(tmp_path / "obs"), partition=True,
                          sub_size=4, obstacle=True, num_cases=2)
    s = ds.get_one_full_sample(0)
    assert len(s) > 0
    ds_plain = SyntheticDataset(root=str(tmp_path / "plain"), partition=True,
                                sub_size=4, num_cases=2)
    a = ds.full_mesh(0)["y"]
    b = ds_plain.full_mesh(0)["y"]
    assert a.shape == b.shape and not np.allclose(a, b)


def test_per_subdomain_field_norm(tmp_path):
    """per_subdomain_field_norm: x and y divided by the SAME per-subdomain
    scale (velocity jointly, pressure alone), exactly invertible via
    field_scale, caches stay raw (same h5 serves both settings)."""
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    root = str(tmp_path / "fn")
    raw = SyntheticDataset(root=root, partition=True, sub_size=4, num_cases=2)
    norm = SyntheticDataset(root=root, partition=True, sub_size=4,
                            num_cases=2, per_subdomain_field_norm=True)
    for i in range(3):
        a, b = raw.get(i), norm.get(i)
        s = b["field_scale"]
        assert s.shape == (a["x"].shape[1],)
        assert np.all(s[:3] == s[0])  # velocity scaled jointly
        np.testing.assert_allclose(b["x"] * s, a["x"], rtol=1e-6)
        np.testing.assert_allclose(b["y"] * s, a["y"], rtol=1e-6)
        # normalized input velocity peaks at 1 per subdomain
        assert abs(np.abs(b["x"][:, :3]).max() - 1.0) < 1e-6
        assert abs(np.abs(b["x"][:, 3]).max() - 1.0) < 1e-6
    assert raw.get(0).get("field_scale") is None


def test_assign_cells_mixed_element_mesh():
    """TRULY ragged cells (unequal node counts, dtype=object — what
    dataset.py builds for mixed tet/wedge/hex meshes) partition without
    crashing in both boundary modes (review finding: points[cells] raised
    IndexError before the ragged branch existed)."""
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(8, 4, 4)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    ragged = [list(c) for c in mesh.cells]
    ragged[0] = ragged[0][:4]  # one tet-like cell -> unequal lengths
    cells_obj = np.empty(len(ragged), dtype=object)
    cells_obj[:] = ragged
    for mode in ("one_region", "all_intersecting"):
        subs = extract_subdomains(mesh.points, cells_obj, y, y, 2, mode)
        assert len(subs) >= 1
        covered = np.unique(np.concatenate([s.global_node_ids for s in subs]))
        # every node of every cell is covered
        want = np.unique(np.concatenate([np.asarray(c) for c in ragged]))
        assert np.isin(want, covered).all()


def test_rcb_more_parts_than_cells():
    """num_parts > cell count yields empty regions instead of IndexError
    (review finding: the degenerate-quantile guard indexed order[-1] on an
    empty branch)."""
    from fast_eng_super_resolution_tpu.data.partition import rcb_regions

    centroids = np.array([[0.5, 0.5, 0.5]])
    assignment, boxes = rcb_regions(centroids, 4)
    assert assignment.shape == (1,) and 0 <= assignment[0] < 4
    assert len(boxes) == 4 and all(b is not None for b in boxes)


def test_uniform_box_keys_collision_free():
    """Box identity is row-wise unique, not a scalar XOR hash: the old hash
    collided within realistic bin ranges (e.g. bins (22,17,13) vs
    (56,23,45)) and silently merged disjoint boxes (review finding)."""
    from fast_eng_super_resolution_tpu.data.partition import uniform_box_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh

    mesh = make_duct_mesh(10, 4, 4)
    y = np.ones((len(mesh.points), 1), np.float32)
    subs = uniform_box_subdomains(mesh.points, mesh.cells, y, y, sub_size=0.3)
    # each subdomain's centroids must occupy exactly ONE grid box
    lo = mesh.points.min(axis=0)
    for s in subs:
        cent = mesh.points[mesh.cells[s.cell_ids]].mean(axis=1)
        bins = np.floor((cent - lo) / 0.3).astype(np.int64)
        assert len(np.unique(bins, axis=0)) == 1


def test_native_rcb_degenerate_more_parts_than_cells():
    """The NATIVE RCB path must survive num_parts > cell count like the
    pure-Python guard does (review finding: nth_element on a <2-point range
    was undefined behavior)."""
    from fast_eng_super_resolution_tpu.data.partition import assign_cells

    points = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    cells = np.array([[0, 1, 2, 3]])
    for mode in ("one_region", "all_intersecting"):
        lists, boxes = assign_cells(points, cells, 8, mode)
        assert len(lists) == 8 and len(boxes) == 8
        assert sum(len(c) for c in lists) >= 1


def test_interpolation_far_fallback_returns_nearest():
    """A dst node far outside the source cloud gets the NEAREST source
    value: the raw far distance underflowed the f32 Gaussian to 0 and the
    fallback silently returned a zero field (review finding)."""
    from fast_eng_super_resolution_tpu.ops.interpolate import (
        gaussian_interpolate_host)

    src = np.zeros((3, 3))
    src[:, 0] = [1.0, 2.0, 3.0]
    vals = np.array([[10.0], [20.0], [30.0]])
    dst = np.array([[100.0, 0.0, 0.0]])
    out = gaussian_interpolate_host(src, vals, dst, radius=0.5)
    np.testing.assert_allclose(out, [[30.0]], rtol=1e-5)


def test_normalize_fields_degenerate_guard():
    """Constant pressure / zero velocity must not write NaN (review
    finding; matches the ETL renormalizer guards)."""
    from fast_eng_super_resolution_tpu.data.tensorize import normalize_fields

    v, p = normalize_fields(np.zeros((4, 3)), np.full(4, 7.0), "ansys")
    assert np.isfinite(v).all() and np.isfinite(p).all()
    v2, p2 = normalize_fields(np.ones((4, 3)), -np.ones(4), "duct")
    assert np.isfinite(v2).all() and np.isfinite(p2).all()
    assert (p2 == -1).all()  # non-positive max: left unscaled, sign intact
