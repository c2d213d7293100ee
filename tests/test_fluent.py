"""Fluent .msh / CFF .cas.h5 reader tests (round-trip + topology checks)."""

import numpy as np
import pytest


@pytest.fixture
def tet_mesh():
    from fast_eng_super_resolution_tpu.data.fluent_mesh import mesh_from_cells
    from fast_eng_super_resolution_tpu.data.synthetic import make_duct_mesh

    duct = make_duct_mesh(5, 4, 4)
    return duct, mesh_from_cells(duct.points, duct.cells)


def test_mesh_from_cells_topology(tet_mesh):
    duct, fm = tet_mesh
    assert fm.num_cells == len(duct.cells)
    # face counts: each tet has 4 faces; interior shared by 2
    n_faces = sum(len(z.c0) for z in fm.face_zones)
    assert n_faces < 4 * len(duct.cells)
    # wall nodes from face zones == boundary nodes of the duct... superset check:
    wall = fm.wall_node_indices()
    assert len(wall) > 0
    assert np.all(np.isin(np.where(duct.wall_mask)[0], wall))


def test_cell_reconstruction_matches_original_cells(tet_mesh):
    duct, fm = tet_mesh
    cell_sets = fm.cell_point_sets()
    assert len(cell_sets) == len(duct.cells)
    for i in range(0, len(duct.cells), 37):
        np.testing.assert_array_equal(np.sort(cell_sets[i]), np.sort(duct.cells[i]))


def test_edges_match_tensorizer(tet_mesh):
    from fast_eng_super_resolution_tpu.data.tensorize import cells_to_edges

    duct, fm = tet_mesh
    expected = cells_to_edges(duct.cells)
    got = fm.edges()
    np.testing.assert_array_equal(got, expected)


def test_msh_roundtrip(tmp_path, tet_mesh):
    from fast_eng_super_resolution_tpu.data.fluent_msh import read_msh, write_msh

    duct, fm = tet_mesh
    path = str(tmp_path / "mesh.msh")
    write_msh(path, fm)
    back = read_msh(path)
    np.testing.assert_allclose(back.points, fm.points, rtol=1e-6)
    assert back.num_cells == fm.num_cells
    assert len(back.face_zones) == len(fm.face_zones)
    for za, zb in zip(back.face_zones, fm.face_zones):
        assert za.bc_type == zb.bc_type
        np.testing.assert_array_equal(za.c0, zb.c0)
        np.testing.assert_array_equal(za.c1, zb.c1)
        np.testing.assert_array_equal(np.asarray(za.face_nodes), np.asarray(zb.face_nodes))
    np.testing.assert_array_equal(back.edges(), fm.edges())
    assert any("wall" in z.name for z in back.face_zones)


def test_cas_h5_roundtrip(tmp_path, tet_mesh):
    from fast_eng_super_resolution_tpu.data.fluent_cff import read_cas_h5, write_cas_h5

    duct, fm = tet_mesh
    path = str(tmp_path / "case.cas.h5")
    write_cas_h5(path, fm)
    back = read_cas_h5(path)
    np.testing.assert_allclose(back.points, fm.points, rtol=1e-6)
    assert back.num_cells == fm.num_cells
    for za, zb in zip(back.face_zones, fm.face_zones):
        assert za.name == zb.name
        np.testing.assert_array_equal(za.c0, zb.c0)
        np.testing.assert_array_equal(np.asarray(za.face_nodes), np.asarray(zb.face_nodes))
    np.testing.assert_array_equal(back.edges(), fm.edges())


def test_cff_reader_error_names_missing_path(tmp_path):
    import h5py

    from fast_eng_super_resolution_tpu.data.fluent_cff import read_cas_h5

    path = str(tmp_path / "bad.cas.h5")
    with h5py.File(path, "w") as f:
        f.create_group("settings")
    with pytest.raises(KeyError, match="meshes"):
        read_cas_h5(path)


def test_msh_binary_roundtrip(tmp_path, tet_mesh):
    """Binary (3010/3013) sections round-trip like ASCII ones."""
    from fast_eng_super_resolution_tpu.data.fluent_msh import read_msh, write_msh

    duct, fm = tet_mesh
    path = str(tmp_path / "mesh_bin.msh")
    write_msh(path, fm, binary=True)
    back = read_msh(path)
    np.testing.assert_allclose(back.points, fm.points, rtol=1e-6)
    assert back.num_cells == fm.num_cells
    assert len(back.face_zones) == len(fm.face_zones)
    for za, zb in zip(back.face_zones, fm.face_zones):
        assert za.bc_type == zb.bc_type
        np.testing.assert_array_equal(za.c0, zb.c0)
        np.testing.assert_array_equal(np.asarray(za.face_nodes), np.asarray(zb.face_nodes))
    np.testing.assert_array_equal(back.edges(), fm.edges())
