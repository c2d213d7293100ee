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


# ---------------------------------------------------------------------------
# Independent fixtures (VERDICT r1 missing #2): NOT produced by this repo's
# writers — a round-trip through our own writer cannot catch a shared
# misunderstanding of the format.  The .msh fixture is hand-assembled from
# the ANSYS Fluent mesh-file format description and exercises constructs the
# writer never emits (fixed-size tri face rows without nnodes prefixes, hex
# zone ids, split node sections, (39) zone names); the CFF fixture is raw
# h5py following the published CFF layout with non-"1" section ids and
# array-typed zone names.
# ---------------------------------------------------------------------------

_TWO_TET_POINTS = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                            [0., 0., 1.], [1., 1., 1.]], np.float32)
_TWO_TET_CELLS = [{0, 1, 2, 3}, {1, 2, 3, 4}]


def _check_two_tet_mesh(fm):
    np.testing.assert_array_equal(fm.points, _TWO_TET_POINTS)
    assert fm.num_cells == 2
    cell_sets = [set(c.tolist()) for c in fm.cell_point_sets()]
    assert cell_sets == _TWO_TET_CELLS
    # zones: one interior (bctype 2) face {1,2,3} with cells (0,1); six
    # boundary tri faces on the wall zone (bctype 3, hex id a=10)
    interior = [z for z in fm.face_zones if z.bc_type == 2]
    wall = [z for z in fm.face_zones if z.bc_type == 3]
    assert len(interior) == 1 and len(wall) == 1
    assert len(interior[0].c0) == 1
    assert set(np.asarray(interior[0].face_nodes).ravel().tolist()) == {1, 2, 3}
    assert (interior[0].c0[0], interior[0].c1[0]) == (0, 1)
    assert wall[0].zone_id == 10
    assert len(wall[0].c0) == 6
    assert np.all(wall[0].c1 == -1)
    assert sorted(fm.wall_node_indices().tolist()) == [0, 1, 2, 3, 4]
    # clique edges: 12 directed per tet, 6 shared within {1,2,3}
    assert fm.edges().shape == (18, 2)


def test_handmade_msh_fixture():
    import os

    from fast_eng_super_resolution_tpu.data.fluent_msh import read_msh

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "handmade_2tet.msh")
    fm = read_msh(path)
    _check_two_tet_mesh(fm)
    names = {z.zone_id: z.name for z in fm.face_zones}
    assert names[3] == "interior:default-interior"
    assert names[10] == "wall:walls"  # decimal id in (39) matches hex 'a'


def test_handmade_cff_fixture(tmp_path):
    """CFF case assembled with raw h5py per the published layout (array-typed
    names, section ids != '1') — write_cas_h5 is never called."""
    import h5py

    from fast_eng_super_resolution_tpu.data.fluent_cff import read_cas_h5

    path = str(tmp_path / "handmade.cas.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("meshes/7")
        g.create_dataset("nodes/coords/7",
                         data=_TWO_TET_POINTS.astype(np.float64))
        faces = [[2, 3, 4],                      # interior (1-based)
                 [1, 2, 3], [1, 2, 4], [1, 3, 4],
                 [2, 3, 5], [2, 4, 5], [3, 4, 5]]
        g.create_dataset("faces/nodes/7/nnodes",
                         data=np.full(7, 3, np.int64))
        g.create_dataset("faces/nodes/7/nodes",
                         data=np.concatenate(faces).astype(np.int64))
        g.create_dataset("faces/c0/7",
                         data=np.array([1, 1, 1, 1, 2, 2, 2], np.int64))
        g.create_dataset("faces/c1/7",
                         data=np.array([2, 0, 0, 0, 0, 0, 0], np.int64))
        zt = g.create_group("faces/zoneTopology")
        zt.create_dataset("id", data=np.array([3, 10], np.int64))
        zt.create_dataset("zoneType", data=np.array([2, 3], np.int64))
        zt.create_dataset("minId", data=np.array([1, 2], np.int64))
        zt.create_dataset("maxId", data=np.array([1, 7], np.int64))
        zt.create_dataset("name",
                          data=np.array([b"interior:default-interior",
                                         b"wall:walls"]))
        g.create_dataset("cells/zoneTopology/maxId",
                         data=np.array([2], np.int64))
    fm = read_cas_h5(path)
    _check_two_tet_mesh(fm)
    assert [z.name for z in fm.face_zones] == ["interior:default-interior",
                                               "wall:walls"]


def test_cff_multi_section_read(tmp_path):
    """CFF files with one section PER ZONE (common producer layout) must
    concatenate sections in sid order — reading only the first section made
    zoneTopology ranges index out of the data (review finding)."""
    import h5py

    from fast_eng_super_resolution_tpu.data.fluent_cff import read_cas_h5

    path = str(tmp_path / "multi.cas.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("meshes/1")
        # nodes split across two sections
        g.create_dataset("nodes/coords/1",
                         data=_TWO_TET_POINTS[:3].astype(np.float64))
        g.create_dataset("nodes/coords/2",
                         data=_TWO_TET_POINTS[3:].astype(np.float64))
        faces = [[2, 3, 4],
                 [1, 2, 3], [1, 2, 4], [1, 3, 4],
                 [2, 3, 5], [2, 4, 5], [3, 4, 5]]
        # faces split: section 1 = interior zone (1 face), 2 = walls (6)
        g.create_dataset("faces/nodes/1/nnodes", data=np.full(1, 3, np.int64))
        g.create_dataset("faces/nodes/1/nodes",
                         data=np.concatenate(faces[:1]).astype(np.int64))
        g.create_dataset("faces/nodes/2/nnodes", data=np.full(6, 3, np.int64))
        g.create_dataset("faces/nodes/2/nodes",
                         data=np.concatenate(faces[1:]).astype(np.int64))
        g.create_dataset("faces/c0/1", data=np.array([1], np.int64))
        g.create_dataset("faces/c0/2",
                         data=np.array([1, 1, 1, 2, 2, 2], np.int64))
        g.create_dataset("faces/c1/1", data=np.array([2], np.int64))
        g.create_dataset("faces/c1/2", data=np.zeros(6, np.int64))
        zt = g.create_group("faces/zoneTopology")
        zt.create_dataset("id", data=np.array([3, 10], np.int64))
        zt.create_dataset("zoneType", data=np.array([2, 3], np.int64))
        zt.create_dataset("minId", data=np.array([1, 2], np.int64))
        zt.create_dataset("maxId", data=np.array([1, 7], np.int64))
        zt.create_dataset("name",
                          data=np.array([b"interior:default-interior",
                                         b"wall:walls"]))
        g.create_dataset("cells/zoneTopology/maxId",
                         data=np.array([2], np.int64))
    fm = read_cas_h5(path)
    _check_two_tet_mesh(fm)


def test_msh_split_binary_node_sections(tmp_path):
    """Binary .msh with the node range split across two (3010) sections:
    the points array must grow to cover max(last), not be frozen at the
    first section's size (review finding)."""
    from fast_eng_super_resolution_tpu.data.fluent_msh import read_msh

    pts = _TWO_TET_POINTS.astype(np.float32)
    chunks = [b'(0 "split binary nodes")\n(2 3)\n']
    chunks.append(b"(10 (0 1 5 0 3))\n")
    chunks.append(b"(3010 (5 1 3 1 3)(")
    chunks.append(np.ascontiguousarray(pts[:3]).tobytes())
    chunks.append(b")\nEnd of Binary Section 3010)\n")
    chunks.append(b"(3010 (6 4 5 1 3)(")
    chunks.append(np.ascontiguousarray(pts[3:]).tobytes())
    chunks.append(b")\nEnd of Binary Section 3010)\n")
    chunks.append(b"(12 (0 1 2 0))\n")
    # one wall face zone so the mesh has some topology
    chunks.append(b"(13 (7 1 1 3 3)(\n1 2 3 1 0\n))\n")
    chunks.append(b'(45 (7 wall walls)())\n')
    path = str(tmp_path / "split.msh")
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    fm = read_msh(path)
    np.testing.assert_allclose(fm.points, pts, rtol=1e-6)
    assert fm.face_zones[0].name == "wall:walls"


def test_msh_roundtrip_face_zone_id_2(tmp_path):
    """A FACE zone with id 2 must keep its name through write+read: the
    writer's cell-zone (45) entry previously hard-coded id 2 and overwrote
    it (review finding)."""
    from fast_eng_super_resolution_tpu.data.fluent_mesh import (FaceZone,
                                                                FluentMesh)
    from fast_eng_super_resolution_tpu.data.fluent_msh import read_msh, write_msh

    faces = np.array([[0, 1, 2]], np.int64)
    fm = FluentMesh(points=_TWO_TET_POINTS.astype(np.float32),
                    face_zones=[FaceZone(2, 3, "wall:top", faces,
                                         np.array([0]), np.array([-1]))],
                    num_cells=2)
    path = str(tmp_path / "zid2.msh")
    write_msh(path, fm)
    back = read_msh(path)
    assert back.face_zones[0].zone_id == 2
    assert back.face_zones[0].name == "wall:top"
