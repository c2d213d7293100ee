"""End-to-end dataset ETL tests (synthetic CFF/CSV raw -> h5 partition cache)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    root = str(tmp_path_factory.mktemp("synth"))
    return SyntheticDataset(root=root, partition=True, sub_size=4,
                            n_high=(10, 5, 5), n_low=(6, 3, 3))


def test_synthetic_etl_layout(synth):
    # raw files in real formats
    assert os.path.exists(os.path.join(synth.raw_dir, "0degree_high.cas.h5"))
    assert os.path.exists(os.path.join(synth.raw_dir, "0degree"))
    # processed annotated VTUs (GraphDataset.py:1032-1036 layout)
    assert os.path.exists(os.path.join(synth.processed_dir, "mesh_0_high.vtu"))
    # partition cache with reference group layout (GraphDataset.py:1278-1284)
    import h5py
    with h5py.File(synth.partition_path(), "r") as f:
        assert "mesh_0" in f and "subdomain_0" in f["mesh_0"]
        g = f["mesh_0/subdomain_0"]
        for key in ("x", "y", "pos", "edge_index", "edge_attr", "global_node_ids"):
            assert key in g, key
        assert g["edge_index"].shape[0] == 2


def test_dataset_access_api(synth):
    assert synth.num_meshes == 4
    n = len(synth)
    assert n >= 8  # 4 meshes x >=2 nonempty subdomains
    d = synth.get(0)
    assert d["x"].shape[1] == 4 and d["y"].shape[1] == 4
    assert d["senders"].max() < d["x"].shape[0]

    sample = synth.get_one_full_sample(2)
    assert len(sample) >= 2
    full = synth.full_mesh(2)
    covered = np.unique(np.concatenate([s["global_node_ids"] for s in sample]))
    assert len(covered) == len(full["points"])


def test_input_correlates_with_target(synth):
    """The interpolated low-res input must track the high-res truth."""
    full = synth.full_mesh(0)
    cc = np.corrcoef(full["x"][:, 0], full["y"][:, 0])[0, 1]
    assert cc > 0.9, cc
    assert np.isfinite(full["x"]).all() and np.isfinite(full["y"]).all()


def test_reconstruction_from_dataset_sample(synth):
    from fast_eng_super_resolution_tpu.data.reconstruct import overlap_average

    sample = synth.get_one_full_sample(0)
    full = synth.full_mesh(0)
    recon = overlap_average([s["y"] for s in sample],
                            [s["global_node_ids"] for s in sample],
                            len(full["points"]))
    np.testing.assert_allclose(recon, full["y"], rtol=1e-5, atol=1e-6)


def test_duct_dataset_with_msh_raw(tmp_path):
    """DuctAnalysisDataset pipeline over generated .msh + duct-style CSV."""
    from fast_eng_super_resolution_tpu.data.dataset import (
        COL_P_DUCT, DuctAnalysisDataset, write_physics_csv)
    from fast_eng_super_resolution_tpu.data.fluent_mesh import mesh_from_cells
    from fast_eng_super_resolution_tpu.data.fluent_msh import write_msh
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    root = str(tmp_path / "duct")
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(1)
    for name, dims in (("Mesh_Output_High.msh", (8, 5, 5)),
                       ("Mesh_Output_Med.msh", (5, 3, 3)),
                       ("Mesh_Output_Low.msh", (4, 3, 3))):
        mesh = make_duct_mesh(*dims)
        write_msh(os.path.join(raw, name), mesh_from_cells(mesh.points, mesh.cells))
        v, p = duct_field(mesh.points)
        p = p + 0.5  # keep strictly positive for the duct p/max(p) norm
        perm = rng.permutation(len(mesh.points))
        tag = {"Mesh_Output_High.msh": "High", "Mesh_Output_Med.msh": "Med",
               "Mesh_Output_Low.msh": "Low"}[name]
        write_physics_csv(os.path.join(raw, f"Output_Summary_{tag}_100"),
                          mesh.points[perm], v[perm], p[perm], COL_P_DUCT)

    ds = DuctAnalysisDataset(root=root, partition=True, sub_size=2)
    assert len(ds) == 2
    d = ds.get(0)
    assert d["x"].shape[1] == 4
    sample = ds.get_one_full_sample()
    assert len(sample) == 2


def test_reference_layout_duct_h5_without_global_ids(tmp_path):
    """A reference-produced duct partition cache (no global_node_ids,
    GraphDataset.py:615-620) must flow through predict+reconstruct — the
    runner recovers ids by coordinate matching."""
    import h5py

    from fast_eng_super_resolution_tpu.data.dataset import DuctAnalysisDataset
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    mesh = make_duct_mesh(8, 4, 4)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    subs = extract_subdomains(mesh.points, mesh.cells, y, y, 2, "one_region")

    root = str(tmp_path / "duct_ref")
    os.makedirs(os.path.join(root, "partition"))
    os.makedirs(os.path.join(root, "processed"))
    os.makedirs(os.path.join(root, "raw"))
    # write the REFERENCE duct layout: flat subdomain groups, 5 datasets only
    with h5py.File(os.path.join(root, "partition", "data.h5"), "w") as f:
        for i, s in enumerate(subs):
            g = f.create_group(f"subdomain_{i}")
            g.create_dataset("x", data=s.x)
            g.create_dataset("y", data=s.y)
            g.create_dataset("pos", data=s.pos)
            g.create_dataset("edge_index", data=np.stack([s.senders, s.receivers]).astype(np.int64))
            g.create_dataset("edge_attr", data=s.edge_attr)
    np.savez(os.path.join(root, "processed", "mesh_0.npz"),
             points=mesh.points, cells=mesh.cells, x=y, y=y,
             wall_idx=np.zeros(0, np.int64))
    np.savez(os.path.join(root, "processed", "data.npz"), num_meshes=1)
    open(os.path.join(root, "raw", "Mesh_Output_High.msh"), "w").write("stub")

    ds = DuctAnalysisDataset(root=root, partition=True, sub_size=2)
    sample = ds.get_one_full_sample()
    assert all("global_node_ids" not in d for d in sample)

    # drive the runner's predict+reconstruct over this reference-layout data
    import jax

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.runner import pred_graph_ALDD
    from fast_eng_super_resolution_tpu.sched.scheduler import PartitionScheduler

    model = KernelNN(width=6, ker_width=4, depth=2, in_width=4, out_width=4)
    log_dir = str(tmp_path / "logs")
    sched = PartitionScheduler("ref_duct", 1, ds, model, train=True, log_dir=log_dir)
    sched.train(dict(epochs=1, batch_size=4, lr=1e-3, step_size=30, gamma=0.1,
                     log_interval=10, val_interval=1))
    import os as _os
    cwd = _os.getcwd()
    try:
        _os.chdir(str(tmp_path))
        outs = pred_graph_ALDD([0], "ref_duct", model, ds, 1, log_dir=log_dir)
    finally:
        _os.chdir(cwd)
    assert os.path.exists(outs[0])


def test_duct_load_case_25(tmp_path):
    """DuctAnalysisDataset(load_case=25) consumes the 25%-load CSVs
    (GraphDataset.py:229-231 lists both variants)."""
    from fast_eng_super_resolution_tpu.data.dataset import (
        COL_P_DUCT, DuctAnalysisDataset, write_physics_csv)
    from fast_eng_super_resolution_tpu.data.fluent_mesh import mesh_from_cells
    from fast_eng_super_resolution_tpu.data.fluent_msh import write_msh
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh

    root = str(tmp_path / "duct25")
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(2)
    for name, dims in (("Mesh_Output_High.msh", (6, 4, 4)),
                       ("Mesh_Output_Med.msh", (4, 3, 3)),
                       ("Mesh_Output_Low.msh", (4, 3, 3))):
        mesh = make_duct_mesh(*dims)
        write_msh(os.path.join(raw, name), mesh_from_cells(mesh.points, mesh.cells))
        v, p = duct_field(mesh.points)
        tag = name.split("_")[2].split(".")[0]
        write_physics_csv(os.path.join(raw, f"Output_Summary_{tag}_25"),
                          mesh.points, v * 0.25, p + 0.5, COL_P_DUCT)

    ds = DuctAnalysisDataset(root=root, partition=True, sub_size=2, load_case=25)
    assert len(ds) == 2
    assert "Output_Summary_High_25" in ds.raw_file_names


def test_ansys_missing_cases_skipped_gracefully(tmp_path):
    """Missing case files print and continue (GraphDataset.py:905-907):
    a partial raw set still yields a working dataset."""
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    root = str(tmp_path / "partial")
    ds = SyntheticDataset(root=root, partition=True, sub_size=2,
                          n_high=(8, 4, 4), n_low=(5, 3, 3))
    # remove two of four cases and force reprocessing
    import shutil
    for name in ("40degree", "60degree"):
        for suffix in ("_high.cas.h5", ".cas.h5", "_high", ""):
            p = os.path.join(root, "raw", name + suffix)
            if os.path.exists(p):
                os.remove(p)
    shutil.rmtree(os.path.join(root, "processed"))
    shutil.rmtree(os.path.join(root, "partition"))

    ds2 = SyntheticDataset(root=root, partition=True, sub_size=2,
                           n_high=(8, 4, 4), n_low=(5, 3, 3))
    assert ds2.num_meshes == 2  # the two remaining cases processed fine
    assert len(ds2.get_one_full_sample(1)) >= 1


def test_synthetic_extra_cases_and_random_aspects(tmp_path):
    """num_cases>4 extends the reference 4-case ladder with extra random-aspect
    ducts (for generalization studies); aspect_seed makes aspects random but
    deterministic."""
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    # naming/aspect logic (no heavy processing needed)
    ds = SyntheticDataset.__new__(SyntheticDataset)
    ds._num_cases, ds._aspect_seed = 6, 7
    assert ds.raw_file_names == ["0degree", "20degree", "40degree", "60degree",
                                 "case4", "case5"]
    a0, a0b, a1 = ds._case_aspect(0), ds._case_aspect(0), ds._case_aspect(1)
    assert a0 == a0b and a0 != a1 and 0.4 <= a0 <= 0.8
    ds._aspect_seed = None
    assert ds._case_aspect(2) == pytest.approx(0.5 + 0.16)

    # a full (tiny) 5-case build round-trips through ETL + partition
    ds5 = SyntheticDataset(root=str(tmp_path), partition=True, sub_size=2,
                           n_high=(8, 4, 4), n_low=(5, 3, 3),
                           num_cases=5, aspect_seed=3)
    assert ds5.num_meshes == 5
    subs = ds5.get_one_full_sample(4)
    assert len(subs) >= 1 and np.isfinite(subs[0]["x"]).all()


def test_synthetic_vary_resolution(tmp_path):
    """vary_resolution=True gives each case its own mesh density (0.75-1.5x)
    — mixed-resolution training is the measured remedy for cross-resolution
    transfer (BASELINE.md: 1.55x -> 5.2x at an unseen density)."""
    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    ds = SyntheticDataset(root=str(tmp_path), num_cases=4, aspect_seed=3,
                          vary_resolution=True, n_high=(10, 5, 5),
                          n_low=(6, 3, 3), sub_size=2)
    sizes = {len(ds.full_mesh(i)["points"]) for i in range(4)}
    assert len(sizes) > 1, sizes  # densities actually differ across cases
    for i in range(4):
        subs = ds.get_one_full_sample(i)
        assert all(np.isfinite(s["x"]).all() for s in subs)


def test_multi_obstacle_cases(tmp_path):
    """obstacle=2: two disjoint immersed cylinders per case, composed
    sequentially; single-obstacle (True) keeps the round-2 draw ranges."""
    import numpy as np

    from fast_eng_super_resolution_tpu.data.dataset import SyntheticDataset

    ds2 = SyntheticDataset(root=str(tmp_path / "m2"), partition=True,
                           sub_size=4, n_high=(10, 5, 5), n_low=(6, 3, 3),
                           num_cases=2, obstacle=2)
    ds1 = SyntheticDataset(root=str(tmp_path / "m1"), partition=True,
                           sub_size=4, n_high=(10, 5, 5), n_low=(6, 3, 3),
                           num_cases=2, obstacle=True)
    f2 = ds2.full_mesh(0)
    f1 = ds1.full_mesh(0)
    # both produce finite fields; the two-obstacle field differs from the
    # one-obstacle field (second blockage changes the flow)
    assert np.isfinite(f2["x"]).all() and np.isfinite(f1["x"]).all()
    assert not np.allclose(f2["x"], f1["x"])
