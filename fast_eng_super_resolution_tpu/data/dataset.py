"""Datasets: ANSYS / duct ETL pipelines with the reference's cache layout.

Parity targets:
- AnsysDataset (/root/reference/dataset/GraphDataset.py:751-1484): per-case
  high+low CFF meshes + Fluent-exported CSV physics, KDTree node mapping,
  per-mesh normalization, Gaussian low->high interpolation, annotated
  ``processed/mesh_{i}_high.vtu``, partition cache ``partition/data.h5`` with
  groups ``mesh_{i}/subdomain_{j}/{x,y,pos,edge_index,edge_attr,global_node_ids}``
  (GraphDataset.py:1278-1284), overlapping decomposition (:1219).
- DuctAnalysisDataset (GraphDataset.py:196-748): legacy .msh + CSV, one mesh,
  flat ``subdomain_{i}`` groups (:615-620), non-overlapping decomposition (:565).
- SyntheticDataset: generates raw files in the *same formats* (CFF .cas.h5 +
  padded-column CSV) and runs the identical ETL, so the full pipeline is
  exercised with no external data.

Fluent CSV column names are space-padded exactly as the reference indexes them
(GraphDataset.py:949-960: '    x-coordinate', '      x-velocity',
'absolute-pressure'; duct variant '        pressure' :355-366).
"""

from __future__ import annotations

import os

import h5py
import numpy as np
import pandas as pd

from ..ops.interpolate import gaussian_interpolate_host
from .fluent_cff import read_cas_h5, write_cas_h5
from .fluent_mesh import FluentMesh, mesh_from_cells
from .fluent_msh import read_msh, write_msh
from .partition import Subdomain, extract_subdomains
from .tensorize import edge_lengths, map_physics_to_mesh, normalize_fields
from .vtu import write_vtu

COL_X = "    x-coordinate"
COL_Y = "    y-coordinate"
COL_Z = "    z-coordinate"
COL_VX = "      x-velocity"
COL_VY = "      y-velocity"
COL_VZ = "      z-velocity"
COL_P_ANSYS = "absolute-pressure"
COL_P_DUCT = "        pressure"

GAUSS_RADIUS = 0.012 * 3  # vtkGaussianKernel radius (GraphDataset.py:1078-1086)
GAUSS_SHARPNESS = 2.0


def read_physics_csv(path: str, pressure_col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (points [M,3], velocity [M,3], pressure [M,1]) from Fluent CSV."""
    df = pd.read_csv(path, sep=",")
    pts = np.stack([df[COL_X], df[COL_Y], df[COL_Z]], axis=1).astype(np.float64)
    vel = np.stack([df[COL_VX], df[COL_VY], df[COL_VZ]], axis=1).astype(np.float32)
    pres = np.asarray(df[pressure_col], np.float32)[:, None]
    return pts, vel, pres


def write_physics_csv(path: str, points: np.ndarray, velocity: np.ndarray,
                      pressure: np.ndarray, pressure_col: str) -> None:
    df = pd.DataFrame({
        "nodenumber": np.arange(1, len(points) + 1),
        COL_X: points[:, 0], COL_Y: points[:, 1], COL_Z: points[:, 2],
        COL_VX: velocity[:, 0], COL_VY: velocity[:, 1], COL_VZ: velocity[:, 2],
        pressure_col: pressure[:, 0],
    })
    df.to_csv(path, index=False)


def _renormalize_interp(interp: np.ndarray, context: str,
                        pressure_shift: bool) -> tuple[np.ndarray, np.ndarray]:
    """Renormalize interpolated input fields (GraphDataset.py:1008-1011).

    Delegates to tensorize.normalize_fields — ONE copy of the
    degenerate-field guards (0/0 NaN prevention + warning; the reference
    only warns after the NaN, GraphDataset.py:401-403/1012-1014) — with
    the style mapping pressure_shift=True == 'ansys' ((p-min)/max), False
    == 'duct' (p/max).  ``context`` names the mesh in failure prints."""
    from .tensorize import normalize_fields

    v, p = normalize_fields(interp[:, :3], interp[:, 3:4],
                            style="ansys" if pressure_shift else "duct")
    if not (np.isfinite(v).all() and np.isfinite(p).all()):
        print(f"Warning: non-finite interpolated fields in {context}")
    return v, p


def _stack_cells(cell_sets) -> tuple[np.ndarray, bool]:
    """Uniform cell sets stack into a 2D int array (the native fast paths);
    mixed element sizes fall back to a ragged object array.  An empty mesh
    yields an empty 2D array instead of IndexError (this guard previously
    existed in only one of the two copy-pasted call sites)."""
    if not len(cell_sets):
        return np.empty((0, 0), np.int64), True
    sizes = np.array([len(c) for c in cell_sets])
    uniform = bool(np.all(sizes == sizes[0]))
    cells = (np.stack(cell_sets) if uniform
             else np.array(cell_sets, dtype=object))
    return cells, uniform


class _PartitionedGraphDataset:
    """Shared h5-backed partition cache + sample access (base for both datasets)."""

    pressure_col = COL_P_ANSYS
    norm_style = "ansys"
    boundary_mode = "all_intersecting"
    gauss_radius = GAUSS_RADIUS  # vtkGaussianKernel radius, GraphDataset.py:1078-1086

    def __init__(self, root: str, partition: bool = True, sub_size: int = 4,
                 normalize_edge_attr: bool = False,
                 per_subdomain_field_norm: bool = False, **kwargs):
        self.root = root
        self.partition = partition
        self.sub_size = sub_size
        self._normalize_edge_attr = bool(normalize_edge_attr)
        self._field_norm = bool(per_subdomain_field_norm)
        self.raw_dir = os.path.join(root, "raw")
        self.processed_dir = os.path.join(root, "processed")
        self.partition_dir = os.path.join(root, "partition")
        if not os.path.isdir(self.raw_dir) or not os.listdir(self.raw_dir):
            self.prepare_raw()  # synthetic datasets generate; real ones raise
        if not os.path.exists(self._processed_marker()):
            os.makedirs(self.processed_dir, exist_ok=True)
            self.process()
        if partition and not os.path.exists(self.partition_path()):
            os.makedirs(self.partition_dir, exist_ok=True)
            self.build_partitions()

    # -- layout ----------------------------------------------------------
    @property
    def raw_file_names(self) -> list[str]:
        raise NotImplementedError

    def _processed_marker(self) -> str:
        return os.path.join(self.processed_dir, "data.npz")

    def partition_path(self) -> str:
        return os.path.join(self.partition_dir, "data.h5")

    def prepare_raw(self):
        raise RuntimeError(
            f"Raw data directory is empty: {self.raw_dir}. "
            "Please download the dataset first.")  # GraphDataset.py:39-40

    # -- ETL -------------------------------------------------------------
    def process(self):
        raise NotImplementedError

    def build_partitions(self):
        raise NotImplementedError

    # -- access (reference API surface) ----------------------------------
    def _h5(self):
        return h5py.File(self.partition_path(), "r")

    def _read_subdomain(self, group) -> dict:
        edge_index = np.asarray(group["edge_index"], np.int64)
        edge_attr = np.asarray(group["edge_attr"], np.float32).reshape(-1, 1)
        if getattr(self, "_normalize_edge_attr", False) and len(edge_attr):
            # resolution-invariant kernel input: raw edge LENGTHS shift
            # out-of-distribution when mesh density changes (measured:
            # cross-resolution transfer 1.55x raw vs see BASELINE.md).
            # Normalization happens at READ time so caches stay raw.
            edge_attr = edge_attr / max(float(edge_attr.mean()), 1e-12)
        out = {
            "x": np.asarray(group["x"], np.float32),
            "y": np.asarray(group["y"], np.float32),
            "pos": np.asarray(group["pos"], np.float32),
            "senders": edge_index[0].astype(np.int32),
            "receivers": edge_index[1].astype(np.int32),
            "edge_attr": edge_attr,
        }
        if "global_node_ids" in group:
            out["global_node_ids"] = np.asarray(group["global_node_ids"], np.int64)
        if getattr(self, "_field_norm", False):
            # per-subdomain amplitude invariance (round-1 quality-lever list):
            # the reference normalizes per MESH only (GraphDataset.py:960-976),
            # so wall subdomains train at a tiny fraction of the loss weight of
            # core-flow subdomains and the model sees the full amplitude range.
            # Scale-only (no shift — padding zeros stay neutral), velocity
            # channels jointly (preserves direction), pressure on its own;
            # the SAME per-subdomain scale divides x and y, so the mapping the
            # model learns is amplitude-invariant and exactly invertible.
            # Applied at READ time (caches stay raw, like normalize_edge_attr);
            # predictions are re-scaled by ``field_scale`` before
            # reconstruction (runner.pred_graph_ALDD).  Checkpoints are NOT
            # interchangeable across flag settings.
            x = out["x"]
            c = x.shape[1]
            if out["y"].shape != x.shape:
                # field_scale multiplies predictions AND refs back to physical
                # units downstream (runner.pred_graph_ALDD), so a y with a
                # different channel layout would silently get wrong units
                raise ValueError(
                    "per_subdomain_field_norm requires matching x/y shapes, "
                    f"got x {x.shape} vs y {out['y'].shape}")
            scale = np.empty(c, np.float32)
            if c >= 3:
                # first 3 channels are velocity components: one joint scale
                # preserves flow direction (c == 3 means velocity-only data)
                scale[:3] = max(float(np.abs(x[:, :3]).max()), 1e-8)
                for j in range(3, c):
                    scale[j] = max(float(np.abs(x[:, j]).max()), 1e-8)
            else:
                for j in range(c):
                    scale[j] = max(float(np.abs(x[:, j]).max()), 1e-8)
            out["x"] = x / scale
            out["y"] = out["y"] / scale
            out["field_scale"] = scale
        return out

    @staticmethod
    def _write_subdomain(group, sub: Subdomain) -> None:
        group.create_dataset("x", data=sub.x)
        group.create_dataset("y", data=sub.y)
        group.create_dataset("pos", data=sub.pos)
        group.create_dataset("edge_index",
                             data=np.stack([sub.senders, sub.receivers]).astype(np.int64))
        group.create_dataset("edge_attr", data=sub.edge_attr)
        group.create_dataset("global_node_ids", data=sub.global_node_ids)


class AnsysDataset(_PartitionedGraphDataset):
    """Four-case CFF workload (GraphDataset.py:751-1484)."""

    pressure_col = COL_P_ANSYS
    norm_style = "ansys"
    boundary_mode = "all_intersecting"

    @property
    def raw_file_names(self) -> list[str]:
        return ["0degree", "20degree", "40degree", "60degree"]  # :799-801

    def case_paths(self, name: str) -> dict:
        base = os.path.join(self.raw_dir, name)
        return {
            "high_mesh": base + "_high.cas.h5", "low_mesh": base + ".cas.h5",
            "high_phys": base + "_high", "low_phys": base,
        }

    def _load_case_fields(self, mesh: FluentMesh, phys_path: str):
        pts, vel, pres = read_physics_csv(phys_path, self.pressure_col)
        # normalize pressure BEFORE mapping (reference order, :960-963 then :965)
        pres = pres - np.min(pres)
        pres = pres / np.max(pres)
        idx = map_physics_to_mesh(mesh.points.astype(np.float64), pts)
        vel, pres = vel[idx], pres[idx]
        vel = vel / np.max(np.abs(vel))  # :976
        return vel.astype(np.float32), pres.astype(np.float32)

    def process(self):
        meta = {"num_meshes": 0}
        for i, name in enumerate(self.raw_file_names):
            paths = self.case_paths(name)
            if not os.path.exists(paths["high_mesh"]):
                print(f"File {paths['high_mesh']} does not exist.")  # :905-907
                continue
            high = read_cas_h5(paths["high_mesh"])
            v_hi, p_hi = self._load_case_fields(high, paths["high_phys"])

            low = read_cas_h5(paths["low_mesh"])
            v_lo, p_lo = self._load_case_fields(low, paths["low_phys"])

            # Gaussian low->high interpolation (:1078-1094), renormalized (:1008-1011)
            fields = np.concatenate([v_lo, p_lo], axis=1)
            interp = gaussian_interpolate_host(
                low.points.astype(np.float64), fields,
                high.points.astype(np.float64), radius=self.gauss_radius,
                sharpness=GAUSS_SHARPNESS)
            v_in, p_in = _renormalize_interp(interp, f"case {name}",
                                             pressure_shift=True)

            cell_sets = high.cell_point_sets()
            cells, uniform = _stack_cells(cell_sets)

            mesh_idx = meta["num_meshes"]
            np.savez(os.path.join(self.processed_dir, f"mesh_{mesh_idx}.npz"),
                     points=high.points, cells=cells,
                     x=np.concatenate([v_in, p_in], 1).astype(np.float32),
                     y=np.concatenate([v_hi, p_hi], 1).astype(np.float32),
                     wall_idx=high.wall_node_indices())
            # annotated high-res VTU (:1032-1036)
            from .tensorize import infer_cell_types
            write_vtu(os.path.join(self.processed_dir, f"mesh_{mesh_idx}_high.vtu"),
                      high.points,
                      cells if uniform else cell_sets,
                      infer_cell_types(cell_sets),
                      point_data={"velocity": v_hi, "pressure": p_hi,
                                  "interpolated_velocity": v_in,
                                  "interpolated_pressure": p_in})
            meta["num_meshes"] += 1
        np.savez(self._processed_marker(), **meta)

    def build_partitions(self):
        with h5py.File(self.partition_path(), "w") as f:
            for i in range(self.num_meshes):
                d = np.load(os.path.join(self.processed_dir, f"mesh_{i}.npz"),
                            allow_pickle=True)
                subs = extract_subdomains(d["points"], d["cells"], d["x"], d["y"],
                                          self.sub_size, self.boundary_mode)
                g = f.create_group(f"mesh_{i}")
                for j, sub in enumerate(subs):
                    self._write_subdomain(g.create_group(f"subdomain_{j}"), sub)
        self._mesh_counts_cache = None  # rebuilt partitions invalidate counts

    @property
    def num_meshes(self) -> int:
        with np.load(self._processed_marker()) as z:
            return int(z["num_meshes"])

    def _mesh_counts(self) -> list[tuple[str, int]]:
        """(mesh key, subdomain count) per mesh, cached: the partition h5 is
        immutable after build_partitions, and re-enumerating every group's
        keys on each get() paid O(meshes x subdomains) h5 metadata scans per
        sample (hot in training ETL)."""
        cached = getattr(self, "_mesh_counts_cache", None)
        if cached is None:
            with self._h5() as f:
                cached = [(k, len(f[k].keys()))
                          for k in sorted(f.keys(),
                                          key=lambda s: int(s.split("_")[1]))]
            self._mesh_counts_cache = cached
        return cached

    def __len__(self):
        return sum(n for _, n in self._mesh_counts())

    def mesh_subdomain_indices(self, mesh_idx: int) -> np.ndarray:
        """Flat dataset indices of one mesh's subdomains — lets callers build
        mesh-level train/held-out splits (e.g. the ``train_meshes`` exp-config
        key; capability absent from the reference, which always trains on the
        full dataset)."""
        start = 0
        for key, n in self._mesh_counts():
            if key == f"mesh_{mesh_idx}":
                return np.arange(start, start + n, dtype=np.int64)
            start += n
        raise IndexError(f"mesh_{mesh_idx} not in partition cache")

    def get(self, idx: int) -> dict:
        """Flat subdomain indexing across meshes (cf. GraphDataset.py:772-797;
        the reference's hardcoded 4-subdomain assumption at :776-780 is a bug —
        we index by actual counts, SURVEY §7 'build the intended behavior')."""
        for key, n in self._mesh_counts():
            if idx < n:
                with self._h5() as f:
                    return self._read_subdomain(f[key][f"subdomain_{idx}"])
            idx -= n
        raise IndexError("subdomain index out of range")

    def get_one_full_sample(self, idx: int) -> list[dict]:
        """All subdomains of mesh ``idx`` (GraphDataset.py:1464-1484)."""
        with self._h5() as f:
            if f"mesh_{idx}" not in f:
                raise IndexError(f"Mesh index {idx} out of range.")
            g = f[f"mesh_{idx}"]
            return [self._read_subdomain(g[f"subdomain_{i}"])
                    for i in range(len(g.keys()))]

    def full_mesh(self, idx: int) -> dict:
        d = np.load(os.path.join(self.processed_dir, f"mesh_{idx}.npz"),
                    allow_pickle=True)
        return {k: d[k] for k in d.files}


class DuctAnalysisDataset(_PartitionedGraphDataset):
    """Legacy duct workload: single high/med/low .msh + CSV pair
    (GraphDataset.py:196-748).  Flat ``subdomain_{i}`` h5 groups (:615-620),
    non-overlapping partitions (:565)."""

    pressure_col = COL_P_DUCT
    norm_style = "duct"
    boundary_mode = "one_region"

    def __init__(self, root: str, partition: bool = True, sub_size: int = 4,
                 load_case: int = 100, **kwargs):
        # the reference raw set carries both 100%% and 25%% load-case CSVs
        # (GraphDataset.py:229-231); load_case selects which pair feeds ETL
        self.load_case = int(load_case)
        super().__init__(root, partition, sub_size, **kwargs)

    @property
    def raw_file_names(self) -> list[str]:
        lc = getattr(self, "load_case", 100)
        return ["Mesh_Output_High.msh", "Mesh_Output_Med.msh", "Mesh_Output_Low.msh",
                f"Output_Summary_High_{lc}", f"Output_Summary_Med_{lc}",
                f"Output_Summary_Low_{lc}"]  # :229-231

    def process(self):
        high = read_msh(os.path.join(self.raw_dir, self.raw_file_names[0]))
        med = read_msh(os.path.join(self.raw_dir, self.raw_file_names[1]))

        def fields_for(mesh, phys_name):
            pts, vel, pres = read_physics_csv(os.path.join(self.raw_dir, phys_name),
                                              self.pressure_col)
            pres = pres / np.max(pres)  # :368
            idx = map_physics_to_mesh(mesh.points.astype(np.float64), pts)
            vel, pres = vel[idx], pres[idx]
            vel = vel / np.max(np.abs(vel))  # :381
            return vel.astype(np.float32), pres.astype(np.float32)

        v_hi, p_hi = fields_for(high, self.raw_file_names[3])
        v_md, p_md = fields_for(med, self.raw_file_names[4])

        spacing = float(np.max(np.ptp(med.points, axis=0)) /
                        max(np.cbrt(len(med.points)), 1.0))
        interp = gaussian_interpolate_host(
            med.points.astype(np.float64), np.concatenate([v_md, p_md], 1),
            high.points.astype(np.float64), radius=3 * spacing,
            sharpness=GAUSS_SHARPNESS)
        v_in, p_in = _renormalize_interp(interp, "duct mesh",
                                         pressure_shift=False)

        cell_sets = high.cell_point_sets()
        cells, uniform = _stack_cells(cell_sets)
        np.savez(os.path.join(self.processed_dir, "mesh_0.npz"),
                 points=high.points, cells=cells,
                 x=np.concatenate([v_in, p_in], 1).astype(np.float32),
                 y=np.concatenate([v_hi, p_hi], 1).astype(np.float32),
                 wall_idx=high.wall_node_indices())
        np.savez(self._processed_marker(), num_meshes=1)

    def build_partitions(self):
        d = np.load(os.path.join(self.processed_dir, "mesh_0.npz"), allow_pickle=True)
        subs = extract_subdomains(d["points"], d["cells"], d["x"], d["y"],
                                  self.sub_size, self.boundary_mode)
        with h5py.File(self.partition_path(), "w") as f:
            for i, sub in enumerate(subs):
                self._write_subdomain(f.create_group(f"subdomain_{i}"), sub)

    def __len__(self):
        with self._h5() as f:
            return len(f.keys())

    def get(self, idx: int) -> dict:
        with self._h5() as f:
            return self._read_subdomain(f[f"subdomain_{idx}"])

    def get_one_full_sample(self, idx: int = 0) -> list[dict]:
        with self._h5() as f:
            return [self._read_subdomain(f[f"subdomain_{i}"])
                    for i in range(len(f.keys()))]

    def full_mesh(self, idx: int = 0) -> dict:
        d = np.load(os.path.join(self.processed_dir, "mesh_0.npz"), allow_pickle=True)
        return {k: d[k] for k in d.files}

    @property
    def num_meshes(self) -> int:
        return 1


class SyntheticDataset(AnsysDataset):
    """Self-contained workload: generates CFF + CSV raw files for four duct
    variants, then runs the exact AnsysDataset ETL.  Used by tests, the
    runnable quickstart, and bench.py."""

    def __init__(self, root: str, partition: bool = True, sub_size: int = 4,
                 n_high=(16, 8, 8), n_low=(8, 4, 4), num_cases: int = 4,
                 aspect_seed: int | None = None, bend: bool = False, **kwargs):
        self._n_high, self._n_low = tuple(n_high), tuple(n_low)
        self._num_cases = int(num_cases)
        self._aspect_seed = aspect_seed  # None -> deterministic aspect ladder
        # bend=True: cases become circular-arc bent ducts — the named cases
        # use their literal angle ("20degree" -> 20), extras draw 0-70 deg
        self._bend = bool(bend)
        # obstacle=True: each case gets an immersed-cylinder blockage with
        # randomized center/radius (synthetic.obstacle_deflect) — cross-flow
        # deflection + Bernoulli pressure structure the aspect/bend variants
        # lack.  An int k > 1 places k obstacles per case in disjoint axial
        # segments (deflections composed sequentially — the downstream body
        # sees the upstream body's wake field); k == 1 / True keeps the
        # round-2 RNG sequence so existing caches rebuild bit-identically.
        _obs = kwargs.pop("obstacle", False)
        self._n_obstacles = int(_obs)
        self._obstacle = self._n_obstacles > 0
        # vary_resolution=True: each case scales n_high by 0.75-1.5x (n_low
        # keeps the 2x ratio) so training spans mesh densities — the remedy
        # for cross-resolution transfer (BASELINE.md "honest limitation")
        self._vary_resolution = bool(kwargs.pop("vary_resolution", False))
        # synthetic duct spacing >> the reference's 0.036 ANSYS radius
        self.gauss_radius = 1.5 * 2.0 / max(n_low[0] - 1, 1)
        super().__init__(root, partition, sub_size, **kwargs)

    @property
    def raw_file_names(self) -> list[str]:
        base = ["0degree", "20degree", "40degree", "60degree"]
        n = getattr(self, "_num_cases", 4)
        if n <= 4:
            return base[:n]
        return base + [f"case{i}" for i in range(4, n)]

    def _case_aspect(self, i: int) -> float:
        if self._aspect_seed is not None:
            rng = np.random.default_rng(self._aspect_seed + i)
            return float(0.4 + 0.4 * rng.random())
        return 0.5 + 0.08 * i  # the original 4-case ladder

    def _case_bend_deg(self, i: int, name: str,
                       rng: np.random.Generator) -> float:
        if name.endswith("degree"):
            return float(name[:-len("degree")])  # the reference's case names
        return float(rng.uniform(0.0, 70.0))

    def prepare_raw(self):
        from .synthetic import (bend_duct, duct_field, make_duct_mesh,
                                obstacle_deflect)

        os.makedirs(self.raw_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        bend_rng = np.random.default_rng(
            1 if self._aspect_seed is None else self._aspect_seed + 1000)
        res_rng = np.random.default_rng(
            2 if self._aspect_seed is None else self._aspect_seed + 2000)
        obs_rng = np.random.default_rng(
            3 if self._aspect_seed is None else self._aspect_seed + 3000)
        for i, name in enumerate(self.raw_file_names):
            # vary the aspect per case so cases differ even unbent
            ly = self._case_aspect(i)
            bend = (self._case_bend_deg(i, name, bend_rng)
                    if self._bend else 0.0)
            n_high, n_low = self._n_high, self._n_low
            if self._vary_resolution:
                s = float(res_rng.uniform(0.75, 1.5))
                n_high = tuple(max(3, int(round(n * s))) for n in self._n_high)
                n_low = tuple(max(2, n // 2) for n in n_high)
            high = make_duct_mesh(*n_high, ly=ly)
            low = make_duct_mesh(*n_low, ly=ly)
            paths = self.case_paths(name)
            # fields + geometry first (no RNG): bend AFTER solving on the
            # straight duct — the series solution lives in straight
            # coordinates; velocity rotates with the local frame
            # (synthetic.py:bend_duct)
            obs_list = []
            if self._obstacle:
                # obstacles are part of the geometry (like the bend angle):
                # identical for high/low meshes.  k == 1 keeps the round-2
                # draw ranges/order exactly; k > 1 confines each body to its
                # own axial segment of the duct (x in [0.3, 1.7])
                k = self._n_obstacles
                for j in range(k):
                    if k == 1:
                        x_lo, x_hi = 0.5, 1.5
                    else:
                        seg = 1.4 / k
                        x_lo = 0.3 + seg * (j + 0.15)
                        x_hi = 0.3 + seg * (j + 0.85)
                    obs_list.append(
                        (float(obs_rng.uniform(x_lo, x_hi)),          # center x
                         float(obs_rng.uniform(0.35, 0.65) * ly),     # center y
                         float(obs_rng.uniform(0.12, 0.22) * ly
                               / max(1, (k + 1) // 2))))              # radius
            fields = {}
            for key, mesh in (("high", high), ("low", low)):
                v, p = duct_field(mesh.points, ly=ly)
                pts = mesh.points
                for obs in obs_list:
                    v, p = obstacle_deflect(pts, v, p, *obs)
                if bend:
                    pts, v = bend_duct(pts, v, lx=2.0, bend_deg=bend)
                fields[key] = (pts, v, p)
            write_cas_h5(paths["high_mesh"],
                         mesh_from_cells(fields["high"][0], high.cells))
            write_cas_h5(paths["low_mesh"],
                         mesh_from_cells(fields["low"][0], low.cells))
            # RNG draws stay in the original per-mesh order (noise, perm per
            # mesh) so unbent datasets rebuild bit-identically to round-1
            for key, phys in (("high", paths["high_phys"]),
                              ("low", paths["low_phys"])):
                pts, v, p = fields[key]
                v = v + 0.01 * rng.normal(size=v.shape).astype(np.float32)
                # physics rows shuffled to exercise the KDTree mapping
                perm = rng.permutation(len(pts))
                write_physics_csv(phys, pts[perm], v[perm], p[perm],
                                  self.pressure_col)


def init_dataset(name: str, root: str, **kwargs):
    """Dataset factory (reference utils.py:46-52 + synthetic extension)."""
    if name == "duct":
        return DuctAnalysisDataset(root=root, **kwargs)
    elif name == "ansys":
        return AnsysDataset(root=root, **kwargs)
    elif name == "synthetic":
        return SyntheticDataset(root=root, **kwargs)
    elif name == "turbulence_grid":
        from .grid_dataset import TurbulenceGridDataset
        return TurbulenceGridDataset(root=root, **kwargs)
    elif name == "advected_grid":
        from .grid_dataset import AdvectedScalarDataset
        return AdvectedScalarDataset(root=root, **kwargs)
    elif name == "advected3d_grid":
        from .grid_dataset import AdvectedScalar3DDataset
        return AdvectedScalar3DDataset(root=root, **kwargs)
    elif name == "darcy_grid":
        from .grid_dataset import DarcyFlowDataset
        return DarcyFlowDataset(root=root, **kwargs)
    elif name == "ns_grid":
        from .grid_dataset import NavierStokesDataset
        return NavierStokesDataset(root=root, **kwargs)
    elif name == "ns3d_grid":
        from .grid_dataset import NSSpacetimeDataset
        return NSSpacetimeDataset(root=root, **kwargs)
    elif name == "ns_rollout":
        from .grid_dataset import NSRolloutDataset
        return NSRolloutDataset(root=root, **kwargs)
    elif name == "advected_rollout":
        from .grid_dataset import AdvectedRolloutDataset
        return AdvectedRolloutDataset(root=root, **kwargs)
    elif name == "advected3d_rollout":
        from .grid_dataset import AdvectedRollout3DDataset
        return AdvectedRollout3DDataset(root=root, **kwargs)
    elif name == "mat_grid":
        from .mat_dataset import MatGridDataset
        return MatGridDataset(root=root, **kwargs)
    elif name == "burgers_grid":
        from .grid_dataset import BurgersDataset
        return BurgersDataset(root=root, **kwargs)
    else:
        raise ValueError(f"Invalid dataset name: {name}")
