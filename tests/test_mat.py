"""External .mat operator-dataset loader (the FNO literature's layout).

The checked-in fixture tests/fixtures/darcy_sample_r32_N12.mat uses the
literature's key names (coeff/sol, like piececonst_r421_N1024_*.mat); the
v7.3 path is exercised with an h5py-written file storing MATLAB
column-major (transposed) arrays.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "darcy_sample_r32_N12.mat")


def test_mat_sr_task_shapes_and_baseline():
    from fast_eng_super_resolution_tpu.data.mat_dataset import MatGridDataset

    ds = MatGridDataset(os.path.dirname(FIXTURE),
                        mat_file=os.path.basename(FIXTURE), downsample=4)
    assert len(ds) == 12 and ds.resolution == 32
    s = ds[0]
    assert s["x"].shape == (32, 32, 2) and s["y"].shape == (32, 32, 1)
    # channel 0 is the downsampled/upsampled solution: a nonzero but small
    # baseline error vs the target (the improvement denominator)
    base_mse = float(((s["x"][..., :1] - s["y"]) ** 2).mean())
    assert 0 < base_mse < float((s["y"] ** 2).mean())
    # coefficient channel normalized to [-0.5, 0.5]
    assert abs(s["x"][..., 1]).max() <= 0.5 + 1e-6


def test_mat_upsample_aligned_at_subsample_points():
    """The SR coarse channel is a point subsample fine[::d]; the upsample
    query must reproduce the subsampled values at their own fine indices
    (up[j*d] == fine[j*d]) — the round-4 advisor caught a cell-centered
    query that shifted the interpolant by (d-1)/2 fine pixels."""
    from fast_eng_super_resolution_tpu.data.mat_dataset import \
        _upsample_clamped

    rng = np.random.default_rng(3)
    d = 4
    # 1D
    fine = rng.standard_normal(32)
    up = _upsample_clamped(fine[::d], 32, d)
    np.testing.assert_allclose(up[::d], fine[::d], rtol=0, atol=1e-12)
    # 2D
    fine2 = rng.standard_normal((32, 32))
    up2 = _upsample_clamped(fine2[::d, ::d], 32, d)
    np.testing.assert_allclose(up2[::d, ::d], fine2[::d, ::d], atol=1e-12)
    # linear fields are reproduced exactly everywhere (interior)
    lin = np.arange(32, dtype=np.float64)
    np.testing.assert_allclose(_upsample_clamped(lin[::d], 32, d)[:29],
                               lin[:29], atol=1e-12)


def test_mat_v73_hdf5_transpose(tmp_path):
    """MATLAB v7.3 files store column-major: an h5py-written [s, s, N]
    dataset must load as the same [N, s, s] fields scipy gives."""
    import h5py
    import scipy.io as sio

    from fast_eng_super_resolution_tpu.data.mat_dataset import load_mat_arrays

    ref = sio.loadmat(FIXTURE)
    p = str(tmp_path / "v73.mat")
    with h5py.File(p, "w") as f:
        f.create_dataset("coeff", data=np.ascontiguousarray(ref["coeff"].T))
        f.create_dataset("sol", data=np.ascontiguousarray(ref["sol"].T))
    got = load_mat_arrays(p, ["coeff", "sol"])
    np.testing.assert_allclose(got["sol"], ref["sol"], rtol=1e-6)
    np.testing.assert_allclose(got["coeff"], ref["coeff"], rtol=1e-6)


def test_mat_operator_task_and_factory():
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset

    ds = init_dataset("mat_grid", os.path.dirname(FIXTURE),
                      mat_file=os.path.basename(FIXTURE), task="operator",
                      num_samples=5)
    assert len(ds) == 5
    s = ds[0]
    assert s["x"].shape == (32, 32, 1) and s["y"].shape == (32, 32, 1)
    assert ds.downsample is None


def test_mat_1d_burgers_layout(tmp_path):
    """Burgers-style [N, s] arrays (keys a/u) load as 1D grid samples."""
    import scipy.io as sio

    from fast_eng_super_resolution_tpu.data.mat_dataset import MatGridDataset

    rng = np.random.default_rng(0)
    xg = np.linspace(0, 1, 64, endpoint=False)
    a = np.stack([np.sin(2 * np.pi * (xg + rng.random())) for _ in range(4)])
    u = 0.5 * a + 0.1
    p = str(tmp_path / "burgers.mat")
    sio.savemat(p, {"a": a, "u": u})
    ds = MatGridDataset(str(tmp_path), mat_file="burgers.mat", input_key="a",
                        target_key="u", downsample=4)
    s = ds[0]
    assert s["x"].shape == (64, 2) and s["y"].shape == (64, 1)
    # smooth field: the 4x-downsampled baseline still tracks the target
    assert ((s["x"][..., :1] - s["y"]) ** 2).mean() < 0.02


def test_mat_errors():
    from fast_eng_super_resolution_tpu.data.mat_dataset import MatGridDataset

    with pytest.raises(KeyError, match="missing key"):
        MatGridDataset(os.path.dirname(FIXTURE),
                       mat_file=os.path.basename(FIXTURE), input_key="nope")
    with pytest.raises(FileNotFoundError, match="no .mat"):
        MatGridDataset("/tmp/definitely-empty-dir-xyz")
    with pytest.raises(ValueError, match="divisible"):
        MatGridDataset(os.path.dirname(FIXTURE),
                       mat_file=os.path.basename(FIXTURE), downsample=5)


def test_mat_train_pred_end_to_end(tmp_path):
    """Train/pred through the grid runners on the external-format sample —
    the quality lane BASELINE.md's external-format row uses."""
    from fast_eng_super_resolution_tpu.data.mat_dataset import MatGridDataset
    from fast_eng_super_resolution_tpu.grid_runner import pred_grid, train_grid
    from fast_eng_super_resolution_tpu.models.fno import FNO2d

    ds = MatGridDataset(os.path.dirname(FIXTURE),
                        mat_file=os.path.basename(FIXTURE), downsample=4)
    model = FNO2d(modes1=8, modes2=8, width=12, in_feats=2)
    exp = dict(train_samples=8, idxs=[9], seed=0)
    log_dir = str(tmp_path / "logs")
    train_grid("mat", model, ds, dict(epochs=3, batch_size=4, lr=2e-3,
                                      val_interval=1), exp, log_dir=log_dir)
    outs = pred_grid([9], "mat", model, ds, exp, log_dir=log_dir)
    with np.load(outs[0]) as z:
        assert np.isfinite(z["pred"]).all()
