"""Grid pipeline tests: synthetic turbulence dataset + FNO training."""

import numpy as np
import pytest


def test_turbulence_dataset(tmp_path):
    from fast_eng_super_resolution_tpu.data.grid_dataset import TurbulenceGridDataset

    ds = TurbulenceGridDataset(str(tmp_path), num_samples=4, resolution=32,
                               downsample=4)
    assert len(ds) == 4
    s = ds[0]
    assert s["x"].shape == (32, 32, 2) and s["y"].shape == (32, 32, 2)
    # low-res input is smoother: less high-frequency energy
    def hf_energy(f):
        fh = np.fft.fft2(f[..., 0])
        n = f.shape[0]
        return float(np.sum(np.abs(fh[n // 4: 3 * n // 4, :]) ** 2))
    assert hf_energy(s["x"]) < 0.5 * hf_energy(s["y"])
    # and still correlated with the target
    cc = np.corrcoef(s["x"].ravel(), s["y"].ravel())[0, 1]
    assert cc > 0.5


def test_fno_trains_on_turbulence(tmp_path):
    import jax

    from fast_eng_super_resolution_tpu.data.grid_dataset import TurbulenceGridDataset
    from fast_eng_super_resolution_tpu.models.fno import FNO2d
    from fast_eng_super_resolution_tpu.parallel.grid_train import GridTrainer

    ds = TurbulenceGridDataset(str(tmp_path), num_samples=8, resolution=32,
                               downsample=4)
    x = np.stack([ds[i]["x"] for i in range(8)])
    y = np.stack([ds[i]["y"] for i in range(8)])

    model = FNO2d(modes1=8, modes2=8, width=16, in_feats=2)
    trainer = GridTrainer(model, lr=5e-3, out_channels=2)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), x)
    assert "proj" in params  # 128 -> 2 projection added

    first = trainer.evaluate(params, x, y)
    for _ in range(120):
        params, opt_state, loss = trainer.step(params, opt_state, x, y)
    last = trainer.evaluate(params, x, y)
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)

    pred = np.asarray(trainer.predict(params, x))
    assert pred.shape == y.shape


def test_advected_scalar_dataset(tmp_path):
    """Deterministic advected-scalar pairs: learnable structure (coarse and
    fine runs share IC + resolved velocity), periodic semi-Lagrangian
    stepping stays finite and bounded, cache round-trips."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        AdvectedScalarDataset, advected_scalar_pair)

    rng = np.random.default_rng(3)
    x, y = advected_scalar_pair(32, rng, factor=4, steps=20)
    assert x.shape == y.shape == (32, 32, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    # strongly correlated (same resolved dynamics) but not identical
    cc = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    assert cc > 0.9, cc
    assert ((x - y) ** 2).mean() > 1e-8
    # advection conserves the scalar's bounds (semi-Lagrangian interpolation
    # cannot create new extrema)
    assert y.max() <= 1.0 + 1e-5 and y.min() >= -1e-5

    ds = AdvectedScalarDataset(str(tmp_path), num_samples=4, resolution=32,
                               steps=10)
    assert len(ds) == 4 and ds[0]["x"].shape == (32, 32, 1)
    ds2 = AdvectedScalarDataset(str(tmp_path))  # reload from cache
    np.testing.assert_array_equal(ds2[1]["y"], ds[1]["y"])
