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


def test_spectral_conv_matmul_parity():
    """FFT-free matmul-DFT spectral conv == jnp.fft path (values + grads).

    The matmul form is the TPU production path (models/fno.py docstring);
    parity vs jnp.fft covers rfft2/irfft2 truncation semantics including the
    overwrite-free row split and irfft's ignored DC/Nyquist imaginary parts.
    """
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import (
        _spectral_conv, _spectral_conv_matmul, _spectral_init)

    key = jax.random.PRNGKey(0)
    # (73,73) = advected grid + padding 9; (26,24) hits the even-W Nyquist col
    for h, w, m1, m2 in [(73, 73, 12, 12), (26, 24, 13, 13)]:
        p = _spectral_init(key, 4, 6, m1, m2)
        x = jax.random.normal(jax.random.fold_in(key, h), (2, 4, h, w))
        a = _spectral_conv(p, x, m1, m2)
        b = _spectral_conv_matmul(p, x, m1, m2)
        assert float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a)) < 1e-5

        ga = jax.grad(lambda p, x: jnp.sum(_spectral_conv(p, x, m1, m2) ** 2),
                      argnums=(0, 1))(p, x)
        gb = jax.grad(lambda p, x: jnp.sum(_spectral_conv_matmul(p, x, m1, m2) ** 2),
                      argnums=(0, 1))(p, x)
        for ta, tb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            denom = float(jnp.linalg.norm(ta)) or 1.0
            assert float(jnp.linalg.norm(ta - tb)) / denom < 1e-4


def test_fno_model_impl_parity():
    """Full FNO2d forward identical across spectral impls (same params)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO2d

    m_fft = FNO2d(modes1=8, modes2=8, width=12, in_feats=2, spectral_impl="fft")
    m_mm = FNO2d(modes1=8, modes2=8, width=12, in_feats=2, spectral_impl="matmul")
    params = m_fft.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 24, 2))
    ya, yb = m_fft.apply(params, x), m_mm.apply(params, x)
    assert float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya)) < 1e-5


def test_spectral_matmul_too_small_raises():
    import jax
    import pytest as _pytest

    from fast_eng_super_resolution_tpu.models.fno import (
        _spectral_conv_matmul, _spectral_init)

    p = _spectral_init(jax.random.PRNGKey(0), 2, 2, 12, 12)
    x = jax.numpy.zeros((1, 2, 20, 24))  # H < 2*m1
    with _pytest.raises(ValueError, match="too small"):
        _spectral_conv_matmul(p, x, 12, 12)


def test_darcy_solver_manufactured_solution():
    """Constant-coefficient solve converges to the analytic Poisson solution
    u = sin(pi x) sin(pi y) (f = 2 pi^2 a u) at cell centers, and the error
    shrinks with resolution."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import solve_darcy

    errs = []
    for n in (16, 32):
        a = np.full((n, n), 2.0)
        xc = (np.arange(n) + 0.5) / n
        exact = np.sin(np.pi * xc)[:, None] * np.sin(np.pi * xc)[None, :]
        u = solve_darcy(a, f=2.0 * np.pi ** 2 * 2.0 * exact)
        errs.append(float(np.abs(u - exact).max() / exact.max()))
    assert errs[0] < 0.05 and errs[1] < errs[0], errs


def test_darcy_pair_and_dataset(tmp_path):
    """Darcy pairs: correct shapes, positive interior solution, coarse
    channel correlated with (but smoother than) the fine truth, coefficient
    channel binary; dataset caches and round-trips."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        DarcyFlowDataset, darcy_pair)

    rng = np.random.default_rng(0)
    x, y = darcy_pair(32, rng, factor=4)
    assert x.shape == (32, 32, 2) and y.shape == (32, 32, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert y.max() <= 1.0 + 1e-6 and y.min() >= 0.0  # normalized, positive
    assert set(np.round(np.unique(x[..., 1]), 3)) == {-0.5, 0.5}
    cc = np.corrcoef(x[..., 0].ravel(), y[..., 0].ravel())[0, 1]
    assert cc > 0.8, cc  # coarse solve is a strong but imperfect baseline
    base_mse = float(((x[..., 0] - y[..., 0]) ** 2).mean())
    assert base_mse > 1e-6  # room for the model to improve

    ds = DarcyFlowDataset(str(tmp_path), num_samples=3, resolution=16,
                          downsample=4)
    assert len(ds) == 3 and ds[1]["x"].shape == (16, 16, 2)
    ds2 = DarcyFlowDataset(str(tmp_path), num_samples=3, resolution=16)
    assert np.array_equal(ds2[1]["x"], ds[1]["x"])  # served from cache


def test_darcy_factory_and_pred_baseline(tmp_path):
    """darcy_grid factory name resolves; pred_grid's improvement baseline
    uses only the field channels when inputs carry aux channels (the
    coefficient field)."""
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset

    ds = init_dataset("darcy_grid", str(tmp_path), num_samples=2,
                      resolution=16, downsample=4)
    s = ds[0]
    assert s["x"].shape[-1] == 2 and s["y"].shape[-1] == 1


def test_ns_solver_physics():
    """Pseudo-spectral NS: inviscid unforced advection conserves enstrophy
    (dealiased scheme, ~1e-6); viscosity decays it."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        _low_mode_vorticity, simulate_ns_vorticity)

    rng = np.random.default_rng(0)
    w0 = _low_mode_vorticity(32, rng)
    w1 = simulate_ns_vorticity(w0, t_end=0.5, nu=0.0, forcing_amp=0.0)
    r = float((w1 ** 2).mean() / (w0 ** 2).mean())
    assert abs(r - 1.0) < 1e-4, r
    w2 = simulate_ns_vorticity(w0, t_end=0.5, nu=1e-2, forcing_amp=0.0)
    assert float((w2 ** 2).mean()) < 0.8 * float((w0 ** 2).mean())


def test_ns_pair_and_dataset(tmp_path):
    """NS pairs: correct shapes, coarse channel correlated-but-imperfect
    (genuine super-resolution headroom), IC channel low-mode; dataset
    caches; factory name resolves."""
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset
    from fast_eng_super_resolution_tpu.data.grid_dataset import ns_vorticity_pair

    rng = np.random.default_rng(0)
    x, y = ns_vorticity_pair(32, rng, factor=4, t_end=1.0, dt=1e-2)
    assert x.shape == (32, 32, 2) and y.shape == (32, 32, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    cc = np.corrcoef(x[..., 0].ravel(), y[..., 0].ravel())[0, 1]
    assert cc > 0.5, cc
    assert float(((x[..., 0] - y[..., 0]) ** 2).mean()) > 1e-5
    # IC channel is spectrally low-mode: no energy above mode 3
    ic_hat = np.fft.fft2(x[..., 1])
    k = np.abs(np.fft.fftfreq(32, 1.0 / 32))
    hi_mask = (k[:, None] > 3.5) | (k[None, :] > 3.5)
    assert np.abs(ic_hat[hi_mask]).max() < 1e-3 * np.abs(ic_hat).max()

    ds = init_dataset("ns_grid", str(tmp_path), num_samples=2, resolution=16,
                      t_end=0.5)
    assert len(ds) == 2 and ds[0]["x"].shape == (16, 16, 2)
