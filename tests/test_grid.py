"""Grid pipeline tests: synthetic turbulence dataset + FNO training."""

import os

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
    # reload from cache: identical generation params -> served, not rebuilt
    ds2 = AdvectedScalarDataset(str(tmp_path), num_samples=4, resolution=32,
                                steps=10)
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


def test_darcy_factory_and_pred_baseline(tmp_path, capsys):
    """darcy_grid factory name resolves, and pred_grid's improvement
    baseline uses ONLY the field channels when inputs carry aux channels
    (the coefficient field) — driven through pred_grid itself: if the aux
    channel leaked into the baseline, (16,16,2)-(16,16,1) broadcasting
    would average the coefficient error in and the printed value would
    differ from the field-only expectation."""
    import re

    import jax

    from fast_eng_super_resolution_tpu.core import checkpoint as ckpt
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset
    from fast_eng_super_resolution_tpu.grid_runner import (_collection_path,
                                                           pred_grid)
    from fast_eng_super_resolution_tpu.models.registry import init_model

    ds = init_dataset("darcy_grid", str(tmp_path), num_samples=2,
                      resolution=16, downsample=4)
    s = ds[1]
    assert s["x"].shape[-1] == 2 and s["y"].shape[-1] == 1

    from fast_eng_super_resolution_tpu.parallel.grid_train import GridTrainer

    model = init_model("fno", 4, 4, width=8, in_feats=2)
    params, _ = GridTrainer(model, lr=0.0, out_channels=1).init(
        jax.random.PRNGKey(0), s["x"][None])
    log_dir = str(tmp_path / "logs")
    ckpt.save_params(_collection_path(log_dir, "dtest"), params)
    outs = pred_grid([1], "dtest", model, ds, {}, log_dir=log_dir)
    assert os.path.exists(outs[0])
    printed = capsys.readouterr().out
    base = float(re.search(r"baseline MSE ([0-9.e+-]+)", printed).group(1))
    want = float(((s["x"][..., :1] - s["y"]) ** 2).mean())
    assert abs(base - want) <= 1e-6 * max(want, 1e-12), (base, want)


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

    # downsample=2: the 8x8 coarse grid is the smallest that resolves the
    # default max_mode=3 IC (the Nyquist guard rejects 16/4 -> 4x4)
    ds = init_dataset("ns_grid", str(tmp_path), num_samples=2, resolution=16,
                      downsample=2, t_end=0.5)
    assert len(ds) == 2 and ds[0]["x"].shape == (16, 16, 2)


def test_ns_nyquist_guard():
    """A coarse grid too small for the excited IC modes aliases them — the
    learnability precondition breaks silently, so the pair generators must
    reject it (review finding: 16/4 -> 4x4 coarse grid vs max_mode=3)."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        advected_scalar_pair, ns_vorticity_pair)

    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="aliases"):
        ns_vorticity_pair(16, rng, factor=4)
    with pytest.raises(ValueError, match="aliases"):
        advected_scalar_pair(16, rng, factor=4)
    ns_vorticity_pair(16, rng, factor=4, max_mode=1, t_end=0.1)  # resolvable


def test_grf_spectrum_exponent():
    """The Darcy coefficient GRF realizes covariance (-lap+tau^2)^(-alpha):
    band-averaged power at wavenumbers k and 2k must fall off with exponent
    -alpha (the review caught a -2*alpha realization — filtering white noise
    by C rather than C^(1/2))."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import _grf_sample

    tau, alpha, n = 3.0, 2.0, 256
    rng = np.random.default_rng(0)
    p = np.zeros((n, n))
    for _ in range(8):
        g = _grf_sample(n, rng, tau=tau, alpha=alpha)
        p += np.abs(np.fft.fft2(g)) ** 2
    k = np.abs(np.fft.fftfreq(n, 1.0 / n))
    kr = np.sqrt(k[:, None] ** 2 + k[None, :] ** 2)

    def band(k0):
        m = (kr > 0.9 * k0) & (kr < 1.1 * k0)
        return float(p[m].mean())

    for k0 in (8.0, 16.0):
        got = band(k0) / band(2 * k0)
        want = ((4 * np.pi ** 2 * (2 * k0) ** 2 + tau ** 2)
                / (4 * np.pi ** 2 * k0 ** 2 + tau ** 2)) ** alpha
        assert abs(got / want - 1.0) < 0.25, (k0, got, want)


def test_grid_cache_param_keying(tmp_path):
    """Changing any generation parameter regenerates the npz cache instead
    of serving stale physics under the new config's name (review finding:
    caches were keyed by root path only)."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import DarcyFlowDataset

    ds = DarcyFlowDataset(str(tmp_path), num_samples=2, resolution=16,
                          downsample=4)
    ds2 = DarcyFlowDataset(str(tmp_path), num_samples=2, resolution=16,
                           downsample=2)
    assert not np.array_equal(ds.x, ds2.x)  # same shape, different physics
    ds3 = DarcyFlowDataset(str(tmp_path), num_samples=2, resolution=16,
                           downsample=2)
    assert np.array_equal(ds2.x, ds3.x)  # identical params -> cache hit


def test_train_grid_diverged_run_still_checkpoints(tmp_path):
    """A run whose val loss is never finite must still persist params
    (last-epoch) so pred_grid finds a checkpoint — like the graph
    scheduler's guard (review finding: FileNotFoundError at predict)."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import AdvectedScalarDataset
    from fast_eng_super_resolution_tpu.grid_runner import train_grid
    from fast_eng_super_resolution_tpu.models.registry import init_model

    ds = AdvectedScalarDataset(str(tmp_path), num_samples=8, resolution=16,
                               downsample=2, steps=4)
    model = init_model("fno", 4, 4, width=8, in_feats=1)
    cfg = dict(epochs=3, batch_size=4, lr=1e12,  # diverges immediately
               step_size=30, gamma=0.1, log_interval=5, val_interval=1)
    out = train_grid("diverge_t", model, ds,
                     cfg, {"train_samples": 6, "idxs": [6, 7]},
                     log_dir=str(tmp_path / "logs"))
    assert os.path.exists(out["ckpt"])


def test_advected_scalar3d_dataset(tmp_path):
    """Volumetric advected pairs: learnable structure, finite, bounded,
    cache round-trip, and factory dispatch via 'advected3d_grid'."""
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        AdvectedScalar3DDataset, advected_scalar3d_pair)

    rng = np.random.default_rng(3)
    x, y = advected_scalar3d_pair(16, rng, factor=2, steps=10)
    assert x.shape == y.shape == (16, 16, 16, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    cc = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    assert cc > 0.9, cc
    assert ((x - y) ** 2).mean() > 1e-8
    # semi-Lagrangian interpolation cannot create new extrema
    assert y.max() <= 1.0 + 1e-5 and y.min() >= -1e-5

    ds = init_dataset("advected3d_grid", str(tmp_path), num_samples=3,
                      resolution=16, steps=6)
    assert isinstance(ds, AdvectedScalar3DDataset)
    assert len(ds) == 3 and ds[0]["x"].shape == (16, 16, 16, 1)
    ds2 = AdvectedScalar3DDataset(str(tmp_path), num_samples=3,
                                  resolution=16, steps=6)
    np.testing.assert_array_equal(ds2[1]["y"], ds[1]["y"])


def test_low_mode_velocity_3d_divergence_free():
    """curl-of-potential construction: discrete spectral divergence ~ 0,
    and subsampling the fine velocity reproduces the coarse-grid field
    (the learnability precondition)."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        _solenoidal_low_mode_velocity_3d)

    rng = np.random.default_rng(0)
    u = _solenoidal_low_mode_velocity_3d(16, rng, max_mode=2)
    k = np.fft.fftfreq(16, 1.0 / 16)
    div_hat = (1j * k[:, None, None] * np.fft.fftn(u[..., 0])
               + 1j * k[None, :, None] * np.fft.fftn(u[..., 1])
               + 1j * k[None, None, :] * np.fft.fftn(u[..., 2]))
    assert np.abs(div_hat).max() < 1e-6 * np.abs(u).max() * 16 ** 3


def test_spectral_conv3d_matmul_parity():
    """3D matmul-DFT spectral conv == jnp.fft path (values + grads),
    including odd-W and even-W-Nyquist column cases."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import (
        _spectral_conv_3d, _spectral_conv3d_matmul, _spectral_init_3d)

    key = jax.random.PRNGKey(0)
    for d, h, w, m1, m2, m3 in [(12, 10, 14, 3, 2, 4), (8, 8, 8, 2, 2, 5),
                                (16, 12, 9, 4, 3, 3)]:
        p = _spectral_init_3d(key, 3, 4, m1, m2, m3)
        x = jax.random.normal(jax.random.fold_in(key, d), (2, 3, d, h, w))
        a = _spectral_conv_3d(p, x, m1, m2, m3)
        b = _spectral_conv3d_matmul(p, x, m1, m2, m3)
        assert float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a)) < 1e-5

        ga = jax.grad(lambda p, x: jnp.sum(
            _spectral_conv_3d(p, x, m1, m2, m3) ** 2), argnums=(0, 1))(p, x)
        gb = jax.grad(lambda p, x: jnp.sum(
            _spectral_conv3d_matmul(p, x, m1, m2, m3) ** 2),
            argnums=(0, 1))(p, x)
        for ta, tb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            denom = float(jnp.linalg.norm(ta)) or 1.0
            assert float(jnp.linalg.norm(ta - tb)) / denom < 1e-4

    with pytest.raises(ValueError, match="too small"):
        _spectral_conv3d_matmul(p, jax.numpy.zeros((1, 3, 4, 12, 9)), 4, 3, 3)


def test_fno3d_model_impl_parity_and_registry():
    """Full FNO3d forward identical across spectral impls; registry builds
    the model from exp-config-style kwargs (modes as int or triple)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO3d
    from fast_eng_super_resolution_tpu.models.registry import init_model

    m = init_model("fno3d", 2, 1, width=8, modes=3, padding=2)
    assert isinstance(m, FNO3d)
    assert (m.modes1, m.modes2, m.modes3) == (3, 3, 3) and m.in_feats == 2
    m2 = init_model("fno3d", 1, 1, width=8, modes=[2, 3, 4], in_feats=1)
    assert (m2.modes1, m2.modes2, m2.modes3) == (2, 3, 4)

    m_fft = FNO3d(modes1=3, modes2=3, modes3=3, width=8, in_feats=2,
                  padding=2, spectral_impl="fft")
    m_mm = FNO3d(modes1=3, modes2=3, modes3=3, width=8, in_feats=2,
                 padding=2, spectral_impl="matmul")
    params = m_fft.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 12, 11, 2))
    ya, yb = m_fft.apply(params, x), m_mm.apply(params, x)
    assert ya.shape == (2, 10, 12, 11, 128)
    assert float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya)) < 1e-5


def test_fno3d_import_pth_corner_layout():
    """Canonical four-corner torch FNO3d weights map onto the stacked block:
    imported params reproduce the torch corner selection exactly (checked by
    round-tripping through the fft path's corner scatter)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO3d

    m = FNO3d(modes1=2, modes2=2, modes3=3, width=4, in_feats=1, padding=2)
    ref = m.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sd = {"p.weight": np.asarray(ref["p"]["w"]).T,
          "p.bias": np.asarray(ref["p"]["b"])}
    for blk, tag in (("q", "q"),):
        for j in (1, 2):
            w = np.asarray(ref[blk][f"mlp{j}"]["w"]).T
            sd[f"{tag}.mlp{j}.weight"] = w[:, :, None, None, None]
            sd[f"{tag}.mlp{j}.bias"] = np.asarray(ref[blk][f"mlp{j}"]["b"])
    for i in range(4):
        wc = np.asarray(ref[f"conv{i}"]["w_re"]) + 1j * np.asarray(
            ref[f"conv{i}"]["w_im"])
        m1, m2 = m.modes1, m.modes2
        sd[f"conv{i}.weights1"] = wc[:, :, :m1, :m2]
        sd[f"conv{i}.weights2"] = wc[:, :, m1:, :m2]
        sd[f"conv{i}.weights3"] = wc[:, :, :m1, m2:]
        sd[f"conv{i}.weights4"] = wc[:, :, m1:, m2:]
        w = np.asarray(ref[f"w{i}"]["w"]).T
        sd[f"w{i}.weight"] = w[:, :, None, None, None]
        sd[f"w{i}.bias"] = np.asarray(ref[f"w{i}"]["b"])
        for j in (1, 2):
            w = np.asarray(ref[f"mlp{i}"][f"mlp{j}"]["w"]).T
            sd[f"mlp{i}.mlp{j}.weight"] = w[:, :, None, None, None]
            sd[f"mlp{i}.mlp{j}.bias"] = np.asarray(ref[f"mlp{i}"][f"mlp{j}"]["b"])
    imported = m.import_pth(sd)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8, 1))
    ya, yb = m.apply(ref, x), m.apply(imported, x)
    assert float(jnp.abs(ya - yb).max()) < 1e-6


def test_fno3d_trains_on_advected3d(tmp_path):
    import jax

    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        AdvectedScalar3DDataset)
    from fast_eng_super_resolution_tpu.models.fno import FNO3d
    from fast_eng_super_resolution_tpu.parallel.grid_train import GridTrainer

    ds = AdvectedScalar3DDataset(str(tmp_path), num_samples=6, resolution=16,
                                 steps=10)
    x = np.stack([ds[i]["x"] for i in range(6)])
    y = np.stack([ds[i]["y"] for i in range(6)])

    model = FNO3d(modes1=3, modes2=3, modes3=3, width=8, in_feats=1, padding=3)
    trainer = GridTrainer(model, lr=2e-3, out_channels=1)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), x)
    assert "proj" in params  # 128 -> 1 projection added

    first = trainer.evaluate(params, x, y)
    for _ in range(60):
        params, opt_state, loss = trainer.step(params, opt_state, x, y)
    last = trainer.evaluate(params, x, y)
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    assert np.asarray(trainer.predict(params, x)).shape == y.shape


def test_ns_spacetime_pair_and_dataset(tmp_path):
    """Space-time NS pairs: trajectory frames ordered (coarse-grid error
    grows with horizon on average), IC channel constant over t, dataset
    factory + cache round-trip."""
    from fast_eng_super_resolution_tpu.data.dataset import init_dataset
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        NSSpacetimeDataset, ns_spacetime_pair, simulate_ns_vorticity)

    rng = np.random.default_rng(0)
    x, y = ns_spacetime_pair(32, rng, factor=4, t_frames=4, t_end=0.5)
    assert x.shape == (4, 32, 32, 2) and y.shape == (4, 32, 32, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    # IC channel is the same field at every frame
    assert np.array_equal(x[0, ..., 1], x[-1, ..., 1])
    # coarse-run error grows with horizon
    errs = [float(((x[t, ..., :1] - y[t]) ** 2).mean()) for t in range(4)]
    assert errs[-1] > errs[0], errs
    # trajectory endpoint == single-frame solve at the same params
    traj = simulate_ns_vorticity(np.ones((16, 16)) * 0.1, t_end=0.1,
                                 dt=5e-3, n_frames=4)
    final = simulate_ns_vorticity(np.ones((16, 16)) * 0.1, t_end=0.1, dt=5e-3)
    assert traj.shape == (4, 16, 16)
    np.testing.assert_allclose(traj[-1], final, rtol=1e-6)
    with pytest.raises(ValueError, match="n_frames"):
        simulate_ns_vorticity(np.ones((16, 16)), t_end=0.01, dt=5e-3,
                              n_frames=4)

    ds = init_dataset("ns3d_grid", str(tmp_path), num_samples=2,
                      resolution=32, t_frames=4, t_end=0.25)
    assert isinstance(ds, NSSpacetimeDataset)
    assert ds[0]["x"].shape == (4, 32, 32, 2)
    ds2 = NSSpacetimeDataset(str(tmp_path), num_samples=2, resolution=32,
                             t_frames=4, t_end=0.25)
    np.testing.assert_array_equal(ds2[1]["y"], ds[1]["y"])


def test_fno3d_spatial_sharding_parity():
    """Spatial model-parallelism for the volumetric operator: sharding a
    spatial axis of the volume over the mesh gives bit-level parity with the
    replicated forward AND training step — the matmul-DFT spectral conv is
    GSPMD-shardable by construction (every op is a dense GEMM; XLA inserts
    the collectives for the DFT contractions over the sharded axis).  This
    is the deployment path for grids too large for one chip's HBM."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fast_eng_super_resolution_tpu.models.fno import FNO3d
    from fast_eng_super_resolution_tpu.parallel.grid_train import GridTrainer

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(jax.devices()), ("space",))
    m = FNO3d(modes1=3, modes2=3, modes3=3, width=8, in_feats=1, padding=3,
              spectral_impl="matmul")
    tr = GridTrainer(m, lr=1e-3, out_channels=1)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    y = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    params, opt = tr.init(jax.random.PRNGKey(0), x)

    p1, _, l1 = tr.step(params, opt, jnp.asarray(x), jnp.asarray(y))
    sh = NamedSharding(mesh, P(None, None, "space"))  # shard the H axis
    rep = NamedSharding(mesh, P())
    p2, _, l2 = tr.step(jax.device_put(params, rep), jax.device_put(opt, rep),
                        jax.device_put(x, sh), jax.device_put(y, sh))
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_spectral_fft_path_too_small_raises():
    """Both spectral impls (2D and 3D) reject mode counts the grid cannot
    hold — the fft path used to silently compute an overlap-corrupted
    operator where the matmul path raised (review finding)."""
    import jax

    from fast_eng_super_resolution_tpu.models.fno import (
        _spectral_conv, _spectral_conv_3d, _spectral_init, _spectral_init_3d)

    p2 = _spectral_init(jax.random.PRNGKey(0), 2, 2, 12, 12)
    with pytest.raises(ValueError, match="too small"):
        _spectral_conv(p2, jax.numpy.zeros((1, 2, 20, 24)), 12, 12)
    p3 = _spectral_init_3d(jax.random.PRNGKey(0), 2, 2, 4, 3, 3)
    with pytest.raises(ValueError, match="too small"):
        _spectral_conv_3d(p3, jax.numpy.zeros((1, 2, 4, 12, 9)), 4, 3, 3)


def test_spectral_conv1d_matmul_parity():
    """1D FFT-free matmul-DFT spectral conv == jnp.fft path (values + grads),
    incl. the even-W Nyquist column and an odd-W grid."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import (
        _spectral_conv_1d, _spectral_conv1d_matmul, _spectral_init_1d)

    key = jax.random.PRNGKey(0)
    # (24, 13): m1-1 == W//2 hits the unmirrored Nyquist column; (25, 12) odd W
    for w, m1 in [(64, 16), (24, 13), (25, 12)]:
        p = _spectral_init_1d(key, 4, 6, m1)
        x = jax.random.normal(jax.random.fold_in(key, w), (2, 4, w))
        a = _spectral_conv_1d(p, x, m1)
        b = _spectral_conv1d_matmul(p, x, m1)
        assert float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a)) < 1e-5

        ga = jax.grad(lambda p, x: jnp.sum(_spectral_conv_1d(p, x, m1) ** 2),
                      argnums=(0, 1))(p, x)
        gb = jax.grad(
            lambda p, x: jnp.sum(_spectral_conv1d_matmul(p, x, m1) ** 2),
            argnums=(0, 1))(p, x)
        for ta, tb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            denom = float(jnp.linalg.norm(ta)) or 1.0
            assert float(jnp.linalg.norm(ta - tb)) / denom < 1e-4


def test_fno1d_model_impl_parity_and_registry():
    """Full FNO1d forward identical across spectral impls; registry wires
    'fno1d' with named modes/in_feats keys (no positional-binding quirk)."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO1d
    from fast_eng_super_resolution_tpu.models.registry import init_model

    m_fft = FNO1d(modes1=8, width=12, in_feats=2, spectral_impl="fft")
    m_mm = FNO1d(modes1=8, width=12, in_feats=2, spectral_impl="matmul")
    params = m_fft.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 2))
    ya, yb = m_fft.apply(params, x), m_mm.apply(params, x)
    assert ya.shape == (2, 32, 128)
    assert float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya)) < 1e-5

    m = init_model("fno1d", 2, 1, width=12, modes=8)
    assert isinstance(m, FNO1d) and m.modes1 == 8 and m.in_feats == 2
    assert m.padding == 0  # periodic default


def test_fno1d_import_pth_layout():
    """Canonical torch FNO1d weights (complex conv{i}.weights1, 1x1 Conv1d
    blocks) import to params that reproduce the native forward exactly."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.fno import FNO1d

    m = FNO1d(modes1=4, width=6, in_feats=2, spectral_impl="fft")
    ref = m.init(jax.random.PRNGKey(0))
    sd = {"p.weight": np.asarray(ref["p"]["w"]).T,
          "p.bias": np.asarray(ref["p"]["b"])}
    for j in (1, 2):
        w = np.asarray(ref["q"][f"mlp{j}"]["w"]).T
        sd[f"q.mlp{j}.weight"] = w[:, :, None]
        sd[f"q.mlp{j}.bias"] = np.asarray(ref["q"][f"mlp{j}"]["b"])
    for i in range(4):
        sd[f"conv{i}.weights1"] = (np.asarray(ref[f"conv{i}"]["w_re"])
                                   + 1j * np.asarray(ref[f"conv{i}"]["w_im"]))
        w = np.asarray(ref[f"w{i}"]["w"]).T
        sd[f"w{i}.weight"] = w[:, :, None]
        sd[f"w{i}.bias"] = np.asarray(ref[f"w{i}"]["b"])
        for j in (1, 2):
            w = np.asarray(ref[f"mlp{i}"][f"mlp{j}"]["w"]).T
            sd[f"mlp{i}.mlp{j}.weight"] = w[:, :, None]
            sd[f"mlp{i}.mlp{j}.bias"] = np.asarray(ref[f"mlp{i}"][f"mlp{j}"]["b"])
    imported = m.import_pth(sd)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 2))
    ya, yb = m.apply(ref, x), m.apply(imported, x)
    assert float(jnp.abs(ya - yb).max()) < 1e-6


def test_burgers_solver_physics():
    """Viscous Burgers solver: conserves the mean exactly (conservative
    form), dissipates energy monotonically, steepens toward a shock at low
    viscosity, and self-converges under dt refinement."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import simulate_burgers

    n = 128
    x = np.arange(n) / n
    u0 = np.sin(2 * np.pi * x)

    u_half = simulate_burgers(u0, t_end=0.15, nu=5e-3, dt=1e-3)
    u_full = simulate_burgers(u0, t_end=0.3, nu=5e-3, dt=1e-3)
    # mean conservation (d/dt int u = 0 in conservative form, periodic)
    assert abs(u_half.mean() - u0.mean()) < 1e-8
    assert abs(u_full.mean() - u0.mean()) < 1e-8
    # energy decay
    e0, e1, e2 = (float((u ** 2).mean()) for u in (u0, u_half, u_full))
    assert e0 > e1 > e2, (e0, e1, e2)
    # shock steepening: max gradient grows before the viscous shock forms
    # (sin IC shocks at t* = 1/(2 pi) ~ 0.159)
    g0 = np.abs(np.gradient(u0)).max()
    g1 = np.abs(np.gradient(u_half)).max()
    assert g1 > 2.0 * g0, (g0, g1)
    # dt self-convergence
    u_fine_dt = simulate_burgers(u0, t_end=0.3, nu=5e-3, dt=5e-4)
    rel = np.abs(u_full - u_fine_dt).max() / (np.abs(u_fine_dt).max() + 1e-12)
    assert rel < 5e-3, rel


def test_burgers_pair_and_dataset(tmp_path):
    """Burgers pairs: shapes, finite, coarse channel a strong-but-imperfect
    baseline, IC channel coarse-resolvable; dataset caches and round-trips."""
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        BurgersDataset, burgers_pair)

    rng = np.random.default_rng(0)
    x, y = burgers_pair(128, rng, factor=4)
    assert x.shape == (128, 2) and y.shape == (128, 1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert np.abs(y).max() <= 1.0 + 1e-6  # normalized by max |fine|
    cc = np.corrcoef(x[:, 0], y[:, 0])[0, 1]
    assert cc > 0.8, cc
    base_mse = float(((x[:, 0] - y[:, 0]) ** 2).mean())
    assert base_mse > 1e-6  # room for the model to improve

    ds = BurgersDataset(str(tmp_path), num_samples=3, resolution=64,
                        downsample=4, t_end=0.5)
    assert len(ds) == 3 and ds[1]["x"].shape == (64, 2)
    ds2 = BurgersDataset(str(tmp_path), num_samples=3, resolution=64,
                         downsample=4, t_end=0.5)
    assert np.array_equal(ds2[1]["x"], ds[1]["x"])  # served from cache


def test_fno1d_trains_on_burgers(tmp_path):
    import jax

    from fast_eng_super_resolution_tpu.data.grid_dataset import BurgersDataset
    from fast_eng_super_resolution_tpu.models.fno import FNO1d
    from fast_eng_super_resolution_tpu.parallel.grid_train import GridTrainer

    ds = BurgersDataset(str(tmp_path), num_samples=8, resolution=64,
                        downsample=4, t_end=0.5)
    x = np.stack([ds[i]["x"] for i in range(8)])
    y = np.stack([ds[i]["y"] for i in range(8)])

    model = FNO1d(modes1=8, width=16, in_feats=2)
    trainer = GridTrainer(model, lr=5e-3, out_channels=1)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), x)
    assert "proj" in params  # 128 -> 1 projection added

    first = trainer.evaluate(params, x, y)
    for _ in range(120):
        params, opt_state, loss = trainer.step(params, opt_state, x, y)
    last = trainer.evaluate(params, x, y)
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    assert np.asarray(trainer.predict(params, x)).shape == y.shape


def test_task_spec_guard_refuses_mismatched_coarse(tmp_path, capsys):
    """Checkpoint task-spec stamping (round-4 VERDICT #4): serving an
    FNO3d checkpoint against a coarse input at a different downsample
    factor must raise — the measured zero-shot trap is 0.25x (worse than
    baseline, BASELINE.md FNO3d transfer row).  task_spec_guard: warn
    downgrades to a warning for deliberate transfer experiments; legacy
    stampless checkpoints always pass."""
    import pytest

    from fast_eng_super_resolution_tpu.core import checkpoint as ckpt
    from fast_eng_super_resolution_tpu.data.grid_dataset import (
        AdvectedScalar3DDataset)
    from fast_eng_super_resolution_tpu.grid_runner import (pred_grid,
                                                           train_grid)
    from fast_eng_super_resolution_tpu.models.fno import FNO3d

    exp = dict(train_samples=3, idxs=[3], seed=0, resolution=16,
               downsample=2)
    ds = AdvectedScalar3DDataset(str(tmp_path / "d2"), num_samples=4,
                                 resolution=16, downsample=2, steps=4,
                                 max_mode=1)
    model = FNO3d(modes1=2, modes2=2, modes3=2, width=8, in_feats=1,
                  padding=2)
    log_dir = str(tmp_path / "logs")
    train_grid("spec", model, ds, dict(epochs=2, batch_size=3, lr=1e-3,
                                       val_interval=1), exp, log_dir=log_dir)
    path = os.path.join(log_dir, "models", "collection_spec",
                        "partition_0.npz")
    meta = ckpt.load_meta(path)
    assert meta["task"] == "AdvectedScalar3DDataset"
    assert meta["task_resolution"] == "16" and meta["task_downsample"] == "2"

    # matched spec serves fine
    pred_grid([3], "spec", model, ds, exp, log_dir=log_dir)

    # mismatched coarse grid (finer coarse input than training) refuses
    ds4 = AdvectedScalar3DDataset(str(tmp_path / "d4"), num_samples=4,
                                  resolution=16, downsample=4, steps=4,
                                  max_mode=1)
    exp4 = {**exp, "downsample": 4}
    with pytest.raises(ValueError, match="task-spec mismatch"):
        pred_grid([3], "spec", model, ds4, exp4, log_dir=log_dir)

    # warn mode proceeds (deliberate zero-shot transfer)
    capsys.readouterr()
    pred_grid([3], "spec", model, ds4, {**exp4, "task_spec_guard": "warn"},
              log_dir=log_dir)
    assert "task-spec mismatch" in capsys.readouterr().out

    # legacy checkpoint without a stamp is served unguarded
    ckpt.save_params(path, ckpt.load_params(path))
    pred_grid([3], "spec", model, ds4, exp4, log_dir=log_dir)
