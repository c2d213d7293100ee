"""Subdomain encoders: flow fields -> latent vectors for expert routing.

Parity targets in /root/reference/models/encoder.py:
- PCAEncoder (:96-160): flatten each subdomain's node features truncated to a
  common length, PCA fit/transform, joblib persistence with the same file name
  ('pca_encoder.joblib', :141).  Drift note: the reference *hardcodes*
  ``min_length = 280`` at transform time (:152) regardless of the fit length —
  we persist the fit-time length and reuse it (the intended behavior), clamping
  to the shortest subdomain seen.
- VAEEncoder/TBVAE (:25-201): MLP VAE with reparameterization, trained
  per-sample with MSE+KLD; implemented in JAX with a jit step.
- SpectrumEncoder (:204-364): turbulent-kinetic-energy spectrum latents; the
  3D variant interpolates scattered nodes to a regular grid then 3D-FFTs and
  shell-integrates.  The reference's per-wavenumber Python triple loop
  (:304-313) is replaced by a vectorized bincount over rounded |k|.
- DMDEncoder (:367-385) is an empty stub in the reference; here it computes
  actual DMD eigenvalue latents via SVD so the registry name is functional.

PCA itself is an exact SVD reimplementation (sklearn-free): latents equal
sklearn's ``PCA.transform`` up to component sign.
"""

from __future__ import annotations

import os

import numpy as np
from joblib import dump, load


def _collect_node_features(dataset) -> list[np.ndarray]:
    out = []
    for data in dataset:
        x = data["x"] if isinstance(data, dict) else np.asarray(data.x)
        out.append(np.asarray(x, np.float32))
    return out


class Encoder:
    def __init__(self, n_components: int, **kwargs):
        self.n_components = n_components

    def train(self, dataset, save_model: bool = False, path: str | None = None):
        pass

    def get_latent_space(self, dataset) -> np.ndarray:
        raise NotImplementedError

    def load_model(self, path: str):
        pass


class PCAEncoder(Encoder):
    def __init__(self, n_components: int, **kwargs):
        super().__init__(n_components)
        self.mean_: np.ndarray | None = None
        self.components_: np.ndarray | None = None
        self.min_length: int | None = None

    def _flatten(self, feats: list[np.ndarray]) -> np.ndarray:
        """At train time the row length is the batch minimum (reference
        behavior, encoder.py:134-139).  At transform time it is the FIT-time
        min_length, applied PER ROW (truncate long, zero-pad short): a
        global batch-min would make a subdomain's latent — and its expert
        routing — depend on which other subdomains share the request
        (review finding)."""
        if self.min_length is None:
            min_len = min(f.shape[0] for f in feats)
        else:
            min_len = self.min_length
        rows = []
        for f in feats:
            row = f[:min_len]
            if row.shape[0] < min_len:
                row = np.pad(row, ((0, min_len - row.shape[0]), (0, 0)))
            rows.append(row.reshape(-1))
        return np.stack(rows), min_len

    def train(self, dataset, save_model: bool = False, path: str | None = None):
        feats = _collect_node_features(dataset)
        mat, self.min_length = self._flatten(feats)
        self.mean_ = mat.mean(axis=0)
        centered = mat - self.mean_
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        self.components_ = vt[: self.n_components]
        if save_model:
            self._save_model(path)

    def get_latent_space(self, dataset) -> np.ndarray:
        feats = _collect_node_features(dataset)
        mat, _ = self._flatten(feats)
        width = self.mean_.shape[0]
        if mat.shape[1] != width:  # different subdomain sizes at predict time
            if mat.shape[1] > width:
                mat = mat[:, :width]
            else:
                mat = np.pad(mat, ((0, 0), (0, width - mat.shape[1])))
        return (mat - self.mean_) @ self.components_.T

    def _save_model(self, path: str):
        dump({"mean": self.mean_, "components": self.components_,
              "min_length": self.min_length, "n_components": self.n_components},
             os.path.join(path, "pca_encoder.joblib"))  # encoder.py:141

    def load_model(self, path: str):
        d = load(os.path.join(path, "pca_encoder.joblib"))
        self.mean_, self.components_ = d["mean"], d["components"]
        self.min_length, self.n_components = d["min_length"], d["n_components"]


class VAEEncoder(Encoder):
    """TBVAE (encoder.py:25-93) in JAX; latent = reparameterized z (:189-201)."""

    def __init__(self, n_components: int, input_dim: int = 4, hidden_dim: int = 128,
                 num_layers: int = 3, dropout: float = 0.5, lr: float = 1e-3,
                 epochs: int = 30, seed: int = 0, **kwargs):
        super().__init__(n_components)
        self.input_dim, self.hidden_dim = input_dim, hidden_dim
        self.num_layers, self.dropout = num_layers, dropout
        self.lr, self.epochs, self.seed = lr, epochs, seed
        self.params = None

    def _build(self):
        import jax

        from ..models.common import mlp_init

        key = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(key, 4)
        h, ld = self.hidden_dim, self.n_components
        enc_sizes = [self.input_dim] + [h] * self.num_layers
        dec_sizes = [ld] + [h] * self.num_layers + [self.input_dim]
        return {
            "enc": mlp_init(ks[0], enc_sizes),
            "mu": mlp_init(ks[1], [h, ld])[0],
            "logvar": mlp_init(ks[2], [h, ld])[0],
            "dec": mlp_init(ks[3], dec_sizes),
        }

    @staticmethod
    def _dropout(h, rate, key):
        """Inverted dropout on hidden activations (train only).

        Fidelity: the reference TBVAE interleaves nn.Dropout in its
        encoder/decoder stacks (encoder.py:25-93); inference (get_latent_space)
        runs without it, like torch eval mode.
        """
        import jax

        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, h.shape)
        return jax.numpy.where(mask, h / keep, 0.0)

    @classmethod
    def _encode(cls, params, x, dropout: float = 0.0, key=None):
        import jax

        from ..models.common import linear
        h = x
        for i, layer in enumerate(params["enc"]):
            h = jax.nn.relu(linear(layer, h))
            if dropout > 0.0 and key is not None:
                h = cls._dropout(h, dropout, jax.random.fold_in(key, i))
        return linear(params["mu"], h), linear(params["logvar"], h)

    @classmethod
    def _decode(cls, params, z, dropout: float = 0.0, key=None):
        import jax

        from ..models.common import linear
        h = z
        for i, layer in enumerate(params["dec"][:-1]):
            h = jax.nn.relu(linear(layer, h))
            if dropout > 0.0 and key is not None:
                h = cls._dropout(h, dropout, jax.random.fold_in(key, 100 + i))
        return linear(params["dec"][-1], h)

    @staticmethod
    def _pad_bucket(x: np.ndarray, multiple: int = 256):
        """Zero-pad the node axis to a bucket multiple + a real-row mask.

        Variable node counts would retrace/recompile every jit once per
        distinct count, and un-jitted per-sample encodes cost ~2*layers
        eager dispatches each (~0.5 s over the relay tunnel, CLAUDE.md
        'eager loops are death').  Masked sums keep the loss numerically
        identical to the unpadded reference math."""
        n = x.shape[0]
        n_pad = ((n + multiple - 1) // multiple) * multiple
        xp = np.zeros((n_pad, x.shape[1]), np.float32)
        xp[:n] = x
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0
        return xp, mask

    def train(self, dataset, save_model: bool = False, path: str | None = None):
        import jax
        import jax.numpy as jnp
        import optax

        feats = _collect_node_features(dataset)
        self.params = self._build()
        opt = optax.adam(self.lr)
        opt_state = opt.init(self.params)

        def loss_fn(params, x, mask, key):
            k_eps, k_drop = jax.random.split(key)
            mu, logvar = self._encode(params, x, self.dropout, k_drop)
            eps = jax.random.normal(k_eps, mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
            x_hat = self._decode(params, z, self.dropout, k_drop)
            m = mask[:, None]
            mse = jnp.sum((x_hat - x) ** 2 * m)  # reduction='sum' (encoder.py:171)
            kld = -0.5 * jnp.sum((1 + logvar - mu**2 - jnp.exp(logvar)) * m)
            return mse + kld

        @jax.jit
        def step(params, opt_state, x, mask, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, mask, key)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        padded = [self._pad_bucket(np.asarray(x)) for x in feats]
        key = jax.random.PRNGKey(self.seed + 1)
        for _ in range(self.epochs):
            for xp, mask in padded:
                key, sub = jax.random.split(key)
                self.params, opt_state, _ = step(self.params, opt_state,
                                                 jnp.asarray(xp),
                                                 jnp.asarray(mask), sub)
        if save_model:
            dump(jax.device_get(self.params), os.path.join(path, "vae_encoder.joblib"))

    def get_latent_space(self, dataset) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        feats = _collect_node_features(dataset)
        fn = getattr(self, "_latent_jit", None)
        if fn is None:
            def pooled(params, x, mask, key):
                mu, logvar = self._encode(params, x)
                eps = jax.random.normal(key, mu.shape)
                z = mu + eps * jnp.exp(0.5 * logvar)
                denom = jnp.maximum(jnp.sum(mask), 1.0)
                return jnp.sum(z * mask[:, None], axis=0) / denom

            # batched over same-bucket subdomains: ONE dispatch per distinct
            # padded shape per request instead of ~2*layers eager ops per
            # subdomain (this sits on the routed serving path)
            fn = self._latent_jit = jax.jit(jax.vmap(pooled,
                                                     in_axes=(None, 0, 0, 0)))

        groups: dict[int, list[int]] = {}
        padded = []
        for i, x in enumerate(feats):
            xp, mask = self._pad_bucket(np.asarray(x))
            padded.append((xp, mask))
            groups.setdefault(xp.shape[0], []).append(i)

        key = jax.random.PRNGKey(self.seed + 2)
        out = np.zeros((len(feats), self.n_components), np.float32)
        for n_pad in sorted(groups):
            idxs = groups[n_pad]
            xs = jnp.asarray(np.stack([padded[i][0] for i in idxs]))
            masks = jnp.asarray(np.stack([padded[i][1] for i in idxs]))
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, len(idxs))
            zs = np.asarray(fn(self.params, xs, masks, keys))
            for row, i in enumerate(idxs):
                out[i] = zs[row]
        return out

    def load_model(self, path: str):
        self.params = load(os.path.join(path, "vae_encoder.joblib"))


class SpectrumEncoder(Encoder):
    """TKE-spectrum latents (encoder.py:204-364)."""

    def __init__(self, n_components: int, domain_size=0.03, grid_resolution=(16, 16, 16),
                 **kwargs):
        super().__init__(n_components)
        self.domain_size = domain_size
        self.grid_resolution = tuple(grid_resolution)

    @staticmethod
    def compute_tke_spectrum_2d(u: np.ndarray) -> np.ndarray:
        """2D variant (encoder.py:214-269), vectorized shell integration."""
        nx, ny = u.shape[:2]
        uf = np.fft.fft2(u[..., 0] if u.ndim == 3 else u, axes=(0, 1))
        ef = 0.5 * (uf * np.conj(uf)).real
        kx = np.fft.fftfreq(nx, d=1.0 / nx)
        ky = np.fft.fftfreq(ny, d=1.0 / ny)
        rk = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
        k_index = np.round(rk).astype(np.int64)
        spectrum = np.bincount(k_index.ravel(), weights=ef.ravel(), minlength=nx)[:nx]
        spectrum = np.log(spectrum[1:] + 1e-8)
        rng = spectrum.max() - spectrum.min()
        return (spectrum - spectrum.min()) / (rng if rng > 0 else 1.0)

    def compute_tke_spectrum_3d(self, points: np.ndarray, physics: np.ndarray) -> np.ndarray:
        """3D variant (encoder.py:271-319): scatter -> grid -> FFT -> shells."""
        from ..ops.interpolate import gaussian_interpolate_host

        nx, ny, nz = self.grid_resolution
        lo, hi = points.min(axis=0), points.max(axis=0)
        axes = [np.linspace(lo[d], hi[d], n) for d, n in enumerate((nx, ny, nz))]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        grid_pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        spacing = float(np.max((hi - lo) / np.maximum(np.array([nx, ny, nz]) - 1, 1)))
        vals = gaussian_interpolate_host(points, physics.reshape(-1, 1), grid_pts,
                                         radius=2.0 * spacing).reshape(nx, ny, nz)
        uf = np.fft.fftn(vals, axes=(0, 1, 2))
        ef = 0.5 * (uf * np.conj(uf)).real
        ks = [np.fft.fftfreq(n, d=1.0 / n) for n in (nx, ny, nz)]
        rk = np.sqrt(ks[0][:, None, None] ** 2 + ks[1][None, :, None] ** 2
                     + ks[2][None, None, :] ** 2)
        k_index = np.round(rk).astype(np.int64)
        nbins = nx // 2
        keep = k_index < nbins
        spectrum = np.bincount(k_index[keep], weights=ef[keep], minlength=nbins)[:nbins]
        spectrum = np.log(spectrum[1:] + 1e-8)
        rng = spectrum.max() - spectrum.min()
        return (spectrum - spectrum.min()) / (rng if rng > 0 else 1.0)

    def get_latent_space(self, dataset) -> np.ndarray:
        out = []
        for data in dataset:
            if isinstance(data, dict):
                pos, phys = data["pos"], data["y"][:, :1]
            else:
                pos, phys = np.asarray(data.pos), np.asarray(data.y)[:, :1]
            out.append(self.compute_tke_spectrum_3d(pos, phys))
        return np.stack(out)


class DMDEncoder(Encoder):
    """Dynamic-mode-decomposition latents.  The reference declares this class
    but leaves it empty (encoder.py:367-385); implemented here via exact DMD:
    leading singular values of the per-subdomain feature matrix as the latent
    (a stationary-snapshot specialization)."""

    def get_latent_space(self, dataset) -> np.ndarray:
        out = []
        for data in dataset:
            x = data["x"] if isinstance(data, dict) else np.asarray(data.x)
            s = np.linalg.svd(np.asarray(x, np.float64), compute_uv=False)
            v = np.zeros(self.n_components)
            v[: min(len(s), self.n_components)] = s[: self.n_components]
            out.append(v / (v[0] + 1e-12))
        return np.stack(out)


def init_encoder(type: str, n_components: int, **kwargs) -> Encoder:
    """Encoder factory (reference utils.py:55-63 + 'dmd' made functional)."""
    if type == "pca":
        return PCAEncoder(n_components=n_components)
    elif type == "vae":
        return VAEEncoder(n_components=n_components, **kwargs)
    elif type == "spectrum":
        return SpectrumEncoder(n_components=n_components, **kwargs)
    elif type == "dmd":
        return DMDEncoder(n_components=n_components)
    else:
        raise ValueError(f"Invalid encoder type: {type}")
