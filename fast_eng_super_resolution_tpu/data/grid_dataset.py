"""Regular-grid turbulence dataset for the FNO/DeepONet model family.

The reference's FNO path consumed JHTDB turbulence cutouts through
MatDataset/Sub_JHTDB (/root/reference/dataset/MatDataset.py:21-39); the actual
JHTDB download/processing lived out-of-repo.  This module provides the
in-framework equivalent: a self-contained synthetic 2D turbulence workload
with the same super-resolution structure (coarse field upsampled -> input,
fine field -> target), cached as npz under ``root/processed``.

Fields are solenoidal velocity snapshots synthesized with a Kolmogorov-like
k^-5/3 energy spectrum and random phases; the low-res input is a spectral
truncation (the textbook LES filter), bilinearly upsampled back to the fine
grid.

CAVEAT for quality experiments: with fully RANDOM phases the truncated modes
are statistically independent of the retained ones, so the identity map is
the Bayes-optimal "super-resolver" on held-out snapshots — use this dataset
for pipeline/throughput work, and expect models to only fit the training set.
A task where high frequencies are learnable needs deterministic nonlinear
structure (e.g. advected scalar fields); planned for a future round.
"""

from __future__ import annotations

import os

import numpy as np


def synth_turbulence_2d(n: int, rng: np.random.Generator,
                        slope: float = -5.0 / 3.0) -> np.ndarray:
    """One [n, n, 2] solenoidal velocity snapshot with k^slope spectrum."""
    kx = np.fft.fftfreq(n, 1.0 / n)
    ky = np.fft.fftfreq(n, 1.0 / n)
    k2 = kx[:, None] ** 2 + ky[None, :] ** 2
    k = np.sqrt(np.maximum(k2, 1e-12))
    amp = np.where(k2 > 0, k ** ((slope - 1.0) / 2.0), 0.0)
    phase = np.exp(2j * np.pi * rng.random((n, n)))
    psi_hat = amp * phase  # stream function -> automatically divergence-free u
    psi = np.fft.ifft2(psi_hat).real
    u = np.gradient(psi, axis=1)
    v = -np.gradient(psi, axis=0)
    field = np.stack([u, v], axis=-1)
    return (field / (np.abs(field).max() + 1e-12)).astype(np.float32)


def spectral_downsample(field: np.ndarray, factor: int) -> np.ndarray:
    """Low-pass filter + upsample back: the coarse-solution surrogate."""
    n = field.shape[0]
    keep = n // (2 * factor)
    out = np.empty_like(field)
    for c in range(field.shape[-1]):
        f_hat = np.fft.fft2(field[..., c])
        mask = np.zeros((n, n))
        mask[:keep, :keep] = mask[:keep, -keep:] = 1
        mask[-keep:, :keep] = mask[-keep:, -keep:] = 1
        out[..., c] = np.fft.ifft2(f_hat * mask).real
    return out.astype(np.float32)


class TurbulenceGridDataset:
    """Paired (upsampled-coarse, fine) snapshots on a regular grid.

    API mirrors the graph datasets where it makes sense: __len__, __getitem__
    returning dicts with 'x' [n, n, C] and 'y' [n, n, C].
    """

    def __init__(self, root: str, num_samples: int = 32, resolution: int = 64,
                 downsample: int = 4, seed: int = 0, **kwargs):
        self.root = root
        path = os.path.join(root, "processed", "grid_data.npz")
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            rng = np.random.default_rng(seed)
            xs, ys = [], []
            for _ in range(num_samples):
                hi = synth_turbulence_2d(resolution, rng)
                lo = spectral_downsample(hi, downsample)
                xs.append(lo)
                ys.append(hi)
            np.savez(path, x=np.stack(xs), y=np.stack(ys))
        with np.load(path) as z:
            self.x, self.y = z["x"], z["y"]

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return {"x": self.x[i], "y": self.y[i]}
