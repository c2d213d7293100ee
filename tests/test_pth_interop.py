"""torch .pth interop for FNO2d and DeepONet (golden vs torch-built modules)."""

import numpy as np
import pytest
import torch
import torch.nn as nn


def test_fno_import_pth_matches_torch(rng):
    """Build the reference FNO2d in torch (independent re-statement of
    model.py:63-133), export its state_dict, import, compare forwards."""
    from fast_eng_super_resolution_tpu.models.fno import FNO2d

    m1, m2, width, in_feats = 3, 3, 6, 4

    class TorchSpectral(nn.Module):
        def __init__(self):
            super().__init__()
            scale = 1 / (width * width)
            self.weights1 = nn.Parameter(scale * torch.rand(width, width, m1, m2, dtype=torch.cfloat))
            self.weights2 = nn.Parameter(scale * torch.rand(width, width, m1, m2, dtype=torch.cfloat))

        def forward(self, x):
            b = x.shape[0]
            x_ft = torch.fft.rfft2(x)
            out_ft = torch.zeros(b, width, x.size(-2), x.size(-1) // 2 + 1, dtype=torch.cfloat)
            out_ft[:, :, :m1, :m2] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], self.weights1)
            out_ft[:, :, -m1:, :m2] = torch.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], self.weights2)
            return torch.fft.irfft2(out_ft, s=(x.size(-2), x.size(-1)))

    class TorchMLP(nn.Module):
        def __init__(self, ci, co, cm):
            super().__init__()
            self.mlp1 = nn.Conv2d(ci, cm, 1)
            self.mlp2 = nn.Conv2d(cm, co, 1)

        def forward(self, x):
            return self.mlp2(torch.nn.functional.gelu(self.mlp1(x)))

    class TorchFNO(nn.Module):
        def __init__(self):
            super().__init__()
            self.p = nn.Linear(in_feats + 2, width)
            for i in range(4):
                setattr(self, f"conv{i}", TorchSpectral())
                setattr(self, f"mlp{i}", TorchMLP(width, width, width))
                setattr(self, f"w{i}", nn.Conv2d(width, width, 1))
            self.q = TorchMLP(width, 128, width * 4)

        def forward(self, x):
            b, sx, sy = x.shape[0], x.shape[1], x.shape[2]
            gx = torch.linspace(0, 1, sx).reshape(1, sx, 1, 1).repeat(b, 1, sy, 1)
            gy = torch.linspace(0, 1, sy).reshape(1, 1, sy, 1).repeat(b, sx, 1, 1)
            x = torch.cat((x, gx, gy), dim=-1)
            x = self.p(x).permute(0, 3, 1, 2)
            x = torch.nn.functional.pad(x, [0, 9, 0, 9])
            for i in range(4):
                x1 = getattr(self, f"mlp{i}")(getattr(self, f"conv{i}")(x))
                x2 = getattr(self, f"w{i}")(x)
                x = x1 + x2
                if i < 3:
                    x = torch.nn.functional.gelu(x)
            x = x[..., :-9, :-9]
            return self.q(x).permute(0, 2, 3, 1)

    torch.manual_seed(0)
    tm = TorchFNO().eval()
    x = rng.normal(size=(2, 12, 12, in_feats)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.as_tensor(x)).numpy()

    model = FNO2d(modes1=m1, modes2=m2, width=width, in_feats=in_feats)
    params = model.import_pth(tm.state_dict())
    got = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_deeponet_import_pth_matches_torch(rng):
    from fast_eng_super_resolution_tpu.models.deeponet import DeepONet

    bdim, tdim, hdim, odim = 3, 2, 8, 4
    torch.manual_seed(1)
    branch = nn.Sequential(nn.Linear(bdim, hdim), nn.ReLU(), nn.Linear(hdim, hdim),
                           nn.ReLU(), nn.Linear(hdim, odim))
    trunk = nn.Sequential(nn.Linear(tdim, hdim), nn.ReLU(), nn.Linear(hdim, hdim),
                          nn.ReLU(), nn.Linear(hdim, odim))
    sd = {}
    for name, mod in (("branch", branch), ("trunk", trunk)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v

    n = 6
    x = rng.normal(size=(2, n, n, bdim)).astype(np.float32)
    r = torch.linspace(0, 1, n)
    gx, gy = torch.meshgrid(r, r, indexing="ij")
    grid = torch.stack([gx, gy], dim=-1).unsqueeze(0).repeat(2, 1, 1, 1)
    with torch.no_grad():
        expected = (branch(torch.as_tensor(x)) * trunk(grid)).numpy()

    model = DeepONet(bdim, tdim, hdim, odim)
    params = model.import_pth(sd)
    got = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
