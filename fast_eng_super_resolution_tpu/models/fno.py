"""FNO2d — Fourier Neural Operator (2D) for regular-grid subdomains.

Parity target: /root/reference/models/model.py:13-141.  Four spectral blocks
(rFFT2 -> truncated complex mode mixing 'bixy,ioxy->boxy' -> irFFT2) with a
1x1-conv skip and a per-block 1x1 MLP, GELU between blocks, domain padding 9,
lift Linear(in_feats+2 -> width) with a normalized grid concat
(model.py:100-141).  The reference hardcodes the lift input at 258
(model.py:85); here it is ``in_feats + 2``.

TPU notes: the truncated spectral conv touches only ``2*m1`` DFT rows and
``m2`` rDFT columns, so the whole rFFT2 -> mode-mix -> irFFT2 chain reduces to
four small dense matmuls against precomputed DFT matrices (impl='matmul') —
pure MXU work, no FFT primitive at all.  This is the default on accelerators
(and the only option on backends whose XLA has no FFT lowering, e.g. the axon
relay); impl='fft' keeps the jnp.fft path for CPU parity.  Complex weights are
stored as separate real/imag float32 arrays (TPU has no complex register type;
this keeps checkpoints pure-real pytrees).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .common import linear, linear_init


def _spectral_init(key, c_in: int, c_out: int, m1: int, m2: int) -> dict:
    scale = 1.0 / (c_in * c_out)
    ks = jax.random.split(key, 4)
    shape = (c_in, c_out, m1, m2)
    # reference: scale * rand(...) with complex entries (model.py:27-28)
    return {
        "w1_re": scale * jax.random.uniform(ks[0], shape),
        "w1_im": scale * jax.random.uniform(ks[1], shape),
        "w2_re": scale * jax.random.uniform(ks[2], shape),
        "w2_im": scale * jax.random.uniform(ks[3], shape),
    }


def _check_modes_2d(h: int, w: int, m1: int, m2: int) -> None:
    """Kept modes must fit the grid: below ``2*m1`` DFT rows the two
    spectrum-end row selections overlap and the conv silently computes a
    DIFFERENT operator (the fft path's corner scatters overwrite each
    other); the matmul path would mis-shape.  Both impls validate so a
    too-small grid fails identically on every backend."""
    if h < 2 * m1 or m2 > w // 2 + 1:
        raise ValueError(
            f"grid {h}x{w} too small for spectral modes ({m1},{m2}); "
            "pad the domain or reduce modes")


def _spectral_conv(p: dict, x: jnp.ndarray, m1: int, m2: int) -> jnp.ndarray:
    """SpectralConv2d.forward (model.py:35-49). x: [B, C, H, W]."""
    h, w = x.shape[-2], x.shape[-1]
    _check_modes_2d(h, w, m1, m2)
    x_ft = jnp.fft.rfft2(x)  # [B, C, H, W//2+1] complex
    w1 = p["w1_re"] + 1j * p["w1_im"]
    w2 = p["w2_re"] + 1j * p["w2_im"]
    top = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], w1)
    bot = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], w2)
    c_out = w1.shape[1]
    out_ft = jnp.zeros((x.shape[0], c_out, h, w // 2 + 1), jnp.complex64)
    out_ft = out_ft.at[:, :, :m1, :m2].set(top)
    out_ft = out_ft.at[:, :, -m1:, :m2].set(bot)
    return jnp.fft.irfft2(out_ft, s=(h, w))


@functools.lru_cache(maxsize=32)
def _dft_mats(h: int, w: int, m1: int, m2: int):
    """Precomputed truncated-DFT matrices (numpy, converted at trace time).

    Matches jnp.fft.rfft2 / irfft2 restricted to the kept modes (rows
    ``[0:m1] + [h-m1:h]``, cols ``[0:m2]``), including irfft's ignored
    imaginary parts of the DC / Nyquist columns (the final ``Re``).
    """
    _check_modes_2d(h, w, m1, m2)
    rows = np.concatenate([np.arange(m1), np.arange(h - m1, h)])
    hh = np.arange(h)[:, None]
    ww = np.arange(w)[:, None]
    kw = np.arange(m2)
    fw = np.exp(-2j * np.pi * ww * kw[None, :] / w)          # [W, m2] fwd rDFT
    fh = np.exp(-2j * np.pi * hh * rows[None, :] / h)        # [H, 2m1] fwd DFT
    gh = np.exp(2j * np.pi * rows[:, None] * np.arange(h)[None, :] / h) / h
    c = np.full(m2, 2.0)
    c[0] = 1.0
    if w % 2 == 0 and m2 - 1 == w // 2:
        c[-1] = 1.0  # Nyquist column is not mirrored
    gw = (c[:, None] / w) * np.exp(2j * np.pi * kw[:, None] * np.arange(w)[None, :] / w)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return {k: (f32(v.real), f32(v.imag))
            for k, v in {"fw": fw, "fh": fh, "gh": gh, "gw": gw}.items()}


def _complex_block(re_im) -> np.ndarray:
    """[K, N] complex matrix (as a re/im pair) -> [K, 2, N, 2] real block
    so a complex GEMM is ONE einsum: contraction over (K, in-re/im ``e``),
    output over (N, out-re/im ``f``).  Shared by the 2D and 3D packed
    DFT-matrix builders."""
    re, im = re_im
    return np.ascontiguousarray(
        np.stack([np.stack([re, im], -1), np.stack([-im, re], -1)], 1),
        np.float32)


@functools.lru_cache(maxsize=32)
def _dft_mats_packed(h: int, w: int, m1: int, m2: int):
    """Complex-block-packed ``_dft_mats`` (see ``_dft_mats_3d_packed``):
    one einsum per complex stage.  ``fw`` (real input) and ``gw`` (real
    output, Re() folded in) carry half blocks."""
    m = _dft_mats(h, w, m1, m2)
    blk = _complex_block
    fw = np.ascontiguousarray(np.stack(m["fw"], -1), np.float32)  # [W,m2,2]
    gw = np.ascontiguousarray(
        np.stack([m["gw"][0], -m["gw"][1]], 1), np.float32)       # [m2,2,W]
    return {"fw": fw, "fh": blk(m["fh"]), "gh": blk(m["gh"]), "gw": gw}


def _spectral_conv_matmul(p: dict, x: jnp.ndarray, m1: int, m2: int) -> jnp.ndarray:
    """FFT-free spectral conv: truncated-DFT matmuls + mode mix.

    Bit-equivalent (to f32 tolerance) to ``_spectral_conv``; runs entirely
    on the MXU.  Complex arithmetic runs in the packed block form (5 einsums
    instead of 16 — same accumulation lengths, identical CPU numerics; the
    packing won 23%/conv for the 3D operator on the v5e, see
    ``_spectral_conv3d_matmul``).
    """
    h, w = x.shape[-2], x.shape[-1]
    mats = _dft_mats_packed(h, w, m1, m2)
    fw, fh, gh, gw = (jnp.asarray(mats[k]) for k in ("fw", "fh", "gh", "gw"))
    # weights for rows [0:m1] (w1) and [h-m1:h] (w2), stacked, then blocked
    w_re = jnp.concatenate([p["w1_re"], p["w2_re"]], axis=2)  # [Ci,Co,2m1,m2]
    w_im = jnp.concatenate([p["w1_im"], p["w2_im"]], axis=2)
    wgt = jnp.stack([jnp.stack([w_re, w_im], -1),
                     jnp.stack([-w_im, w_re], -1)], 2)        # [i,o,e,r,k,f]

    t = jnp.einsum("bchw,wkf->bchkf", x, fw)       # forward rDFT over W
    v = jnp.einsum("bchke,herf->bcrkf", t, fh)     # truncated DFT over H
    y = jnp.einsum("birke,ioerkf->borkf", v, wgt)  # per-mode channel mix
    z = jnp.einsum("borke,rehf->bohkf", y, gh)     # inverse DFT over H
    # real-output inverse rDFT over W (Re() folded into gw's half block)
    return jnp.einsum("bohke,kew->bohw", z, gw)


def _spectral_init_3d(key, c_in: int, c_out: int,
                      m1: int, m2: int, m3: int) -> dict:
    """3D spectral weights, one stacked block over the concatenated kept
    rows (d-rows ``[0:m1]+[D-m1:D]`` -> axis of size 2*m1, h-rows likewise)
    — the single-tensor equivalent of the canonical four corner blocks."""
    scale = 1.0 / (c_in * c_out)
    ks = jax.random.split(key, 2)
    shape = (c_in, c_out, 2 * m1, 2 * m2, m3)
    return {"w_re": scale * jax.random.uniform(ks[0], shape),
            "w_im": scale * jax.random.uniform(ks[1], shape)}


def _check_modes_3d(d: int, h: int, w: int,
                    m1: int, m2: int, m3: int) -> None:
    """3D analog of ``_check_modes_2d``: both spectral impls validate, so a
    too-small grid fails identically on every backend instead of the fft
    path silently computing an overlap-corrupted operator."""
    if d < 2 * m1 or h < 2 * m2 or m3 > w // 2 + 1:
        raise ValueError(
            f"grid {d}x{h}x{w} too small for spectral modes "
            f"({m1},{m2},{m3}); pad the domain or reduce modes")


def _spectral_conv_3d(p: dict, x: jnp.ndarray,
                      m1: int, m2: int, m3: int) -> jnp.ndarray:
    """FFT-path 3D spectral conv (CPU parity oracle). x: [B, C, D, H, W].

    Same structure as ``_spectral_conv`` one axis up: rFFT over the last
    axis, full DFT over D and H with modes kept from both spectrum ends.
    """
    d, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    _check_modes_3d(d, h, w, m1, m2, m3)
    x_ft = jnp.fft.rfftn(x, axes=(-3, -2, -1))  # [B, C, D, H, W//2+1]
    xd = jnp.concatenate([x_ft[:, :, :m1], x_ft[:, :, d - m1:]], axis=2)
    sel = jnp.concatenate([xd[:, :, :, :m2], xd[:, :, :, h - m2:]], axis=3)
    sel = sel[..., :m3]
    wgt = p["w_re"] + 1j * p["w_im"]
    out = jnp.einsum("birsk,iorsk->borsk", sel, wgt)
    c_out = wgt.shape[1]
    out_ft = jnp.zeros((x.shape[0], c_out, d, h, w // 2 + 1), jnp.complex64)
    out_ft = out_ft.at[:, :, :m1, :m2, :m3].set(out[:, :, :m1, :m2])
    out_ft = out_ft.at[:, :, :m1, h - m2:, :m3].set(out[:, :, :m1, m2:])
    out_ft = out_ft.at[:, :, d - m1:, :m2, :m3].set(out[:, :, m1:, :m2])
    out_ft = out_ft.at[:, :, d - m1:, h - m2:, :m3].set(out[:, :, m1:, m2:])
    return jnp.fft.irfftn(out_ft, s=(d, h, w), axes=(-3, -2, -1))


@functools.lru_cache(maxsize=32)
def _dft_mats_3d(d: int, h: int, w: int, m1: int, m2: int, m3: int):
    """Per-axis truncated-DFT matrices for the 3D matmul spectral conv.

    ``fd``/``fh`` are full forward DFTs restricted to the kept rows
    (both spectrum ends), ``fw`` the forward rDFT columns; ``gd``/``gh``
    the matching inverses, ``gw`` the real-output inverse rDFT with the
    Hermitian-mirror doubling (DC / even-W Nyquist columns not doubled) —
    identical math to the 2D ``_dft_mats``, one axis more.
    """
    _check_modes_3d(d, h, w, m1, m2, m3)

    def full_axis(n, m):
        rows = np.concatenate([np.arange(m), np.arange(n - m, n)])
        ar = np.arange(n)
        f = np.exp(-2j * np.pi * ar[:, None] * rows[None, :] / n)   # [n, 2m]
        g = np.exp(2j * np.pi * rows[:, None] * ar[None, :] / n) / n  # [2m, n]
        return f, g

    fd, gd = full_axis(d, m1)
    fh, gh = full_axis(h, m2)
    kw = np.arange(m3)
    ar = np.arange(w)
    fw = np.exp(-2j * np.pi * ar[:, None] * kw[None, :] / w)        # [W, m3]
    c = np.full(m3, 2.0)
    c[0] = 1.0
    if w % 2 == 0 and m3 - 1 == w // 2:
        c[-1] = 1.0  # Nyquist column is not mirrored
    gw = (c[:, None] / w) * np.exp(2j * np.pi * kw[:, None] * ar[None, :] / w)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return {k: (f32(v.real), f32(v.imag))
            for k, v in {"fd": fd, "fh": fh, "fw": fw,
                         "gd": gd, "gh": gh, "gw": gw}.items()}


@functools.lru_cache(maxsize=32)
def _dft_mats_3d_packed(d: int, h: int, w: int, m1: int, m2: int, m3: int):
    """Complex-block-packed forms of ``_dft_mats_3d`` for the 3D matmul
    spectral conv: each complex matrix [K, N] becomes one real block tensor
    [K, 2, N, 2] (axes: contraction, in-re/im ``e``, output, out-re/im
    ``f``) so a whole complex GEMM is ONE einsum with doubled K and N
    instead of four narrow ones.  Measured 23% faster per conv on the v5e —
    the chain is dispatch/serialization-bound, not FLOP-bound (0.7% MFU), so
    fewer, wider GEMMs win.  ``fw`` (real input) and ``gw`` (real output)
    need only half the block."""
    m = _dft_mats_3d(d, h, w, m1, m2, m3)
    blk = _complex_block
    fw = np.ascontiguousarray(np.stack(m["fw"], -1), np.float32)  # [W,m3,2]
    gw = np.ascontiguousarray(
        np.stack([m["gw"][0], -m["gw"][1]], 1), np.float32)       # [m3,2,W]
    return {"fw": fw, "fh": blk(m["fh"]), "fd": blk(m["fd"]),
            "gd": blk(m["gd"]), "gh": blk(m["gh"]), "gw": gw}


def _spectral_conv3d_matmul(p: dict, x: jnp.ndarray,
                            m1: int, m2: int, m3: int) -> jnp.ndarray:
    """FFT-free 3D spectral conv: truncated-DFT matmuls + mode mix.

    Pure MXU work — the TPU production path (parity vs ``_spectral_conv_3d``
    tested to f32 tolerance).  Complex arithmetic runs in the packed block
    form (one einsum per stage over [K, 2, N, 2] matrices — see
    ``_dft_mats_3d_packed``): 7 einsums total instead of 22, same
    per-element accumulation lengths as the unpacked expansion (identical
    numerics on CPU; measured dead-even alternatives on the v5e: a combined
    (D,H)->modes single GEMM (3.86 vs 4.13 ms) pays K=D*H*2 bf16
    accumulation for 7%, a fully lane-major reshape form is slower, 4.43)."""
    mats = _dft_mats_3d_packed(
        x.shape[-3], x.shape[-2], x.shape[-1], m1, m2, m3)
    fw, fh, fd, gd, gh, gw = (jnp.asarray(mats[k])
                              for k in ("fw", "fh", "fd", "gd", "gh", "gw"))
    # weight block [i, o, e, r, s, k, f] from the stored re/im pair
    wgt = jnp.stack([jnp.stack([p["w_re"], p["w_im"]], -1),
                     jnp.stack([-p["w_im"], p["w_re"]], -1)], 2)

    # forward: x real -> rDFT over W, then truncated full DFTs over H, D
    t = jnp.einsum("bcdhw,wkf->bcdhkf", x, fw)
    u = jnp.einsum("bcdhke,hesf->bcdskf", t, fh)
    v = jnp.einsum("bcdske,derf->bcrskf", u, fd)
    # per-mode channel mixing
    y = jnp.einsum("birske,ioerskf->borskf", v, wgt)
    # inverse: D, H (complex), then real-output rDFT inverse over W — the
    # Re() projection is folded into gw's half block (reproduces irfftn's
    # ignored DC/Nyquist imaginary parts)
    z = jnp.einsum("borske,redf->bodskf", y, gd)
    a = jnp.einsum("bodske,sehf->bodhkf", z, gh)
    return jnp.einsum("bodhke,kew->bodhw", a, gw)


def _conv1x1_init(key, c_in: int, c_out: int) -> dict:
    # torch Conv2d(k=1) default init == Linear over the channel dim
    return linear_init(key, c_in, c_out)


def _conv1x1(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv on [B, C, H, W] == channel matmul."""
    return jnp.einsum("bchw,cd->bdhw", x, p["w"]) + p["b"][None, :, None, None]


def _mlp_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """MLP (model.py:51-61): conv1x1 -> gelu -> conv1x1 on [B, C, H, W]."""
    return _conv1x1(p["mlp2"], jax.nn.gelu(_conv1x1(p["mlp1"], x), approximate=False))


@dataclasses.dataclass(frozen=True)
class FNO2d:
    """Static config (model.py:63-99). ``in_feats`` is the raw field channels."""

    modes1: int
    modes2: int
    width: int
    in_feats: int = 256
    padding: int = 9
    # 'fft' | 'matmul' | 'auto' (env FESR_FNO_IMPL overrides).  auto -> fft on
    # CPU (XLA's pocketfft is fastest there), matmul on accelerators (MXU
    # matmuls; also the only choice where the backend lacks an FFT lowering).
    spectral_impl: str = "auto"

    def _resolve_impl(self) -> str:
        impl = os.environ.get("FESR_FNO_IMPL", self.spectral_impl)
        if impl == "auto":
            impl = "fft" if jax.default_backend() == "cpu" else "matmul"
        if impl not in ("fft", "matmul"):
            raise ValueError(f"unknown spectral impl {impl!r}")
        return impl

    def init(self, key) -> dict:
        w = self.width
        ks = jax.random.split(key, 14)
        params = {
            "p": linear_init(ks[0], self.in_feats + 2, w),
            "q": {"mlp1": _conv1x1_init(ks[1], w, w * 4),
                  "mlp2": _conv1x1_init(ks[2], w * 4, 128)},
        }
        for i in range(4):
            params[f"conv{i}"] = _spectral_init(ks[3 + i], w, w, self.modes1, self.modes2)
            params[f"w{i}"] = _conv1x1_init(ks[7 + i], w, w)
            # independent draws per block: fold the block index into distinct
            # base keys (a shared base key would start mlp0-2 bit-identical)
            params[f"mlp{i}"] = {
                "mlp1": _conv1x1_init(jax.random.fold_in(ks[11], i), w, w),
                "mlp2": _conv1x1_init(jax.random.fold_in(ks[12], i), w, w)}
        return params

    def import_pth(self, state_dict) -> dict:
        """Params from a torch FNO2d state_dict (model.py:63-99 layout):
        p.*, conv{0-3}.weights{1,2} (complex), mlp{0-3}.mlp{1,2}.* (1x1 Conv2d),
        w{0-3}.* (1x1 Conv2d), q.mlp{1,2}.*."""
        import numpy as np

        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}

        def lin(prefix):  # torch Linear [out,in] -> {'w': [in,out]}
            return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T, jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        def conv1x1(prefix):  # Conv2d k=1 weight [out,in,1,1]
            w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0, 0]
            return {"w": jnp.asarray(w.T, jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        params = {"p": lin("p"),
                  "q": {"mlp1": conv1x1("q.mlp1"), "mlp2": conv1x1("q.mlp2")}}
        for i in range(4):
            w1 = np.asarray(sd[f"conv{i}.weights1"])
            w2 = np.asarray(sd[f"conv{i}.weights2"])
            params[f"conv{i}"] = {
                "w1_re": jnp.asarray(w1.real, jnp.float32),
                "w1_im": jnp.asarray(w1.imag, jnp.float32),
                "w2_re": jnp.asarray(w2.real, jnp.float32),
                "w2_im": jnp.asarray(w2.imag, jnp.float32),
            }
            params[f"w{i}"] = conv1x1(f"w{i}")
            params[f"mlp{i}"] = {"mlp1": conv1x1(f"mlp{i}.mlp1"),
                                 "mlp2": conv1x1(f"mlp{i}.mlp2")}
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C_in] -> [B, H, W, 128] (matches model.py:100-133)."""
        b, h, w_dim = x.shape[0], x.shape[1], x.shape[2]
        gridx = jnp.linspace(0, 1, h).reshape(1, h, 1, 1)
        gridx = jnp.broadcast_to(gridx, (b, h, w_dim, 1))
        gridy = jnp.linspace(0, 1, w_dim).reshape(1, 1, w_dim, 1)
        gridy = jnp.broadcast_to(gridy, (b, h, w_dim, 1))
        x = jnp.concatenate([x, gridx, gridy], axis=-1)
        x = linear(params["p"], x)
        x = jnp.transpose(x, (0, 3, 1, 2))  # [B, C, H, W]
        pad = self.padding
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, pad)))
        spectral = (_spectral_conv if self._resolve_impl() == "fft"
                    else _spectral_conv_matmul)

        for i in range(4):
            x1 = spectral(params[f"conv{i}"], x, self.modes1, self.modes2)
            x1 = _mlp_block(params[f"mlp{i}"], x1)
            x2 = _conv1x1(params[f"w{i}"], x)
            x = x1 + x2
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)

        if pad:  # [:-0] would silently produce empty H/W dims
            x = x[..., :-pad, :-pad]
        x = _mlp_block(params["q"], x)
        return jnp.transpose(x, (0, 2, 3, 1))


def _conv1x1_3d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 conv on [B, C, D, H, W] == channel matmul."""
    return (jnp.einsum("bcdhw,ce->bedhw", x, p["w"])
            + p["b"][None, :, None, None, None])


def _mlp_block_3d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return _conv1x1_3d(p["mlp2"],
                       jax.nn.gelu(_conv1x1_3d(p["mlp1"], x), approximate=False))


@dataclasses.dataclass(frozen=True)
class FNO3d:
    """3D Fourier Neural Operator — the volumetric extension of FNO2d.

    Beyond-parity: the reference ships only the 2D operator
    (/root/reference/models/model.py:13-141) although its CFD setting is
    3D; this class applies the same four-block architecture (spectral conv
    + per-block MLP + 1x1 skip, GELU between blocks, domain padding, grid
    concat in the lift) to [B, D, H, W, C] volumes.  The spectral conv uses
    the stacked-corner weight layout and, off-CPU, the matmul-DFT
    implementation (six truncated-DFT matmuls — pure MXU, no FFT
    primitive), exactly like FNO2d one axis up.
    """

    modes1: int
    modes2: int
    modes3: int
    width: int
    in_feats: int = 1
    padding: int = 6
    spectral_impl: str = "auto"

    _resolve_impl = FNO2d._resolve_impl

    def init(self, key) -> dict:
        w = self.width
        ks = jax.random.split(key, 14)
        params = {
            "p": linear_init(ks[0], self.in_feats + 3, w),
            "q": {"mlp1": _conv1x1_init(ks[1], w, w * 4),
                  "mlp2": _conv1x1_init(ks[2], w * 4, 128)},
        }
        for i in range(4):
            params[f"conv{i}"] = _spectral_init_3d(
                ks[3 + i], w, w, self.modes1, self.modes2, self.modes3)
            params[f"w{i}"] = _conv1x1_init(ks[7 + i], w, w)
            params[f"mlp{i}"] = {
                "mlp1": _conv1x1_init(jax.random.fold_in(ks[11], i), w, w),
                "mlp2": _conv1x1_init(jax.random.fold_in(ks[12], i), w, w)}
        return params

    def import_pth(self, state_dict) -> dict:
        """Params from the canonical torch FNO3d layout (four corner weight
        blocks ``conv{i}.weights{1-4}`` covering the (d, h) spectrum-end
        combinations), mapped onto the stacked [Ci,Co,2m1,2m2,m3] block:
        rows ``[0:m1]`` = low d / ``[m1:2m1]`` = high d, cols likewise."""
        import numpy as np

        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}

        def lin(prefix):
            return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T,
                                     jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        def conv1x1(prefix):  # Conv3d k=1 weight [out,in,1,1,1] (or [o,i,1,1])
            w = np.asarray(sd[f"{prefix}.weight"])
            w = w.reshape(w.shape[0], w.shape[1])
            return {"w": jnp.asarray(w.T, jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        params = {"p": lin("p"),
                  "q": {"mlp1": conv1x1("q.mlp1"), "mlp2": conv1x1("q.mlp2")}}
        for i in range(4):
            corners = [np.asarray(sd[f"conv{i}.weights{j}"]) for j in (1, 2, 3, 4)]
            # canonical order: w1 = (low d, low h), w2 = (high d, low h),
            # w3 = (low d, high h), w4 = (high d, high h)
            lo = np.concatenate([corners[0], corners[2]], axis=3)
            hi = np.concatenate([corners[1], corners[3]], axis=3)
            w = np.concatenate([lo, hi], axis=2)
            params[f"conv{i}"] = {
                "w_re": jnp.asarray(w.real, jnp.float32),
                "w_im": jnp.asarray(w.imag, jnp.float32)}
            params[f"w{i}"] = conv1x1(f"w{i}")
            params[f"mlp{i}"] = {"mlp1": conv1x1(f"mlp{i}.mlp1"),
                                 "mlp2": conv1x1(f"mlp{i}.mlp2")}
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, D, H, W, C_in] -> [B, D, H, W, 128]."""
        b, d, h, w_dim = x.shape[0], x.shape[1], x.shape[2], x.shape[3]

        def axis_grid(n, axis):
            g = jnp.linspace(0, 1, n).reshape(
                [1] + [n if a == axis else 1 for a in range(3)] + [1])
            return jnp.broadcast_to(g, (b, d, h, w_dim, 1))

        x = jnp.concatenate(
            [x, axis_grid(d, 0), axis_grid(h, 1), axis_grid(w_dim, 2)], axis=-1)
        x = linear(params["p"], x)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # [B, C, D, H, W]
        pad = self.padding
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, pad), (0, pad)))
        spectral = (_spectral_conv_3d if self._resolve_impl() == "fft"
                    else _spectral_conv3d_matmul)

        for i in range(4):
            x1 = spectral(params[f"conv{i}"], x,
                          self.modes1, self.modes2, self.modes3)
            x1 = _mlp_block_3d(params[f"mlp{i}"], x1)
            x2 = _conv1x1_3d(params[f"w{i}"], x)
            x = x1 + x2
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)

        if pad:
            x = x[..., :-pad, :-pad, :-pad]
        x = _mlp_block_3d(params["q"], x)
        return jnp.transpose(x, (0, 2, 3, 4, 1))


# ---------------------------------------------------------------------------
# FNO1d — the 1D member of the operator family (Burgers' canonical task).
# Beyond-parity: the reference ships only FNO2d (model.py:13-141); this class
# completes the canonical neural-operator trio (Burgers / Darcy / NS) one
# axis down, with the same four-block architecture and the same matmul-DFT
# production path off-CPU (two truncated-DFT matmuls — no FFT primitive).
# ---------------------------------------------------------------------------


def _spectral_init_1d(key, c_in: int, c_out: int, m1: int) -> dict:
    """1D spectral weights: the rFFT keeps only the first ``m1`` modes (no
    spectrum-end block — negative frequencies are the conjugate mirror)."""
    scale = 1.0 / (c_in * c_out)
    ks = jax.random.split(key, 2)
    shape = (c_in, c_out, m1)
    return {"w_re": scale * jax.random.uniform(ks[0], shape),
            "w_im": scale * jax.random.uniform(ks[1], shape)}


def _check_modes_1d(w: int, m1: int) -> None:
    """Same contract as ``_check_modes_2d``: both impls validate so a
    too-small grid fails identically on every backend."""
    if m1 > w // 2 + 1:
        raise ValueError(
            f"grid length {w} too small for spectral modes ({m1},); "
            "pad the domain or reduce modes")


def _spectral_conv_1d(p: dict, x: jnp.ndarray, m1: int) -> jnp.ndarray:
    """rFFT -> truncated complex mode mix -> irFFT.  x: [B, C, W]."""
    w = x.shape[-1]
    _check_modes_1d(w, m1)
    x_ft = jnp.fft.rfft(x)  # [B, C, W//2+1] complex
    wgt = p["w_re"] + 1j * p["w_im"]
    mixed = jnp.einsum("bix,iox->box", x_ft[:, :, :m1], wgt)
    c_out = wgt.shape[1]
    out_ft = jnp.zeros((x.shape[0], c_out, w // 2 + 1), jnp.complex64)
    out_ft = out_ft.at[:, :, :m1].set(mixed)
    return jnp.fft.irfft(out_ft, n=w)


@functools.lru_cache(maxsize=32)
def _dft_mats_1d(w: int, m1: int):
    """Truncated rDFT / inverse-rDFT matrices matching jnp.fft.rfft/irfft
    restricted to modes [0:m1] (incl. the doubled-column Re() fold with DC
    and even-W Nyquist exceptions — same construction as ``_dft_mats``)."""
    _check_modes_1d(w, m1)
    ww = np.arange(w)[:, None]
    kw = np.arange(m1)
    fw = np.exp(-2j * np.pi * ww * kw[None, :] / w)  # [W, m1] fwd rDFT
    c = np.full(m1, 2.0)
    c[0] = 1.0
    if w % 2 == 0 and m1 - 1 == w // 2:
        c[-1] = 1.0  # Nyquist column is not mirrored
    gw = (c[:, None] / w) * np.exp(
        2j * np.pi * kw[:, None] * np.arange(w)[None, :] / w)  # [m1, W]
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return {"fw": (f32(fw.real), f32(fw.imag)),
            "gw": (f32(gw.real), f32(gw.imag))}


@functools.lru_cache(maxsize=32)
def _dft_mats_1d_packed(w: int, m1: int):
    """Complex-block-packed ``_dft_mats_1d``: ``fw`` (real input) and ``gw``
    (real output, Re() folded in) carry half blocks — one einsum each."""
    m = _dft_mats_1d(w, m1)
    fw = np.ascontiguousarray(np.stack(m["fw"], -1), np.float32)   # [W,m1,2]
    gw = np.ascontiguousarray(
        np.stack([m["gw"][0], -m["gw"][1]], 1), np.float32)        # [m1,2,W]
    return {"fw": fw, "gw": gw}


def _spectral_conv1d_matmul(p: dict, x: jnp.ndarray, m1: int) -> jnp.ndarray:
    """FFT-free 1D spectral conv: two truncated-DFT matmuls + mode mix,
    bit-equivalent (to f32 tolerance) to ``_spectral_conv_1d`` — pure MXU
    work, the production path on accelerators (the axon relay's TPU backend
    has no FFT lowering at all, CLAUDE.md)."""
    w = x.shape[-1]
    mats = _dft_mats_1d_packed(w, m1)
    fw, gw = jnp.asarray(mats["fw"]), jnp.asarray(mats["gw"])
    wgt = jnp.stack([jnp.stack([p["w_re"], p["w_im"]], -1),
                     jnp.stack([-p["w_im"], p["w_re"]], -1)], 2)  # [i,o,e,k,f]
    t = jnp.einsum("bcw,wkf->bckf", x, fw)       # forward rDFT over W
    y = jnp.einsum("bike,ioekf->bokf", t, wgt)   # per-mode channel mix
    return jnp.einsum("boke,kew->bow", y, gw)    # real-output inverse rDFT


def _conv1x1_1d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv on [B, C, W] == channel matmul."""
    return jnp.einsum("bcw,cd->bdw", x, p["w"]) + p["b"][None, :, None]


def _mlp_block_1d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return _conv1x1_1d(p["mlp2"],
                       jax.nn.gelu(_conv1x1_1d(p["mlp1"], x), approximate=False))


@dataclasses.dataclass(frozen=True)
class FNO1d:
    """1D Fourier Neural Operator (Burgers' task member of the family).

    Same four-block architecture as FNO2d/FNO3d (spectral conv + per-block
    MLP + 1x1 skip, GELU between blocks, grid concat in the lift) on
    [B, W, C] lines.  ``padding`` defaults to 0: the canonical Burgers task
    is periodic, so no domain pad is needed (set it for non-periodic data).
    """

    modes1: int
    width: int
    in_feats: int = 2
    padding: int = 0
    spectral_impl: str = "auto"

    _resolve_impl = FNO2d._resolve_impl

    def init(self, key) -> dict:
        w = self.width
        ks = jax.random.split(key, 14)
        params = {
            "p": linear_init(ks[0], self.in_feats + 1, w),
            "q": {"mlp1": _conv1x1_init(ks[1], w, w * 4),
                  "mlp2": _conv1x1_init(ks[2], w * 4, 128)},
        }
        for i in range(4):
            params[f"conv{i}"] = _spectral_init_1d(ks[3 + i], w, w, self.modes1)
            params[f"w{i}"] = _conv1x1_init(ks[7 + i], w, w)
            params[f"mlp{i}"] = {
                "mlp1": _conv1x1_init(jax.random.fold_in(ks[11], i), w, w),
                "mlp2": _conv1x1_init(jax.random.fold_in(ks[12], i), w, w)}
        return params

    def import_pth(self, state_dict) -> dict:
        """Params from the canonical torch FNO1d layout: ``conv{i}.weights1``
        (complex [Ci, Co, m1]), 1x1 Conv1d ``w{i}``/``mlp{i}.mlp{1,2}``/
        ``q.mlp{1,2}``, Linear ``p``."""
        import numpy as np

        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in state_dict.items()}

        def lin(prefix):
            return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T,
                                     jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        def conv1x1(prefix):  # Conv1d k=1 weight [out, in, 1]
            w = np.asarray(sd[f"{prefix}.weight"])
            w = w.reshape(w.shape[0], w.shape[1])
            return {"w": jnp.asarray(w.T, jnp.float32),
                    "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

        params = {"p": lin("p"),
                  "q": {"mlp1": conv1x1("q.mlp1"), "mlp2": conv1x1("q.mlp2")}}
        for i in range(4):
            w1 = np.asarray(sd[f"conv{i}.weights1"])
            params[f"conv{i}"] = {
                "w_re": jnp.asarray(w1.real, jnp.float32),
                "w_im": jnp.asarray(w1.imag, jnp.float32)}
            params[f"w{i}"] = conv1x1(f"w{i}")
            params[f"mlp{i}"] = {"mlp1": conv1x1(f"mlp{i}.mlp1"),
                                 "mlp2": conv1x1(f"mlp{i}.mlp2")}
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, W, C_in] -> [B, W, 128]."""
        b, w_dim = x.shape[0], x.shape[1]
        gridx = jnp.broadcast_to(
            jnp.linspace(0, 1, w_dim).reshape(1, w_dim, 1), (b, w_dim, 1))
        x = jnp.concatenate([x, gridx], axis=-1)
        x = linear(params["p"], x)
        x = jnp.transpose(x, (0, 2, 1))  # [B, C, W]
        pad = self.padding
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        spectral = (_spectral_conv_1d if self._resolve_impl() == "fft"
                    else _spectral_conv1d_matmul)

        for i in range(4):
            x1 = spectral(params[f"conv{i}"], x, self.modes1)
            x1 = _mlp_block_1d(params[f"mlp{i}"], x1)
            x2 = _conv1x1_1d(params[f"w{i}"], x)
            x = x1 + x2
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)

        if pad:
            x = x[..., :-pad]
        x = _mlp_block_1d(params["q"], x)
        return jnp.transpose(x, (0, 2, 1))
