from .dispatch import make_routed_apply, stack_params
from .mesh import make_mesh, pad_batch_to_multiple, replicate, shard_batch
from .train import Trainer

__all__ = ["make_routed_apply", "stack_params", "make_mesh",
           "pad_batch_to_multiple", "replicate", "shard_batch", "Trainer"]
