from .deeponet import AdaptDeepONet, DeepONet
from .fno import FNO2d
from .graphsage import GraphSAGE
from .kernelnn import KernelNN
from .powerseries import PowerSeriesKernel
from .registry import init_model
from .teecnet import TEECNet

__all__ = ["AdaptDeepONet", "DeepONet", "FNO2d", "GraphSAGE", "KernelNN",
           "PowerSeriesKernel", "TEECNet", "init_model"]
