from .classifiers import init_classifier
from .encoders import init_encoder
from .scheduler import PartitionScheduler

__all__ = ["init_classifier", "init_encoder", "PartitionScheduler"]
