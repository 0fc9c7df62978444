from .losses import RDLossOutput, rate_distortion_loss
from .state import configure_optimizers, create_train_state, make_train_step

__all__ = [
    "RDLossOutput",
    "rate_distortion_loss",
    "configure_optimizers",
    "create_train_state",
    "make_train_step",
]
