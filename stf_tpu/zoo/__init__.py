from .registry import create_model, models
from .checkpoint import load_any_checkpoint, load_checkpoint, save_checkpoint

__all__ = [
    "models",
    "create_model",
    "load_any_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
]
