from .registry import create_model, models
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = ["models", "create_model", "load_checkpoint", "save_checkpoint"]
