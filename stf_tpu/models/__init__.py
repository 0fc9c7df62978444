from .cnn import WACNN
from .codec import Codec
from .stf import SymmetricalTransFormer

__all__ = ["WACNN", "Codec", "SymmetricalTransFormer"]
