from .cc import CC
from .cnn import WACNN
from .codec import Codec
from .dystf import DYSTF
from .stf import SymmetricalTransFormer
from .tbc import TransformerBasedCoding

__all__ = [
    "CC",
    "DYSTF",
    "WACNN",
    "Codec",
    "SymmetricalTransFormer",
    "TransformerBasedCoding",
]
