"""Model registry (reference `compressai/zoo/__init__.py:20-27`).

Names match the reference CLI names so eval/training commands are drop-in:
cnn, stf, tbc, cc, cc_gd, dystf. Imports are deliberately unguarded — a
broken model module must fail loudly at import time, not silently vanish
from the registry.
"""

from ..models import WACNN
from ..models.cc import CC
from ..models.cc_gd import CC_GD
from ..models.dystf import DYSTF
from ..models.stf import SymmetricalTransFormer
from ..models.tbc import TransformerBasedCoding


class _Models(dict):
    def __missing__(self, key):
        raise KeyError(
            f"unknown model {key!r} (available: {', '.join(sorted(self))})"
        )


models = _Models(
    cnn=WACNN,
    stf=SymmetricalTransFormer,
    tbc=TransformerBasedCoding,
    dystf=DYSTF,
    cc=CC,
    cc_gd=CC_GD,
)


def create_model(name: str, **kwargs):
    return models[name](**kwargs)
