"""Model registry (reference `compressai/zoo/__init__.py:20-27`).

Names match the reference CLI names so eval/training commands are drop-in:
cnn, stf, tbc, cc, cc_gd, dystf.
"""

from ..models import WACNN

_REGISTRY = {}


def register(name):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return deco


def _available():
    return dict(_REGISTRY)


class _Models(dict):
    def __missing__(self, key):
        raise KeyError(
            f"unknown model {key!r} (available: {', '.join(sorted(self))})"
        )


models = _Models()


def _register_builtin():
    models["cnn"] = WACNN
    try:
        from ..models.stf import SymmetricalTransFormer

        models["stf"] = SymmetricalTransFormer
    except ImportError:
        pass
    try:
        from ..models.cc import CC

        models["cc"] = CC
    except ImportError:
        pass
    try:
        from ..models.tbc import TransformerBasedCoding

        models["tbc"] = TransformerBasedCoding
    except ImportError:
        pass
    try:
        from ..models.cc_gd import CC_GD

        models["cc_gd"] = CC_GD
    except ImportError:
        pass
    try:
        from ..models.dystf import DYSTF

        models["dystf"] = DYSTF
    except ImportError:
        pass


_register_builtin()


def create_model(name: str, **kwargs):
    return models[name](**kwargs)
