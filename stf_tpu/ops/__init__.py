from .bound_ops import lower_bound
from .ops import ste_round
from .parametrizers import NonNegativeParametrizer

__all__ = ["lower_bound", "ste_round", "NonNegativeParametrizer"]
