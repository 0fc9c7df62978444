"""Non-negative reparametrization used by GDN's beta/gamma.

Semantics match the reference (`compressai/ops/parametrizers.py:23-49`)
exactly — the pedestal/offset math is load-bearing for training stability:
parameters are stored as ``sqrt(v + pedestal)`` and decoded as
``lower_bound(x, sqrt(minimum + pedestal))**2 - pedestal``, which keeps the
decoded value >= minimum with well-behaved gradients near zero.
"""

import jax.numpy as jnp

from .bound_ops import lower_bound


class NonNegativeParametrizer:
    """Stateless helper: `init` encodes raw values, `__call__` decodes them."""

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset ** 2
        self.bound = (self.minimum + self.pedestal) ** 0.5

    def init(self, x):
        """Map an initial (non-negative) value to its stored representation."""
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x):
        """Decode the stored representation back to a >= minimum value."""
        out = lower_bound(x, self.bound)
        return out * out - self.pedestal
