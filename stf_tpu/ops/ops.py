"""Straight-through-estimator rounding.

Equivalent to the reference's ``torch.round(x) - x.detach() + x``
(`compressai/ops/ops.py:20-34`): the forward value is ``round(x)`` and the
gradient is the identity.
"""

import jax
import jax.numpy as jnp


def ste_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
