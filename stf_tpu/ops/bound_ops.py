"""Lower-bound op with the identity-when-pushing-up gradient.

Same gradient rule as the reference (`compressai/ops/bound_ops.py:21-41`):
the forward pass is ``max(x, bound)``; the backward pass lets the gradient
through wherever ``x >= bound`` *or* the incoming gradient would push ``x``
upward (``g < 0``), and zeroes it otherwise. This keeps parameters pinned at
the bound from drifting further down while still allowing recovery.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    # The bound is a hyperparameter, never trained.
    return gx, jnp.zeros_like(jnp.asarray(bound, dtype=gx.dtype))


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)
