"""Generalized Divisive Normalization (NHWC).

y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j,i] x[j]²) — reference
`compressai/layers/gdn.py:26-104`. The 1x1 conv over x² becomes a plain
matmul over the channel axis in NHWC, which XLA maps straight onto the MXU
and fuses with the surrounding elementwise ops.

beta/gamma are stored in NonNegativeParametrizer space (sqrt(v + pedestal));
the pedestal math is kept bit-identical to the reference for training
stability.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import NonNegativeParametrizer


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    def setup(self):
        self.beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        self.gamma_reparam = NonNegativeParametrizer()
        C = self.channels
        self.beta = self.param(
            "beta",
            lambda key, shape: self.beta_reparam.init(jnp.ones(shape)),
            (C,),
        )
        self.gamma = self.param(
            "gamma",
            lambda key, shape: self.gamma_reparam.init(
                self.gamma_init * jnp.eye(C)
            ),
            (C, C),
        )

    def _norm_input(self, x):
        return x * x

    def __call__(self, x):
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma)  # (C_out, C_in)
        # 1x1 conv over the normalized input: NHWC @ gamma^T
        norm = jnp.einsum("bhwc,oc->bhwo", self._norm_input(x), gamma) + beta
        if self.inverse:
            norm = jnp.sqrt(norm)
        else:
            norm = jax.lax.rsqrt(norm)
        return x * norm


class GDN1(GDN):
    """|x| variant without the sqrt (`gdn.py:78-104`)."""

    def _norm_input(self, x):
        return jnp.abs(x)

    def __call__(self, x):
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma)
        norm = jnp.einsum("bhwc,oc->bhwo", self._norm_input(x), gamma) + beta
        if not self.inverse:
            norm = jnp.reciprocal(norm)
        return x * norm
