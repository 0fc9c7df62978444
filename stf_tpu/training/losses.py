"""Rate-distortion training losses.

Reference: `train.py:39-59` — loss = lambda * 255² * MSE + bpp, where
bpp sums -log2(likelihood) over all latents per pixel. The MS-SSIM variant
(used for the ms-ssim-optimized checkpoints) swaps the distortion term for
`lambda * (1 - ms_ssim)`.
"""

import math
from typing import Any, Dict, NamedTuple

import jax.numpy as jnp


class RDLossOutput(NamedTuple):
    loss: jnp.ndarray
    bpp_loss: jnp.ndarray
    distortion: jnp.ndarray


def bpp_from_likelihoods(likelihoods: Dict[str, Any], num_pixels) -> jnp.ndarray:
    total = 0.0
    for lik in likelihoods.values():
        total = total + jnp.sum(-jnp.log(lik))
    return total / (math.log(2) * num_pixels)


def rate_distortion_loss(
    output: Dict[str, Any], target, lmbda: float, metric: str = "mse"
) -> RDLossOutput:
    B, H, W, _ = target.shape
    num_pixels = B * H * W
    bpp = bpp_from_likelihoods(output["likelihoods"], num_pixels)
    if metric == "mse":
        dist = jnp.mean((output["x_hat"] - target) ** 2)
        loss = lmbda * 255 ** 2 * dist + bpp
    elif metric == "ms-ssim":
        from ..utils.metrics import ms_ssim

        dist = 1.0 - ms_ssim(output["x_hat"], target)
        loss = lmbda * dist + bpp
    else:
        raise ValueError(f"unknown distortion metric {metric!r}")
    return RDLossOutput(loss=loss, bpp_loss=bpp, distortion=dist)
