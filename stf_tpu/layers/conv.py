"""Convolution helpers (NHWC, torch-aligned explicit padding).

The reference uses torch Conv2d/ConvTranspose2d with ``padding=k//2`` (and
``output_padding=stride-1`` for deconvs) — see `compressai/models/utils.py:
114-132` and `compressai/layers/layers.py:29-43`. XLA's ``SAME`` padding
distributes asymmetric padding differently for strided convs, which would
shift feature maps by one pixel versus imported checkpoints, so padding is
always given explicitly here.

All spatial ops are NHWC (TPU-native layout); 1x1 convs lower to plain
matmuls on the MXU.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """Strided conv, torch-style symmetric padding k//2 by default."""

    features: int
    kernel_size: int = 5
    stride: int = 1
    padding: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2 if self.padding is None else self.padding
        return nn.Conv(
            self.features,
            _pair(k),
            strides=_pair(self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_normal(),
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv matching torch's ConvTranspose2d with
    ``padding=k//2`` and ``output_padding=stride-1`` (exact 2x upsampling:
    output spatial = input * stride).

    Implemented via input dilation: pad the (stride-dilated) input with
    ``(k-1-p, k-1-p+output_padding)`` and run a regular conv — the layout
    torch uses, so imported kernels line up pixel-exactly.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        out_pad = self.stride - 1
        pad = (k - 1 - p, k - 1 - p + out_pad)
        return nn.ConvTranspose(
            self.features,
            _pair(k),
            strides=_pair(self.stride),
            padding=(pad, pad),
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_normal(),
        )(x)


def pixel_shuffle(x, r: int):
    """Depth-to-space with torch PixelShuffle's channel ordering:
    channel index c*r² + i*r + j maps to spatial offset (i, j)."""
    B, H, W, C = x.shape
    assert C % (r * r) == 0, f"channels {C} not divisible by r²={r * r}"
    c_out = C // (r * r)
    x = x.reshape(B, H, W, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c_out)


class PixelShuffle(nn.Module):
    """Module wrapper over `pixel_shuffle` (param-free)."""

    r: int

    @nn.compact
    def __call__(self, x):
        return pixel_shuffle(x, self.r)


def conv3x3(features: int, stride: int = 1, name=None) -> nn.Module:
    return Conv(features, kernel_size=3, stride=stride, name=name)


def conv1x1(features: int, stride: int = 1, name=None) -> nn.Module:
    return Conv(features, kernel_size=1, stride=stride, padding=0, name=name)


class subpel_conv3x3(nn.Module):
    """3x3 conv + PixelShuffle upsampler (`layers/layers.py:34-38`)."""

    features: int
    r: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features * self.r ** 2, kernel_size=3, stride=1)(x)
        return PixelShuffle(self.r)(x)


def gelu(x):
    """Exact (erf-based) GELU — torch's default, unlike jax's tanh approx."""
    return nn.gelu(x, approximate=False)
