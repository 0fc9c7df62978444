"""Swin-Transformer building blocks on NHWC maps.

Functional rebuild of the reference Swin machinery (`compressai/models/
stf.py:24-381`): SwinTransformerBlock (LN -> (S)W-MSA -> LN -> MLP, both
with DropPath), PatchMerging (2x down, 4C->2C), PatchSplit (2x up via
Linear C->2C + depth-to-space), PatchEmbed (strided conv + LN), and
BasicLayer stage containers for analysis (downsampling) and synthesis
(upsampling) stacks.

Differences from the reference that are deliberate TPU-first choices:
  * features stay NHWC maps end-to-end — no (B, L, C) token-list reshapes
    between stages, so XLA sees one layout and fuses freely;
  * the SW-MSA mask is built with NumPy at trace time (shapes are static
    under jit) instead of on-device tensor writes;
  * stochastic depth uses one fused bernoulli per block (rng stream
    "droppath"), identity at eval.
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv, PixelShuffle, gelu
from .win_attention import WindowAttention, shifted_window_region_labels


class Mlp(nn.Module):
    """Dense -> GELU -> Dense (`stf.py:24-40`)."""

    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.out_features, name="fc2")(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SwinTransformerBlock(nn.Module):
    """LN -> (S)W-MSA -> residual, LN -> MLP -> residual (`stf.py:124-199`).

    Operates on NHWC maps; pads H/W up to window multiples internally.
    """

    dim: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x

        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            labels = shifted_window_region_labels(Hp, Wp, ws, ss)
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        else:
            labels = None

        x = WindowAttention(
            dim=self.dim, window_size=(ws, ws), num_heads=self.num_heads,
            name="attn",
        )(x, labels=labels)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic
        )

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    """2x downsample: gather 2x2 neighborhoods -> LN(4C) -> Dense out, no
    bias (`stf.py:202-235`; generalized out width per `tbc.py:203-237`).
    Pixel order (even,even),(odd,even),(even,odd),(odd,odd) matches the
    reference for checkpoint import. Default out = 2*dim (Swin standard)."""

    dim: int
    out_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        out = self.out_features if self.out_features is not None else 2 * self.dim
        return nn.Dense(out, use_bias=False, name="reduction")(x)


class PatchSplit(nn.Module):
    """2x upsample: LN -> Dense 4*out (no bias) -> depth-to-space, torch
    PixelShuffle channel order (`stf.py:238-260`; generalized out width per
    `tbc.py:240-263`). Default out = dim // 2 (STF's symmetric split)."""

    dim: int
    out_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        out = self.out_features if self.out_features is not None else self.dim // 2
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(4 * out, use_bias=False, name="reduction")(x)
        return PixelShuffle(2)(x)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding: strided conv + optional LN
    (`stf.py:350-381`)."""

    patch_size: int = 2
    embed_dim: int = 48
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        H, W = x.shape[1], x.shape[2]
        if H % p or W % p:
            x = jnp.pad(
                x, ((0, 0), (0, (p - H % p) % p), (0, (p - W % p) % p), (0, 0))
            )
        x = Conv(
            self.embed_dim, kernel_size=p, stride=p, padding=0, name="proj"
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x


class MergeFirstLayer(nn.Module):
    """TBC-style analysis stage: PatchMerging (dim_in -> dim_out, 2x down)
    first, then `depth` Swin blocks at dim_out (`tbc.py:265-351` with
    downsample=PatchMerging applied before the blocks)."""

    dim_in: int
    dim_out: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = ()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchMerging(self.dim_in, self.dim_out, name="downsample")(x)
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinTransformerBlock(
                dim=self.dim_out,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=dp,
                name=f"block_{i}",
            )(x, deterministic)
        return x


class SplitLastLayer(nn.Module):
    """TBC-style synthesis stage: `depth` Swin blocks at dim, then
    PatchSplit (dim -> dim_out, 2x up) (`tbc.py:265-351` with
    downsample=PatchSplit applied after the blocks)."""

    dim: int
    dim_out: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = ()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=dp,
                name=f"block_{i}",
            )(x, deterministic)
        return PatchSplit(self.dim, self.dim_out, name="upsample")(x)


class BasicLayer(nn.Module):
    """One Swin stage: `depth` blocks (alternating W-MSA / SW-MSA) plus an
    optional resampling tail (`stf.py:262-347`). `resample` is "merge"
    (analysis, 2x down), "split" (synthesis, 2x up) or None."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 4
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = ()
    resample: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=dp,
                name=f"block_{i}",
            )(x, deterministic)
        if self.resample == "merge":
            x = PatchMerging(self.dim, name="downsample")(x)
        elif self.resample == "split":
            x = PatchSplit(self.dim, name="upsample")(x)
        return x
