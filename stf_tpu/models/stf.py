"""SymmetricalTransFormer (STF) — the Swin-Transformer codec.

Architecture parity with the reference (`compressai/models/stf.py:384-788`):
  analysis: PatchEmbed (patch 2, embed 48, LN) -> 4 Swin stages with depths
    [2,2,6,2], heads [3,6,12,24], window 4, PatchMerging between stages ->
    latent y with C = 8*embed_dim = 384 at 1/16 resolution
  synthesis: mirrored stages (depths/heads reversed) with PatchSplit 2x
    upsampling -> end_conv (5x5 conv -> PixelShuffle(2) -> 3x3 conv to RGB)
  hyper: h_a 384->336->288(s2)->240->192(s2); h_mean_s/h_scale_s
    240/288/336/384 subpel upsamplers (`stf.py:476-509`)
  context: 12 slices of 32 channels, max_support 6, same slice transform
    stacks as WACNN (`stf.py:510-548`)
  stochastic depth: drop-path rate ramping 0 -> 0.2 over the 12 analysis
    blocks (`stf.py:423`), mirrored for synthesis; identity at eval
  is_teacher: forward additionally returns y (`stf.py:647`) for DYSTF
    distillation.

TPU-first: features remain NHWC maps through every stage (no token-list
reshapes), so the whole analysis transform is one fused XLA program.
"""

from typing import Sequence, Tuple

import numpy as np
from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers import Conv
from ..layers.conv import gelu, pixel_shuffle, subpel_conv3x3
from ..layers.swin import BasicLayer, PatchEmbed
from .base import ChannelARModel, ConvGeluStack, SliceTransform


class STFHyperSynthesis(nn.Module):
    """h_mean_s / h_scale_s for STF (`stf.py:488-509`): 192 -> 240 -> 288
    -> 336 -> 384 -> 384 with two subpel 2x upsamplers."""

    @nn.compact
    def __call__(self, x):
        x = Conv(240, kernel_size=3, stride=1, name="conv_0")(x)
        x = gelu(x)
        x = subpel_conv3x3(288, 2, name="up_0")(x)
        x = gelu(x)
        x = Conv(336, kernel_size=3, stride=1, name="conv_1")(x)
        x = gelu(x)
        x = subpel_conv3x3(384, 2, name="up_1")(x)
        x = gelu(x)
        x = Conv(384, kernel_size=3, stride=1, name="conv_2")(x)
        return x


class SymmetricalTransFormer(ChannelARModel):
    """Swin-Transformer codec ("stf" in the registry)."""

    patch_size: int = 2
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    num_slices: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    is_teacher: bool = False

    @property
    def max_support_slices(self) -> int:
        return self.num_slices // 2

    def setup(self):
        n_stages = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        layers = []
        for i in range(n_stages):
            start = sum(self.depths[:i])
            layers.append(
                BasicLayer(
                    dim=self.embed_dim * 2 ** i,
                    depth=self.depths[i],
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=tuple(dpr[start : start + self.depths[i]]),
                    resample="merge" if i < n_stages - 1 else None,
                    name=f"layer_{i}",
                )
            )
        self.layers = layers

        rdepths = self.depths[::-1]
        rheads = self.num_heads[::-1]
        syn_layers = []
        for i in range(n_stages):
            start = sum(rdepths[:i])
            syn_layers.append(
                BasicLayer(
                    dim=self.embed_dim * 2 ** (n_stages - 1 - i),
                    depth=rdepths[i],
                    num_heads=rheads[i],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=tuple(dpr[start : start + rdepths[i]]),
                    resample="split" if i < n_stages - 1 else None,
                    name=f"syn_layer_{i}",
                )
            )
        self.syn_layers = syn_layers

        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim
        )
        self.end_conv_0 = Conv(
            self.embed_dim * self.patch_size ** 2,
            kernel_size=5,
            stride=1,
            name="end_conv_0",
        )
        self.end_conv_1 = Conv(3, kernel_size=3, stride=1, name="end_conv_1")

        M = self.embed_dim * 2 ** (len(self.depths) - 1)  # 384
        N = M // 2  # 192 (hyper-latent channels, `stf.py:549`: embed_dim*4)
        self.h_a = ConvGeluStack(
            features=(M, 336, 288, 240, N),
            kernel_sizes=(3, 3, 3, 3, 3),
            strides=(1, 1, 2, 1, 2),
            name="h_a",
        )
        self.h_mean_s = STFHyperSynthesis(name="h_mean_s")
        self.h_scale_s = STFHyperSynthesis(name="h_scale_s")

        slice_ch = M // self.num_slices  # 32
        self.cc_mean_transforms = [
            SliceTransform(slice_ch, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            SliceTransform(slice_ch, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            SliceTransform(slice_ch, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(N)

    # training flag is threaded via ChannelARModel.__call__ -> analysis uses
    # deterministic drop-path at eval; flax passes no extra state, so the
    # blocks read deterministic-ness from the absence of the droppath rng.

    def analysis(self, x):
        x = self.patch_embed(x)
        det = not self.has_rng("droppath")
        for layer in self.layers:
            x = layer(x, deterministic=det)
        return x

    def synthesis(self, y_hat):
        det = not self.has_rng("droppath")
        x = y_hat
        for layer in self.syn_layers:
            x = layer(x, deterministic=det)
        x = self.end_conv_0(x)
        x = pixel_shuffle(x, self.patch_size)
        return self.end_conv_1(x)
