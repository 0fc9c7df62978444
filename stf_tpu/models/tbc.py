"""TBC — fully transformer-based coding (no conv patch embed; transformer
hyper transforms).

Architecture parity with the reference (`compressai/models/tbc.py:388-702`):
  analysis: raw RGB pixels enter the first Swin stage directly; each stage
    PatchMerges first (2x down) then runs `depth` blocks. Channel schedule
    channels=[128,192,256,320] over depths [2,2,6,2], window 8, 32 heads.
  hyper: two more merge-first Swin stages (depths [5,1], window 4) produce
    z with 192 channels at 1/64; transformer split-last stages synthesize
    means/scales back to 320 channels at 1/16.
  synthesis: split-last stages back to RGB (the reference defines an
    end_conv but never calls it — synthesis ends at the final PatchSplit,
    `tbc.py:693-698`).
  context: `num_slices` slices of ceil(M/num_slices) channels with the
    remainder on the last slice (`tbc.py:550-588`), same 5-conv GELU slice
    stacks as WACNN/STF.
"""

import math
from typing import Sequence, Tuple

import numpy as np
from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers.swin import MergeFirstLayer, SplitLastLayer
from .base import ChannelARModel, SliceTransform


class _StageStack(nn.Module):
    """Sequence of merge-first or split-last Swin stages."""

    dims_in: Tuple[int, ...]
    dims_out: Tuple[int, ...]
    depths: Tuple[int, ...]
    num_heads: int
    window_size: int
    drop_path: Tuple[float, ...]
    kind: str  # "merge" | "split"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        offset = 0
        for i, (di, do, d) in enumerate(
            zip(self.dims_in, self.dims_out, self.depths)
        ):
            dp = tuple(self.drop_path[offset : offset + d])
            offset += d
            cls = MergeFirstLayer if self.kind == "merge" else SplitLastLayer
            x = cls(
                di,
                do,
                depth=d,
                num_heads=self.num_heads,
                window_size=self.window_size,
                drop_path=dp,
                name=f"stage_{i}",
            )(x, deterministic)
        return x


class TransformerBasedCoding(ChannelARModel):
    """Fully-transformer codec ("tbc" in the registry)."""

    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    h_depths: Tuple[int, ...] = (5, 1)
    num_heads: int = 32
    h_num_heads: int = 32
    channels: Tuple[int, ...] = (128, 192, 256, 320, 192, 192)
    window_size: int = 8
    h_window_size: int = 4
    num_slices: int = 10
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2

    @property
    def max_support_slices(self) -> int:
        return self.num_slices // 2

    @property
    def m_channels(self):
        return self.channels[:4]

    @property
    def h_channels(self):
        return self.channels[4:]

    def setup(self):
        m_ch, h_ch = self.m_channels, self.h_channels
        dpr = tuple(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        in_dims = (3,) + tuple(m_ch[:-1])
        self.ana = _StageStack(
            dims_in=in_dims,
            dims_out=tuple(m_ch),
            depths=tuple(self.depths),
            num_heads=self.num_heads,
            window_size=self.window_size,
            drop_path=dpr,
            kind="merge",
            name="ana",
        )
        rdepths = tuple(self.depths[::-1])
        self.syn = _StageStack(
            dims_in=tuple(m_ch[::-1]),
            dims_out=tuple(in_dims[::-1]),
            depths=rdepths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            drop_path=dpr,
            kind="split",
            name="syn",
        )

        h_in = (m_ch[-1],) + tuple(h_ch[:-1])
        h_dpr = dpr[: sum(self.h_depths)]
        self.h_a = _StageStack(
            dims_in=h_in,
            dims_out=tuple(h_ch),
            depths=tuple(self.h_depths),
            num_heads=self.h_num_heads,
            window_size=self.h_window_size,
            drop_path=h_dpr,
            kind="merge",
            name="h_a",
        )
        self.h_mean_s = _StageStack(
            dims_in=tuple(h_ch[::-1]),
            dims_out=tuple(h_in[::-1]),
            depths=tuple(self.h_depths[::-1]),
            num_heads=self.h_num_heads,
            window_size=self.h_window_size,
            drop_path=h_dpr,
            kind="split",
            name="h_mean_s",
        )
        self.h_scale_s = _StageStack(
            dims_in=tuple(h_ch[::-1]),
            dims_out=tuple(h_in[::-1]),
            depths=tuple(self.h_depths[::-1]),
            num_heads=self.h_num_heads,
            window_size=self.h_window_size,
            drop_path=h_dpr,
            kind="split",
            name="h_scale_s",
        )

        M = m_ch[-1]
        w = math.ceil(M / self.num_slices)
        widths = [
            w if i < self.num_slices - 1 else M - w * (self.num_slices - 1)
            for i in range(self.num_slices)
        ]
        self.cc_mean_transforms = [
            SliceTransform(widths[i], name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            SliceTransform(widths[i], name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            SliceTransform(widths[i], name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(h_ch[-1])

    def analysis(self, x):
        det = not self.has_rng("droppath")
        return self.ana(x, deterministic=det)

    def synthesis(self, y_hat):
        det = not self.has_rng("droppath")
        return self.syn(y_hat, deterministic=det)
