from .conv import Conv, ConvTranspose, PixelShuffle, conv1x1, conv3x3, subpel_conv3x3
from .gdn import GDN, GDN1
from .win_attention import (
    WinBasedAttention,
    WindowAttention,
    Win_noShift_Attention,
    window_partition,
    window_reverse,
)

__all__ = [
    "Conv",
    "ConvTranspose",
    "PixelShuffle",
    "conv1x1",
    "conv3x3",
    "subpel_conv3x3",
    "GDN",
    "GDN1",
    "WinBasedAttention",
    "WindowAttention",
    "Win_noShift_Attention",
    "window_partition",
    "window_reverse",
]
