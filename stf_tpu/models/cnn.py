"""WACNN — the CNN codec with window attention and channel-wise
autoregressive context.

Architecture parity with the reference (`compressai/models/cnn.py:23-130`):
  g_a: 4x stride-2 5x5 conv + GDN with two Win_noShift_Attention blocks
       (N=192, M=320)
  g_s: mirror with IGDN + transposed convs
  h_a / h_mean_s / h_scale_s: 3x3 conv stacks (GELU), subpel upsamplers
  10 latent slices of 32 channels; slice i conditions on the hyper latent
  plus up to 5 previously decoded slices; latent-response-prediction (lrp)
  correction `0.5*tanh(.)` per slice.

TPU-first design notes: NHWC throughout; the channel-AR protocol and the
compress/decompress orchestration live in models/base.py + models/codec.py.
"""

from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers import GDN, Conv, ConvTranspose, Win_noShift_Attention, subpel_conv3x3
from ..layers.conv import gelu
from .base import ChannelARModel, ConvGeluStack, SliceTransform


class AnalysisTransform(nn.Module):
    """g_a (reference `cnn.py:31-41`)."""

    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        x = Conv(self.N, kernel_size=5, stride=2, name="conv_0")(x)
        x = GDN(self.N, name="gdn_0")(x)
        x = Conv(self.N, kernel_size=5, stride=2, name="conv_1")(x)
        x = GDN(self.N, name="gdn_1")(x)
        x = Win_noShift_Attention(
            dim=self.N, num_heads=8, window_size=8, shift_size=4, name="attn_0"
        )(x)
        x = Conv(self.N, kernel_size=5, stride=2, name="conv_2")(x)
        x = GDN(self.N, name="gdn_2")(x)
        x = Conv(self.M, kernel_size=5, stride=2, name="conv_3")(x)
        x = Win_noShift_Attention(
            dim=self.M, num_heads=8, window_size=4, shift_size=2, name="attn_1"
        )(x)
        return x


class SynthesisTransform(nn.Module):
    """g_s (reference `cnn.py:42-52`)."""

    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        x = Win_noShift_Attention(
            dim=self.M, num_heads=8, window_size=4, shift_size=2, name="attn_0"
        )(x)
        x = ConvTranspose(self.N, kernel_size=5, stride=2, name="deconv_0")(x)
        x = GDN(self.N, inverse=True, name="igdn_0")(x)
        x = ConvTranspose(self.N, kernel_size=5, stride=2, name="deconv_1")(x)
        x = GDN(self.N, inverse=True, name="igdn_1")(x)
        x = Win_noShift_Attention(
            dim=self.N, num_heads=8, window_size=8, shift_size=4, name="attn_1"
        )(x)
        x = ConvTranspose(self.N, kernel_size=5, stride=2, name="deconv_2")(x)
        x = GDN(self.N, inverse=True, name="igdn_2")(x)
        x = ConvTranspose(3, kernel_size=5, stride=2, name="deconv_3")(x)
        return x


def _ramp(a: int, b: int, n: int = 5):
    """Arithmetic channel ramp a -> b with n entries (reference widths
    320,288,256,224,192 are exactly this for (M, N))."""
    return tuple(round(a + (b - a) * i / (n - 1)) for i in range(n))


class HyperSynthesis(nn.Module):
    """h_mean_s / h_scale_s (reference `cnn.py:66-88`): 4x upsampling with
    channel ramp N -> M (192,224,256,288,320 for the published model)."""

    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        f = _ramp(self.N, self.M)
        x = Conv(f[0], kernel_size=3, stride=1, name="conv_0")(x)
        x = gelu(x)
        x = subpel_conv3x3(f[1], 2, name="up_0")(x)
        x = gelu(x)
        x = Conv(f[2], kernel_size=3, stride=1, name="conv_1")(x)
        x = gelu(x)
        x = subpel_conv3x3(f[3], 2, name="up_1")(x)
        x = gelu(x)
        x = Conv(f[4], kernel_size=3, stride=1, name="conv_2")(x)
        return x


class WACNN(ChannelARModel):
    """CNN-based codec ("cnn" in the registry)."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N, self.M)
        self.h_a = ConvGeluStack(
            features=_ramp(self.M, self.N),
            kernel_sizes=(3, 3, 3, 3, 3),
            strides=(1, 1, 2, 1, 2),
            name="h_a",
        )
        self.h_mean_s = HyperSynthesis(self.N, self.M, name="h_mean_s")
        self.h_scale_s = HyperSynthesis(self.N, self.M, name="h_scale_s")
        slice_ch = self.M // self.num_slices
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
        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def analysis(self, x):
        return self.g_a(x)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)
