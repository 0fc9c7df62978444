"""CC — plain channel-wise-context hyperprior (Minnen-style) without window
attention.

Architecture parity with the reference (`compressai/models/CC.py:23-104`):
  g_a: 4x stride-2 5x5 conv + GDN (no attention blocks)
  g_s: mirrored transposed convs + IGDN
  h_a: 3x3 conv -> ReLU -> 5x5 s2 -> ReLU -> 5x5 s2 (320->256->192)
  h_mean_s / h_scale_s: two stride-2 deconvs + 3x3 conv, ReLU activations
  10 slices of 32 channels with *3-stage* ReLU slice transforms
  (320+32*min(i,5) -> 224 -> 128 -> 32).
"""

from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers import GDN, Conv, ConvTranspose
from .base import ChannelARModel, ConvGeluStack


class CCAnalysis(nn.Module):
    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate([self.N, self.N, self.N, self.M]):
            x = Conv(f, kernel_size=5, stride=2, name=f"conv_{i}")(x)
            if i < 3:
                x = GDN(f, name=f"gdn_{i}")(x)
        return x


class CCSynthesis(nn.Module):
    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate([self.N, self.N, self.N, 3]):
            x = ConvTranspose(f, kernel_size=5, stride=2, name=f"deconv_{i}")(x)
            if i < 3:
                x = GDN(f, inverse=True, name=f"igdn_{i}")(x)
        return x


class CCHyperSynthesis(nn.Module):
    """deconv s2 -> ReLU -> deconv s2 -> ReLU -> conv3x3 (`CC.py:59-73`)."""

    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        mid = round((self.N + self.M) / 2 / 32) * 32  # 256 for (192, 320)
        x = ConvTranspose(self.N, kernel_size=5, stride=2, name="deconv_0")(x)
        x = nn.relu(x)
        x = ConvTranspose(mid, kernel_size=5, stride=2, name="deconv_1")(x)
        x = nn.relu(x)
        return Conv(self.M, kernel_size=3, stride=1, name="conv_0")(x)


class CCSliceTransform(nn.Module):
    """3-stage ReLU stack in -> 224 -> 128 -> out (`CC.py:74-100`)."""

    out_features: int = 32

    @nn.compact
    def __call__(self, x):
        return ConvGeluStack(
            features=(224, 128, self.out_features),
            kernel_sizes=(3, 3, 3),
            strides=(1, 1, 1),
            activation="relu",
            name="stack",
        )(x)


class CC(ChannelARModel):
    """Channel-wise context codec ("cc" in the registry)."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5

    def setup(self):
        self.g_a = CCAnalysis(self.N, self.M)
        self.g_s = CCSynthesis(self.N, self.M)
        mid = round((self.N + self.M) / 2 / 32) * 32
        self.h_a = ConvGeluStack(
            features=(self.M, mid, self.N),
            kernel_sizes=(3, 5, 5),
            strides=(1, 2, 2),
            activation="relu",
            name="h_a",
        )
        self.h_mean_s = CCHyperSynthesis(self.N, self.M, name="h_mean_s")
        self.h_scale_s = CCHyperSynthesis(self.N, self.M, name="h_scale_s")
        slice_ch = self.M // self.num_slices
        self.cc_mean_transforms = [
            CCSliceTransform(slice_ch, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            CCSliceTransform(slice_ch, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            CCSliceTransform(slice_ch, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(self.N)

    def analysis(self, x):
        return self.g_a(x)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)
