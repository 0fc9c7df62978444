"""CC_GD — the CC codec with Gate-Decorator channel pruning.

Behavior parity with the reference (`compressai/models/CC_gd.py:23-135,
735-756`): a `GateDecorator` after selected convs multiplies activations by
a learned per-channel `gate` and a binary `mask`; gates are inserted
throughout h_a / h_mean_s / h_scale_s and the first two convs of every
slice transform (g_a/g_s stay ungated). Taylor scores `|dL/dgate * gate|`
are accumulated by the tick loop (stf_tpu/training/train_gd.py) from the
gradient tree — no mutable buffers needed in the functional design.

`mask` is a parameter that the optimizer never updates (the train-state
labels it into a zeroed transform); the tick/tock pruning loop rewrites it
host-side. `minimal = int(0.04 * C)` is the per-gate keep floor.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers import Conv, ConvTranspose
from .base import ChannelARModel
from .cc import CCAnalysis, CCSynthesis

GATE_MINIMAL_FRAC = 0.04


class GateDecorator(nn.Module):
    """x * gate * mask over the channel axis (`CC_gd.py:735-756`)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        gate = self.param("gate", nn.initializers.ones, (self.channels,))
        mask = self.param("mask", nn.initializers.ones, (self.channels,))
        return x * gate * mask


class GatedStack(nn.Module):
    """conv -> gate -> ReLU chain; `gate_last` controls a trailing gate.

    `gated=False` builds the same stack without GateDecorators — the shape
    a physically pruned checkpoint reloads into (gates are folded into the
    convolutions at export, `training/train_gd.py:prune_export`).
    """

    features: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    deconv_flags: Sequence[bool] = ()
    gate_last: bool = True
    gated: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, (f, k, s) in enumerate(
            zip(self.features, self.kernel_sizes, self.strides)
        ):
            is_deconv = i < len(self.deconv_flags) and self.deconv_flags[i]
            if is_deconv:
                x = ConvTranspose(f, kernel_size=k, stride=s, name=f"deconv_{i}")(x)
            else:
                x = Conv(f, kernel_size=k, stride=s, name=f"conv_{i}")(x)
            last = i == n - 1
            if self.gated and (not last or self.gate_last):
                x = GateDecorator(f, name=f"gate_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class CC_GD(ChannelARModel):
    """Gate-decorated CC ("cc_gd" in the registry).

    `deps` (optional) makes the model width-parameterized for reloading
    physically pruned checkpoints: a tuple of ("<stack>/gate_<i>", width)
    pairs giving each gated position's kept-channel count (the analog of
    the reference pruned export's `deps` list, `train_gd.py:507-565`).
    When set, the model is built *ungated* at those widths — the exact
    shape `prune_export` emits.
    """

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5
    sparse_lambda: float = 0.5
    deps: tuple = ()

    def _w(self, key: str, default: int) -> int:
        return dict(self.deps).get(key, default) if self.deps else default

    def setup(self):
        gated = not self.deps
        self.g_a = CCAnalysis(self.N, self.M)
        self.g_s = CCSynthesis(self.N, self.M)
        mid = round((self.N + self.M) / 2 / 32) * 32  # 256
        self.h_a = GatedStack(
            features=(
                self._w("h_a/gate_0", self.M),
                self._w("h_a/gate_1", mid),
                self._w("h_a/gate_2", self.N),
            ),
            kernel_sizes=(3, 5, 5),
            strides=(1, 2, 2),
            gate_last=True,
            gated=gated,
            name="h_a",
        )
        for name in ("h_mean_s", "h_scale_s"):
            setattr(
                self,
                name,
                GatedStack(
                    features=(
                        self._w(f"{name}/gate_0", self.N),
                        self._w(f"{name}/gate_1", mid),
                        self._w(f"{name}/gate_2", self.M),
                    ),
                    kernel_sizes=(5, 5, 3),
                    strides=(2, 2, 1),
                    deconv_flags=(True, True, False),
                    gate_last=True,
                    gated=gated,
                    name=name,
                ),
            )
        slice_ch = self.M // self.num_slices

        def slice_stack(prefix, i):
            return GatedStack(
                features=(
                    self._w(f"{prefix}_{i}/gate_0", 224),
                    self._w(f"{prefix}_{i}/gate_1", 128),
                    slice_ch,
                ),
                kernel_sizes=(3, 3, 3),
                strides=(1, 1, 1),
                gate_last=False,
                gated=gated,
                name=f"{prefix}_{i}",
            )

        self.cc_mean_transforms = [
            slice_stack("cc_mean", i) for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            slice_stack("cc_scale", i) for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            slice_stack("lrp", i) for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(
            self._w("h_a/gate_2", self.N)
        )

    def analysis(self, x):
        return self.g_a(x)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)


def init_cc_gd_from_cc(cc_params, cc_gd_params):
    """Load a (possibly trained/imported) CC param tree into a CC_GD tree —
    the reference's KEY_TABLE flow (`CC_gd.py:357-556`), which starts
    gate-decorator pruning from a dense CC checkpoint. Gates and masks stay
    at their all-ones init, so the returned model computes exactly what the
    CC did.

    Structural correspondences (our naming):
      g_a / g_s / entropy_bottleneck: identical subtrees
      h_a: ConvGeluStack conv_i -> GatedStack conv_i
      h_mean_s / h_scale_s: CCHyperSynthesis {deconv_0, deconv_1, conv_0}
        -> GatedStack {deconv_0, deconv_1, conv_2}
      slice transforms: CCSliceTransform stack/conv_j -> GatedStack conv_j
    """
    import copy

    out = copy.deepcopy(cc_gd_params)
    out["g_a"] = copy.deepcopy(cc_params["g_a"])
    out["g_s"] = copy.deepcopy(cc_params["g_s"])
    out["entropy_bottleneck"] = copy.deepcopy(cc_params["entropy_bottleneck"])

    for i in range(3):
        out["h_a"][f"conv_{i}"] = copy.deepcopy(cc_params["h_a"][f"conv_{i}"])
    for name in ("h_mean_s", "h_scale_s"):
        out[name]["deconv_0"] = copy.deepcopy(cc_params[name]["deconv_0"])
        out[name]["deconv_1"] = copy.deepcopy(cc_params[name]["deconv_1"])
        out[name]["conv_2"] = copy.deepcopy(cc_params[name]["conv_0"])
    for key in cc_params:
        if key.startswith(("cc_mean_", "cc_scale_", "lrp_")):
            for j in range(3):
                out[key][f"conv_{j}"] = copy.deepcopy(
                    cc_params[key]["stack"][f"conv_{j}"]
                )
    return out
