"""Shared codec model machinery.

`ChannelARModel` implements the protocol every codec in the reference family
shares (`compressai/models/cnn.py:141-332`, `stf.py:584-788`, `CC.py`):
hyper-latent z via h_a, STE-rounded z_hat, hyper synthesis into per-latent
means/scales, and a channel-wise autoregressive slice loop (slice i
conditions on up to `max_support_slices` previously decoded slices) with a
latent-response-prediction correction. Subclasses provide the analysis /
synthesis transforms and the hyper stacks.

The reference's `CompressionModel` base (`models/base.py:6-70`) maps to:
  aux_loss()   -> ChannelARModel.aux_loss
  update()     -> host-side table build in stf_tpu.models.codec.Codec.update
  load_state_dict buffer resizing -> not needed (tables live outside params)
"""

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy import gaussian_build_indexes, gaussian_forward
from ..layers import Conv
from ..layers.conv import gelu
from ..ops import ste_round


class ConvGeluStack(nn.Module):
    """Conv stack with an activation between layers (none after the last).

    Used for the hyper transforms and channel-context slice transforms
    (reference `cnn.py:54-127` with GELU, `CC.py:51-100` with ReLU).
    """

    features: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = {"gelu": gelu, "relu": nn.relu}[self.activation]
        n = len(self.features)
        for i, (f, k, s) in enumerate(
            zip(self.features, self.kernel_sizes, self.strides)
        ):
            x = Conv(f, kernel_size=k, stride=s, name=f"conv_{i}")(x)
            if i < n - 1:
                x = act(x)
        return x


class SliceTransform(nn.Module):
    """5-stage 3x3 stack 224->176->128->64->out (reference `cnn.py:89-127`,
    where out = M/num_slices = 32 for the published models)."""

    out_features: int = 32

    @nn.compact
    def __call__(self, x):
        return ConvGeluStack(
            features=(224, 176, 128, 64, self.out_features),
            kernel_sizes=(3, 3, 3, 3, 3),
            strides=(1, 1, 1, 1, 1),
            name="stack",
        )(x)


class ChannelARModel(nn.Module):
    """Base for codecs with a channel-AR Gaussian conditional over slices.

    Subclass contract (set up in `setup()`):
        self.h_a, self.h_mean_s, self.h_scale_s  — hyper transforms
        self.cc_mean_transforms / cc_scale_transforms / lrp_transforms
        self.entropy_bottleneck
        num_slices / max_support_slices attributes
        analysis(x) -> y  and  synthesis(y_hat) -> x_hat  methods

    `hyper_upsample` is the spatial factor between the hyper latent z and
    the latent y (all current families use two stride-2 hyper stages → 4);
    the decoder derives y's spatial shape from z's through it.
    """

    hyper_upsample: int = 4

    def analysis(self, x):
        raise NotImplementedError

    def synthesis(self, y_hat):
        raise NotImplementedError

    # -- slice helpers --------------------------------------------------------

    def _support(self, y_hat_slices):
        k = self.max_support_slices
        return list(y_hat_slices) if k < 0 else list(y_hat_slices)[:k]

    def slice_boundaries(self, M: int):
        """Channel split points: ceil(M/S)-wide slices, remainder on the
        last (`tbc.py:550-588`; equal widths for WACNN/STF/CC)."""
        w = -(-M // self.num_slices)
        return [min(w * i, M) for i in range(1, self.num_slices)]

    def _split_slices(self, y):
        return jnp.split(y, self.slice_boundaries(y.shape[-1]), axis=-1)

    def _slice_mu_scale(self, i, latent_means, latent_scales, support_slices):
        mean_support = jnp.concatenate(
            [latent_means] + list(support_slices), axis=-1
        )
        mu = self.cc_mean_transforms[i](mean_support)
        scale_support = jnp.concatenate(
            [latent_scales] + list(support_slices), axis=-1
        )
        scale = self.cc_scale_transforms[i](scale_support)
        return mu, scale, mean_support

    def _lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    # -- training forward -----------------------------------------------------

    def __call__(self, x, training: bool = True) -> Dict[str, Any]:
        y = self.analysis(x)
        y_hat, likelihoods = self.entropy_forward(y, training)
        x_hat = self.synthesis(y_hat)
        out = {"x_hat": x_hat, "likelihoods": likelihoods}
        if getattr(self, "is_teacher", False):
            out["y"] = y
        return out

    def entropy_forward(self, y, training: bool):
        """Hyper path + channel-AR slice loop; returns (y_hat, likelihoods)."""
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)

        # STE-round z around the medians for the hyper-synthesis input
        # (reference `cnn.py:148-152`, `stf.py:602-604`).
        medians = self.entropy_bottleneck.medians()
        z_hat = ste_round(z - medians) + medians

        latent_scales = self.h_scale_s(z_hat)
        latent_means = self.h_mean_s(z_hat)
        h, w = y.shape[1], y.shape[2]
        latent_scales = latent_scales[:, :h, :w, :]
        latent_means = latent_means[:, :h, :w, :]

        y_slices = self._split_slices(y)
        y_hat_slices = []
        y_likelihoods = []
        for i, y_slice in enumerate(y_slices):
            support = self._support(y_hat_slices)
            mu, scale, mean_support = self._slice_mu_scale(
                i, latent_means, latent_scales, support
            )
            rng = self.make_rng("noise") if training else None
            _, lik = gaussian_forward(rng, y_slice, scale, mu, training=training)
            y_likelihoods.append(lik)

            y_hat_slice = ste_round(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        likelihoods = {
            "y": jnp.concatenate(y_likelihoods, axis=-1),
            "z": z_likelihoods,
        }
        return y_hat, likelihoods

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # -- coding-path methods (each jitted separately by models/codec.py) -----

    def analyze(self, x):
        """Encoder-side transforms: x -> (y, z)."""
        y = self.analysis(x)
        return y, self.h_a(y)

    def hyper_synthesize(self, z_hat, y_shape):
        latent_scales = self.h_scale_s(z_hat)[:, : y_shape[0], : y_shape[1], :]
        latent_means = self.h_mean_s(z_hat)[:, : y_shape[0], : y_shape[1], :]
        return latent_means, latent_scales

    def decode_slice_indexes(
        self, i, latent_means, latent_scales, support, scale_table
    ):
        """First decode half-step: per-slice mu + rANS indexes."""
        mu, scale, _ = self._slice_mu_scale(
            i, latent_means, latent_scales, support
        )
        return mu, gaussian_build_indexes(scale, scale_table)

    def decode_slice_apply(self, i, latent_means, support, mu, rv):
        """Second half-step: dequantize + lrp correction -> y_hat slice."""
        mean_support = jnp.concatenate(
            [latent_means] + list(support), axis=-1
        )
        y_hat_slice = rv.astype(mu.dtype) + mu
        y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
        return y_hat_slice

    def decode_slice_fused(
        self, i, latent_means, latent_scales, support, mu_prev, rv_prev,
        scale_table,
    ):
        """Fused AR step (one dispatch): reconstruct slice i-1 from its
        decoded symbols, then compute slice i's (mu, indexes).

        `support` is the capped support list for slice i-1 (the first
        min(i-1, max_support_slices) reconstructed slices). Halves the
        per-slice program dispatches of the coding path — host round trips
        dominate the channel-AR walk, not compute.
        """
        support = list(support)
        y_hat_prev = self.decode_slice_apply(
            i - 1, latent_means, support, mu_prev, rv_prev
        )
        k = self.max_support_slices
        support_i = support + [y_hat_prev]
        if k >= 0:
            support_i = support_i[:k]
        mu, idx = self.decode_slice_indexes(
            i, latent_means, latent_scales, support_i, scale_table
        )
        return y_hat_prev, mu, idx

    def synthesize(self, y_hat):
        return jnp.clip(self.synthesis(y_hat), 0.0, 1.0)
