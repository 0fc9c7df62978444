"""Entropy models: factorized bottleneck + conditional Gaussian.

TPU-native redesign of the reference entropy models
(`compressai/entropy_models/entropy_models.py`):

* All training-path math (likelihoods, noise quantization) is pure JAX on
  NHWC tensors, jit/vmap/pjit-friendly.
* The *coding*-path artifacts (quantized CDF tables) are built on the host
  from the same math and quantized by the native C++ builder; actual
  encode/decode goes through the native rANS coder with NumPy buffers.
* The reference's per-channel Python CDF loop (`entropy_models.py:172-180`)
  is replaced by one vectorized device evaluation + one batched native call.

Math parity notes (checked against the reference to the formula level):
  EntropyBottleneck: logits-cumulative chain of `len(filters)+1` stages
    `softplus(matrix) @ logits + bias` with `tanh(factor)*tanh(logits)`
    gating between stages (`entropy_models.py:400-419`); likelihood is the
    sigmoid difference with a sign trick for numerical symmetry
    (`:421-433`); aux loss pushes `quantiles` to the tail-mass logit targets
    (`:395-398`); update() samples the integer support derived from the
    quantiles (`:354-393`).
  GaussianConditional: likelihood Φ((.5-|v|)/s) − Φ((−.5−|v|)/s) via erfc
    (`:578-582,626-643`); scale lower bound 0.11; scale-table indexing picks
    the smallest table entry >= scale (`:661-666`).
"""

import dataclasses
import math
from statistics import NormalDist
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ans import (
    host_coder_classes,
    pmf_to_quantized_cdf_rows,
    resolve_host_backend,
)
from ..ops import lower_bound

# Ballé's TF-compression default scale grid (reference `models/cnn.py:14-20`).
SCALES_MIN = 0.11
SCALES_MAX = 256
SCALES_LEVELS = 64

LIKELIHOOD_BOUND = 1e-9
SCALE_BOUND = 0.11


def get_scale_table(
    min_scale: float = SCALES_MIN,
    max_scale: float = SCALES_MAX,
    levels: int = SCALES_LEVELS,
) -> np.ndarray:
    return np.exp(
        np.linspace(math.log(min_scale), math.log(max_scale), levels)
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Factorized entropy bottleneck
# ---------------------------------------------------------------------------


def eb_logits_cumulative(params: dict, inputs, stop_gradient: bool):
    """Monotone per-channel CDF-in-logit-space.

    `params` holds `matrix_i` (C, f_out, f_in), `bias_i` (C, f_out, 1) and
    `factor_i` (C, f_out, 1). `inputs` is (C, 1, N). Returns (C, 1, N).
    """
    n_stages = len([k for k in params if k.startswith("matrix_")])
    logits = inputs
    for i in range(n_stages):
        matrix = params[f"matrix_{i}"]
        bias = params[f"bias_{i}"]
        if stop_gradient:
            matrix = jax.lax.stop_gradient(matrix)
            bias = jax.lax.stop_gradient(bias)
        logits = jnp.einsum(
            "cij,cjn->cin", jax.nn.softplus(matrix), logits
        ) + bias
        if i < n_stages - 1:
            factor = params[f"factor_{i}"]
            if stop_gradient:
                factor = jax.lax.stop_gradient(factor)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


def eb_likelihood(params: dict, values):
    """P(round(v) == v_hat) under the factorized model; `values` is (C,1,N)."""
    lower = eb_logits_cumulative(params, values - 0.5, stop_gradient=False)
    upper = eb_logits_cumulative(params, values + 0.5, stop_gradient=False)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    return jnp.abs(
        jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
    )


class EntropyBottleneck(nn.Module):
    """Learned factorized prior (Ballé 2018) over NHWC latents.

    Forward: ``(z_tilde, likelihoods) = eb(z, training=...)`` where during
    training additive U(-.5,.5) noise models quantization (rng stream
    "noise"), and at eval the latent is rounded around the channel medians.
    """

    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    likelihood_bound: float = LIKELIHOOD_BOUND

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        n_stages = len(self.filters) + 1

        matrices, biases, factors = [], [], []
        for i in range(n_stages):
            init = math.log(math.expm1(1 / scale / dims[i + 1]))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda key, shape, v=init: jnp.full(shape, v, jnp.float32),
                    (self.channels, dims[i + 1], dims[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.channels, dims[i + 1], 1),
                )
            )
            if i < n_stages - 1:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        nn.initializers.zeros,
                        (self.channels, dims[i + 1], 1),
                    )
                )
        self._matrices, self._biases, self._factors = matrices, biases, factors

        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array(
                    [[-self.init_scale, 0.0, self.init_scale]], jnp.float32
                ),
                (shape[0], 1, 1),
            ),
            (self.channels, 1, 3),
        )

    def _params_dict(self) -> dict:
        d = {}
        for i, m in enumerate(self._matrices):
            d[f"matrix_{i}"] = m
        for i, b in enumerate(self._biases):
            d[f"bias_{i}"] = b
        for i, f in enumerate(self._factors):
            d[f"factor_{i}"] = f
        return d

    def medians(self):
        """Per-channel medians (C,), detached (trained only by the aux loss)."""
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def aux_loss(self):
        """|logits(quantiles) - tail-mass targets|, gradients to quantiles only."""
        target = math.log(2 / self.tail_mass - 1)
        targets = jnp.array([-target, 0.0, target], jnp.float32)
        logits = eb_logits_cumulative(
            self._params_dict(), self.quantiles, stop_gradient=True
        )
        return jnp.abs(logits - targets).sum()

    def __call__(self, x, training: bool = True):
        """x: NHWC. Returns (x_tilde, likelihoods), both NHWC."""
        C = x.shape[-1]
        shape = x.shape
        # channel-major flatten: (C, 1, B*H*W)
        values = jnp.moveaxis(x, -1, 0).reshape(C, 1, -1)

        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), values.shape, values.dtype, -0.5, 0.5
            )
            outputs = values + noise
        else:
            medians = self.medians()[:, None, None]
            outputs = jnp.round(values - medians) + medians

        likelihood = eb_likelihood(self._params_dict(), outputs)
        likelihood = lower_bound(likelihood, self.likelihood_bound)

        outputs = jnp.moveaxis(outputs.reshape((C,) + shape[:-1]), 0, -1)
        likelihood = jnp.moveaxis(likelihood.reshape((C,) + shape[:-1]), 0, -1)
        return outputs, likelihood


# ---------------------------------------------------------------------------
# Conditional Gaussian
# ---------------------------------------------------------------------------


def _standardized_cumulative(x):
    # 0.5 * erfc(-x / sqrt(2)); erfc maximizes precision in the tails.
    return 0.5 * jax.scipy.special.erfc(-(2 ** -0.5) * x)


def gaussian_likelihood(
    values,
    scales,
    means=None,
    scale_bound: float = SCALE_BOUND,
    likelihood_bound: float = LIKELIHOOD_BOUND,
):
    """P(round(v) == v_hat) for v ~ N(means, scales²); elementwise, any shape."""
    if means is not None:
        values = values - means
    scales = lower_bound(scales, scale_bound)
    values = jnp.abs(values)
    upper = _standardized_cumulative((0.5 - values) / scales)
    lower_ = _standardized_cumulative((-0.5 - values) / scales)
    likelihood = upper - lower_
    if likelihood_bound > 0:
        likelihood = lower_bound(likelihood, likelihood_bound)
    return likelihood


def gaussian_forward(rng, x, scales, means=None, training: bool = True):
    """(x_tilde, likelihoods): noise quantization in training, rounding at eval."""
    if training:
        outputs = x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    else:
        if means is not None:
            outputs = jnp.round(x - means) + means
        else:
            outputs = jnp.round(x)
    return outputs, gaussian_likelihood(outputs, scales, means)


def gaussian_build_indexes(scales, scale_table):
    """Smallest scale-table entry >= scale, as an int32 index array.

    Implemented as a broadcasted compare-and-sum over the (tiny) table —
    exactly `searchsorted(table[:-1], scales, side="left")`, but
    `jnp.searchsorted` lowers to a sequential while loop on TPU that
    measured 57 ms per slice inside the fused decompress (the single
    largest term, ahead of the transforms and the rANS kernel); the
    one-shot compare fuses to ~nothing."""
    scales = lower_bound(scales, SCALE_BOUND)
    table = jnp.asarray(scale_table)
    return jnp.sum(
        (scales[..., None] > table[:-1]).astype(jnp.int32), axis=-1
    )


# ---------------------------------------------------------------------------
# Host-side CDF tables + coders
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CdfTables:
    """Quantized CDF tables consumed by the native rANS coder."""

    quantized_cdf: np.ndarray  # int32 [rows, max_len + 2]
    cdf_length: np.ndarray  # int32 [rows]
    offset: np.ndarray  # int32 [rows]

    def astuple(self):
        return self.quantized_cdf, self.cdf_length, self.offset


def build_eb_tables(
    eb_params: dict,
    precision: int = 16,
    tail_mass: float = 1e-9,
) -> CdfTables:
    """Build the bottleneck's per-channel CDF tables from its parameters.

    `eb_params` is the flax param subtree of an `EntropyBottleneck`
    (contains matrix_i/bias_i/factor_i/quantiles). Mirrors reference
    `EntropyBottleneck.update()` (`entropy_models.py:354-393`).
    """
    del tail_mass  # determined by the trained quantiles, kept for symmetry

    # Pure NumPy evaluation of the logits-cumulative chain: table building is
    # host-side work and must not dispatch to the accelerator.
    def logits_cumulative(params, inputs):
        n_stages = len([k for k in params if k.startswith("matrix_")])
        logits = inputs
        for i in range(n_stages):
            m = np.asarray(params[f"matrix_{i}"], np.float32)
            softplus = np.logaddexp(0.0, m)
            logits = np.einsum("cij,cjn->cin", softplus, logits) + np.asarray(
                params[f"bias_{i}"], np.float32
            )
            if i < n_stages - 1:
                f = np.asarray(params[f"factor_{i}"], np.float32)
                logits = logits + np.tanh(f) * np.tanh(logits)
        return logits

    quantiles = np.asarray(eb_params["quantiles"], np.float32)
    medians = quantiles[:, 0, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]), 0, None).astype(
        np.int32
    )
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians), 0, None).astype(
        np.int32
    )

    offset = -minima
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = (
        np.arange(max_length, dtype=np.float32)[None, :]
        + pmf_start[:, None, None]
    )  # (C, 1, max_length)

    params = {k: v for k, v in eb_params.items() if k != "quantiles"}
    lower = logits_cumulative(params, (samples - 0.5).astype(np.float32))
    upper = logits_cumulative(params, (samples + 0.5).astype(np.float32))
    sign = -np.sign(lower + upper)
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))[:, 0, :]
    tail = sigmoid(lower[:, 0, 0]) + sigmoid(-upper[:, 0, -1])

    cdf = pmf_to_quantized_cdf_rows(pmf, tail, pmf_length, precision)
    return CdfTables(cdf, pmf_length + 2, offset)


def build_gc_tables(
    scale_table: np.ndarray,
    precision: int = 16,
    tail_mass: float = 1e-9,
) -> CdfTables:
    """One CDF row per scale-table entry (reference `update()`, `:599-624`)."""
    scale_table = np.asarray(scale_table, np.float32)
    multiplier = -NormalDist().inv_cdf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int32)[None, :] - pmf_center[:, None]
    ).astype(np.float32)
    s = scale_table[:, None]

    def phi(v):
        from scipy.special import erfc

        return 0.5 * erfc(-(2 ** -0.5) * np.asarray(v, np.float64))

    upper = phi((0.5 - samples) / s)
    lower = phi((-0.5 - samples) / s)
    pmf = upper - lower
    tail = 2 * lower[:, 0]

    cdf = pmf_to_quantized_cdf_rows(pmf, tail, pmf_length, precision)
    return CdfTables(cdf, pmf_length + 2, -pmf_center)


class EntropyBottleneckCoder:
    """Host-side compress/decompress for the factorized bottleneck.

    Operates on NHWC NumPy arrays; one rANS stream per batch element
    (reference protocol, `entropy_models.py:203-290,491-522`).
    """

    def __init__(self, tables: CdfTables, medians: np.ndarray,
                 backend: Optional[str] = None):
        self.tables = tables
        self.medians = np.asarray(medians, np.float32)  # (C,)
        # snapshot the host entropy backend NOW: compress and decompress
        # must use the same bit layer even if the package registry is
        # flipped between the two calls (streams are not interoperable)
        self.backend = resolve_host_backend(backend)

    def compress(self, z: np.ndarray) -> list:
        z = np.asarray(z, np.float32)
        symbols = np.rint(z - self.medians).astype(np.int32)  # NHWC broadcast
        return self.compress_symbols(symbols)

    def compress_symbols(self, symbols: np.ndarray) -> list:
        """Encode pre-quantized symbols (rint(z - medians), any int dtype).
        Lets the quantization run on device so only ~1 byte/symbol crosses
        the link instead of the float latent."""
        symbols = np.asarray(symbols, np.int32)
        B = symbols.shape[0]
        C = symbols.shape[-1]
        indexes = np.broadcast_to(
            np.arange(C, dtype=np.int32), symbols.shape[1:]
        )
        cdf, lengths, offsets = self.tables.astuple()
        enc = host_coder_classes(self.backend)[1]()
        return [
            enc.encode_with_indexes(symbols[b], indexes, cdf, lengths, offsets)
            for b in range(B)
        ]

    def decompress_symbols(self, strings: list, spatial_shape) -> np.ndarray:
        """Decode to raw quantized symbols (medians NOT added): int32
        (B, *spatial, C). Lets dequantization run on device so only
        ~1 byte/symbol needs to cross the link instead of the float
        latent (the symbols fit int8 at any trained operating point)."""
        C = self.tables.cdf_length.shape[0]
        shape = tuple(spatial_shape) + (C,)
        indexes = np.broadcast_to(np.arange(C, dtype=np.int32), shape)
        cdf, lengths, offsets = self.tables.astuple()
        dec = host_coder_classes(self.backend)[2]()
        out = np.empty((len(strings),) + shape, np.int32)
        for b, s in enumerate(strings):
            out[b] = dec.decode_with_indexes(
                s, indexes, cdf, lengths, offsets
            ).reshape(shape)
        return out

    def decompress(self, strings: list, spatial_shape) -> np.ndarray:
        sym = self.decompress_symbols(strings, spatial_shape)
        return sym.astype(np.float32) + self.medians


class GaussianConditionalCoder:
    """Host-side helpers for coding Gaussian-conditioned latents."""

    def __init__(self, tables: CdfTables, scale_table: np.ndarray,
                 backend: Optional[str] = None):
        self.tables = tables
        self.scale_table = np.asarray(scale_table, np.float32)
        # see EntropyBottleneckCoder: pin the backend at construction
        self.backend = resolve_host_backend(backend)

    def build_indexes(self, scales: np.ndarray) -> np.ndarray:
        scales = np.maximum(np.asarray(scales, np.float32), SCALE_BOUND)
        return np.searchsorted(
            self.scale_table[:-1], scales, side="left"
        ).astype(np.int32)

    def quantize_symbols(self, y, means=None) -> np.ndarray:
        y = np.asarray(y, np.float32)
        if means is not None:
            y = y - means
        return np.rint(y).astype(np.int32)

    def compress(self, y, indexes, means=None) -> bytes:
        symbols = self.quantize_symbols(y, means)
        cdf, lengths, offsets = self.tables.astuple()
        return host_coder_classes(self.backend)[1]().encode_with_indexes(
            symbols, indexes, cdf, lengths, offsets
        )

    def decompress(self, string: bytes, indexes, means=None) -> np.ndarray:
        cdf, lengths, offsets = self.tables.astuple()
        vals = (
            host_coder_classes(self.backend)[2]()
            .decode_with_indexes(string, indexes, cdf, lengths, offsets)
            .reshape(np.shape(indexes))
            .astype(np.float32)
        )
        if means is not None:
            vals = vals + means
        return vals
