"""Host-side codec runner: real bitstream compress/decompress.

Splits the work the TPU-native way:
  * device (jit): transforms, context models, quantization, scale-table
    indexes
  * host: rANS entropy coding (inherently sequential/branchy — wrong for the
    MXU, cheap on CPU), overlapped with device compute across images by the
    batched eval driver.

Correctness invariant — lockstep coding: the encoder drives the *same*
compiled per-slice programs the decoder will run (`decode_slice_indexes` /
`decode_slice_apply`), so every mu/scale/index is bit-identical on both
sides. This is required, not an optimization: the channel-AR design feeds
decoded slices back into the context transforms, and any float divergence
between encoder and decoder programs could flip a scale-table index and
desynchronize the rANS stream. (The reference gets this implicitly by
running the identical torch modules in compress() and decompress(),
`compressai/models/cnn.py:210-332`.)

Equivalent surface to the reference's `model.update()` / `model.compress()`
/ `model.decompress()` protocol.
"""

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ans import BufferedRansEncoder, RansDecoder
from ..entropy import (
    EntropyBottleneckCoder,
    GaussianConditionalCoder,
    build_eb_tables,
    build_gc_tables,
    get_scale_table,
)


class Codec:
    """Wraps (model, params) with CDF tables and jitted coding-path fns.

    `pipeline` > 1 splits a multi-image batch into that many sub-batches
    whose channel-AR walks interleave: while one sub-batch's decoded
    symbols cross the host boundary and run through rANS, the others'
    device programs and transfers are in flight. Symbols are written in
    (slice, sub-batch) order, so the same `pipeline` value must be used to
    decode a stream that was encoded with it (it is part of the stream
    layout, like `num_slices`).
    """

    def __init__(
        self,
        model,
        params,
        scale_table: Optional[np.ndarray] = None,
        pipeline: int = 1,
        dtype=None,
    ):
        self.model = model
        self.pipeline = max(int(pipeline), 1)
        self.scale_table = (
            np.asarray(scale_table, np.float32)
            if scale_table is not None
            else get_scale_table()
        )
        if dtype is not None and dtype != jnp.float32:
            # TPU-native half precision: transforms run in bf16 (MXU-native),
            # while the entropy bottleneck stays f32 so the z medians /
            # quantiles that parameterize the CDF tables are exact. RD guard:
            # tests/test_bf16_codec.py. Lockstep safety is structural —
            # encoder and decoder run the same compiled programs either way.
            def cast(path, a):
                if path[0].key == "entropy_bottleneck":
                    return a
                a = jnp.asarray(a)
                return (
                    a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a
                )

            params = jax.tree_util.tree_map_with_path(cast, params)
        self.params = params
        self.update()

        # compute dtype follows the params (bf16 params -> bf16 transforms)
        self.dtype = (
            dtype
            if dtype is not None
            else jax.tree_util.tree_leaves(params)[0].dtype
        )

        def analyze(p, x):
            # accept native uint8 images: upload 1 byte/px and normalize on
            # device (4x less host->device traffic than f32)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            return model.apply(
                {"params": p}, x.astype(self.dtype), method="analyze"
            )

        self._analyze = jax.jit(analyze)
        self._hyper = jax.jit(
            lambda p, z_hat, y_shape: model.apply(
                {"params": p}, z_hat, y_shape, method="hyper_synthesize"
            ),
            static_argnums=(2,),
        )
        # scale-table indexes fit in a byte (64 levels): cast before the
        # device->host transfer, which is the scarce resource in the walk
        idx_dtype = jnp.uint8 if len(self.scale_table) <= 255 else jnp.int32
        table = jnp.asarray(self.scale_table)

        def slice_idx(p, i, lm, ls, support):
            mu, idx = model.apply(
                {"params": p}, i, lm, ls, support, table,
                method="decode_slice_indexes",
            )
            return mu, idx.astype(idx_dtype)

        def slice_fused(p, i, lm, ls, support, mu, rv):
            y_prev, mu, idx = model.apply(
                {"params": p}, i, lm, ls, support, mu, rv, table,
                method="decode_slice_fused",
            )
            return y_prev, mu, idx.astype(idx_dtype)

        self._slice_idx = jax.jit(slice_idx, static_argnums=(1,))
        self._slice_fused = jax.jit(slice_fused, static_argnums=(1,))
        self._slice_apply = jax.jit(
            lambda p, i, lm, support, mu, rv: model.apply(
                {"params": p}, i, lm, support, mu, rv,
                method="decode_slice_apply",
            ),
            static_argnums=(1,),
        )
        def quantize(y_slice, mu):
            # full-precision symbols feed the AR chain; an int8 copy rides
            # the (slow) device->host link for rANS, with an overflow flag
            # selecting the exact int32 copy in the rare out-of-range case
            q32 = jnp.round(y_slice - mu).astype(jnp.int32)
            q8 = jnp.clip(q32, -128, 127).astype(jnp.int8)
            overflow = jnp.any(q32 != q8.astype(jnp.int32))
            return q32, q8, overflow

        self._quantize = jax.jit(quantize)
        self._synth = jax.jit(
            lambda p, y_hat: model.apply({"params": p}, y_hat, method="synthesize")
        )

    # -- table refresh (reference `update()`) --------------------------------

    def update(self, scale_table: Optional[np.ndarray] = None, force: bool = True):
        if scale_table is not None:
            self.scale_table = np.asarray(scale_table, np.float32)
        eb_params = self.params["entropy_bottleneck"]
        self.eb_coder = EntropyBottleneckCoder(
            build_eb_tables(eb_params),
            np.asarray(eb_params["quantiles"])[:, 0, 1],
        )
        self.gc_coder = GaussianConditionalCoder(
            build_gc_tables(self.scale_table), self.scale_table
        )
        return True

    # -- shared per-slice walk ------------------------------------------------

    def _walk_slices(self, latent_means, latent_scales, get_symbols):
        """Run the channel-AR slice chain with fused steps. `get_symbols(i,
        mu, idx)` returns the int32 symbols for slice i — from quantization
        (encoder) or from the rANS stream (decoder). Returns the y_hat
        slices. Encoder and decoder both run exactly this walk, so every
        program (and hence every mu/scale/index bit) matches."""
        y_hat_slices: List = []
        k = self.model.max_support_slices

        def support():
            return tuple(y_hat_slices if k < 0 else y_hat_slices[:k])

        mu, idx = self._slice_idx(
            self.params, 0, latent_means, latent_scales, ()
        )
        for i in range(1, self.model.num_slices):
            rv = get_symbols(i - 1, mu, idx)
            y_prev, mu, idx = self._slice_fused(
                self.params, i, latent_means, latent_scales, support(), mu, rv
            )
            y_hat_slices.append(y_prev)
        rv = get_symbols(self.model.num_slices - 1, mu, idx)
        y_hat_slices.append(
            self._slice_apply(
                self.params,
                self.model.num_slices - 1,
                latent_means,
                support(),
                mu,
                rv,
            )
        )
        return y_hat_slices

    def _sub_batches(self, B: int):
        K = self.pipeline
        if K > B or B % K != 0:
            K = 1
        step = B // K
        return [(k * step, (k + 1) * step) for k in range(K)]

    @staticmethod
    def _start_transfer(arr):
        try:
            arr.copy_to_host_async()
        except AttributeError:
            pass

    # -- compress ------------------------------------------------------------

    def compress(self, x) -> Dict[str, Any]:
        """x: NHWC float array in [0,1]. Returns strings + z spatial shape."""
        y, z = self._analyze(self.params, jnp.asarray(x))
        z_np = np.asarray(z)

        z_strings = self.eb_coder.compress(z_np)
        # Reconstruct z_hat exactly as the decoder will (round + medians).
        z_hat = jnp.asarray(self.eb_coder.decompress(z_strings, z_np.shape[1:3]))

        y_shape = (y.shape[1], y.shape[2])
        latent_means, latent_scales = self._hyper(self.params, z_hat, y_shape)
        bounds = self.model.slice_boundaries(y.shape[-1])

        cdf, lengths, offsets = self.gc_coder.tables.astuple()
        encoder = BufferedRansEncoder()
        pending = {}  # (slice, sub) -> (q32, q8, overflow, idx)

        # Per-sub-batch walks: all device work enqueues asynchronously, and
        # the (q, idx) transfers for rANS start async during the walks —
        # the critical path never stalls on device->host traffic.
        for k, (lo, hi) in enumerate(self._sub_batches(y.shape[0])):
            lm, ls = latent_means[lo:hi], latent_scales[lo:hi]
            y_slices = jnp.split(y[lo:hi], bounds, axis=-1)

            def get_symbols(i, mu, idx, k=k, y_slices=y_slices):
                q32, q8, overflow = self._quantize(y_slices[i], mu)
                self._start_transfer(q8)
                self._start_transfer(idx)
                pending[(i, k)] = (q32, q8, overflow, idx)
                return q32

            self._walk_slices(lm, ls, get_symbols)

        # (slice, sub-batch) order — must match the decoder's read order
        for key in sorted(pending):
            q32, q8, overflow, idx = pending[key]
            q = q32 if bool(overflow) else q8
            encoder.encode_with_indexes(
                np.asarray(q).reshape(-1),
                np.asarray(idx).reshape(-1),
                cdf,
                lengths,
                offsets,
            )
        y_string = encoder.flush()

        return {
            "strings": [[y_string], z_strings],
            "shape": tuple(z_np.shape[1:3]),
        }

    # -- decompress ----------------------------------------------------------

    def decompress(self, strings: Sequence, shape) -> Dict[str, Any]:
        y_strings, z_strings = strings[0], strings[1]
        z_hat = jnp.asarray(self.eb_coder.decompress(z_strings, shape))
        up = self.model.hyper_upsample
        y_shape = (shape[0] * up, shape[1] * up)
        latent_means, latent_scales = self._hyper(self.params, z_hat, y_shape)

        cdf, lengths, offsets = self.gc_coder.tables.astuple()
        decoder = RansDecoder()
        decoder.set_stream(y_strings[0])

        B = z_hat.shape[0]
        subs = self._sub_batches(B)
        K = len(subs)
        S = self.model.num_slices
        k_supp = self.model.max_support_slices

        lm = [latent_means[lo:hi] for lo, hi in subs]
        ls = [latent_scales[lo:hi] for lo, hi in subs]
        y_hats: List[List] = [[] for _ in range(K)]
        mu, idx = [None] * K, [None] * K

        def support(k):
            return tuple(
                y_hats[k] if k_supp < 0 else y_hats[k][:k_supp]
            )

        # Interleave the K sub-batch walks: while sub-batch k's symbols run
        # through the host rANS decoder, the other sub-batches' dispatches
        # and index transfers are in flight.
        for k in range(K):
            mu[k], idx[k] = self._slice_idx(self.params, 0, lm[k], ls[k], ())
            self._start_transfer(idx[k])
        for i in range(S):
            for k in range(K):
                idx_np = np.asarray(idx[k])
                rv = decoder.decode_stream(
                    idx_np.reshape(-1), cdf, lengths, offsets
                )
                rv = jnp.asarray(rv.reshape(idx_np.shape))
                if i < S - 1:
                    y_prev, mu[k], idx[k] = self._slice_fused(
                        self.params, i + 1, lm[k], ls[k], support(k), mu[k], rv
                    )
                    self._start_transfer(idx[k])
                    y_hats[k].append(y_prev)
                else:
                    y_hats[k].append(
                        self._slice_apply(
                            self.params, S - 1, lm[k], support(k), mu[k], rv
                        )
                    )

        y_hat = jnp.concatenate(
            [jnp.concatenate(h, axis=-1) for h in y_hats], axis=0
        )
        x_hat = self._synth(self.params, y_hat)
        return {"x_hat": x_hat}
